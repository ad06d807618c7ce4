package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Mergeable quantile sketch buffer: the k smallest DISTINCT (hash, value)
  * pairs under (h, v) lexicographic order — a bounded uniform row sample
  * whose membership is a PURE FUNCTION of the data, the property the rest
  * of this repo's sketch algebra (KMV, HLL, Bloom, CMS) is built on.
  *
  * Why not KLL (the textbook mergeable quantile sketch): KLL's compaction
  * discards by position, so the surviving items depend on the partition
  * and merge-tree shape — two runs of the same query can carry different
  * sketch contents, and a DuckDB oracle can never replay Spark's
  * aggregation order. This hash-bottom-k trades KLL's O(1/ε·log²) state
  * for O(k) state with O(1/√k) rank error — but the sketch CONTENT is
  * deterministic under ANY chunking or merge order (bottom-k of a union =
  * bottom-k of the bottom-k's), so estimates hash-match across engines and
  * per-source sketches roll up to exactly the sketch of the whole corpus.
  * The rank error is REPORTED next to the exact rank (q_quantile_sketch),
  * the q_ann_recall pattern — measured, not asserted.
  *
  * Input: `h` = the portable 32-bit hash (graft.ext.Dedup.h32) of the
  * row's UNIQUE key — hashing the key (not the value) makes the sample
  * row-uniform, so duplicate values keep their weight; `v` = the value
  * (long). Distinctness of (h, v) pairs (TreeSet semantics) is part of the
  * cross-engine contract: the DuckDB twin is
  * `SELECT DISTINCT h, v ... ORDER BY h, v LIMIT k`.
  *
  * Output: array<struct<h, v>> sorted by (h, v). The estimator is a scalar
  * expression over it (graft.ext.Quantiles): sort the v's, pick rank
  * ⌈q·m/1000⌉ — integer arithmetic only.
  */
case class QuantileSketchAgg(
    hashChild: Expression,
    valueChild: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[(Long, Long)]] {

  require(k > 0, s"quantile sketch needs k > 0, got $k")

  // transient lazy: one comparator per JVM, not per update() call (the
  // per-row hot path), and never serialized with the expression tree
  @transient private lazy val ord: java.util.Comparator[(Long, Long)] =
    new java.util.Comparator[(Long, Long)] {
      override def compare(a: (Long, Long), b: (Long, Long)): Int = {
        val c = java.lang.Long.compare(a._1, b._1)
        if (c != 0) c else java.lang.Long.compare(a._2, b._2)
      }
    }

  override def createAggregationBuffer(): java.util.TreeSet[(Long, Long)] =
    new java.util.TreeSet[(Long, Long)](ord)

  override def update(
      buf: java.util.TreeSet[(Long, Long)],
      input: InternalRow): java.util.TreeSet[(Long, Long)] = {
    val h = hashChild.eval(input)
    val v = valueChild.eval(input)
    if (h != null && v != null) {
      val p = (h.asInstanceOf[Long], v.asInstanceOf[Long])
      // bounded insert: only accept pairs below the current k-th minimum
      if (buf.size < k) buf.add(p)
      else if (ord.compare(p, buf.last) < 0) {
        buf.add(p); if (buf.size > k) { buf.pollLast(); () }
      }
    }
    buf
  }

  override def merge(
      b1: java.util.TreeSet[(Long, Long)],
      b2: java.util.TreeSet[(Long, Long)]): java.util.TreeSet[(Long, Long)] = {
    // union + truncate-to-k: associative, commutative, order-insensitive
    b1.addAll(b2)
    while (b1.size > k) b1.pollLast()
    b1
  }

  override def eval(buf: java.util.TreeSet[(Long, Long)]): Any = {
    val arr = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) {
      val p = it.next()
      arr(i) = InternalRow(p._1, p._2)
      i += 1
    }
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.TreeSet[(Long, Long)]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) { val p = it.next(); bb.putLong(p._1); bb.putLong(p._2) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[(Long, Long)] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add((bb.getLong, bb.getLong)); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("h", LongType, nullable = false),
      StructField("v", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(hashChild, valueChild)

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): QuantileSketchAgg =
    copy(hashChild = newChildren(0), valueChild = newChildren(1))
}

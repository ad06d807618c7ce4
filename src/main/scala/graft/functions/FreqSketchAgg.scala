package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters summary: at most `capacity` (term, count)
  * entries per group, regardless of true cardinality.
  *
  * Guarantees (the classic ones): every term with true frequency
  * > N/(capacity+1) is present, and each reported count undercounts the
  * true count by at most N/(capacity+1). When the group's distinct count
  * never exceeds `capacity` no decrement ever fires and the summary IS the
  * exact frequency table — that regime is what the DuckDB oracle checks;
  * the approximation-regime guarantee is property-tested in the spec.
  *
  * Scale shape: O(capacity) state per group, and `merge` (pointwise sum,
  * then subtract the (capacity+1)-th largest count and drop non-positives
  * — Agarwal et al.'s mergeable-summaries construction) keeps partials
  * bounded map-side, so finding the top tokens/domains/n-grams of a 100 TB
  * corpus costs one scan plus `capacity` entries per group of shuffle —
  * the frequency analog of [[KmvSketchAgg]].
  */
case class FreqSketchAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.HashMap[String, Long]] {

  require(capacity > 0, s"freq sketch needs capacity > 0, got $capacity")

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long]()

  override def update(
      buf: java.util.HashMap[String, Long],
      input: InternalRow): java.util.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      // UTF8String may point into a reused row buffer — materialize to String
      val term = v.asInstanceOf[UTF8String].toString
      if (buf.containsKey(term)) buf.put(term, buf.get(term) + 1L)
      else if (buf.size < capacity) buf.put(term, 1L)
      else decrementAll(buf, 1L)
    }
    buf
  }

  /** Misra–Gries decrement step: subtract `by` from every counter, dropping
    * entries that reach zero (frees at least one slot). */
  private def decrementAll(buf: java.util.HashMap[String, Long], by: Long): Unit = {
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val nv = e.getValue - by
      if (nv <= 0L) it.remove() else e.setValue(nv)
    }
  }

  override def merge(
      b1: java.util.HashMap[String, Long],
      b2: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] = {
    val it = b2.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = if (b1.containsKey(e.getKey)) b1.get(e.getKey) else 0L
      b1.put(e.getKey, cur + e.getValue)
    }
    if (b1.size > capacity) {
      // subtract the (capacity+1)-th largest count; ≥1 entry drops to ≤0
      val counts = new Array[Long](b1.size)
      var i = 0
      val vs = b1.values().iterator()
      while (vs.hasNext) { counts(i) = vs.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val threshold = counts(b1.size - capacity - 1)
      decrementAll(b1, threshold)
    }
    b1
  }

  override def eval(buf: java.util.HashMap[String, Long]): Any = {
    val n = buf.size
    val keys = new Array[Any](n)
    val vals = new Array[Any](n)
    // deterministic output order (sorted by term) so downstream explode is
    // stable across partition layouts
    val terms = new java.util.ArrayList[String](buf.keySet())
    java.util.Collections.sort(terms)
    var i = 0
    val it = terms.iterator()
    while (it.hasNext) {
      val t = it.next()
      keys(i) = UTF8String.fromString(t)
      vals(i) = buf.get(t).longValue()
      i += 1
    }
    new ArrayBasedMapData(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(keys),
      new org.apache.spark.sql.catalyst.util.GenericArrayData(vals))
  }

  override def serialize(buf: java.util.HashMap[String, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeUTF(e.getKey)
      out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new java.util.HashMap[String, Long]()
    var i = 0
    while (i < n) { buf.put(in.readUTF(), in.readLong()); i += 1 }
    buf
  }

  override def dataType: DataType = MapType(StringType, LongType, valueContainsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FreqSketchAgg =
    copy(child = newChildren.head)
}

package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** HyperLogLog register buffer (Flajolet et al. 2007): m = 2^p byte
  * registers, each holding the maximum observed rank (position of the first
  * set bit of the hash remainder) for its bucket.
  *
  * Sketch algebra: `update` is a bounded max, `merge` is the elementwise
  * max of two register arrays — associative, commutative, idempotent — so
  * partial sketches combine map-side like any other partial aggregate and a
  * 100 TB COUNT(DISTINCT) costs one scan plus m bytes per group of shuffle
  * (m = 256 at the default p = 8, vs KMV's k longs).
  *
  * Cross-engine determinism (why this is oracle-checkable where most HLL
  * libraries are not): the input is the portable 32-bit hash
  * (graft.ext.Dedup.h32); bucket = h & (m−1); rank = (32−p) − bitlength
  * (h >> p) + 1, where bitlength is the length of the minimal binary string
  * — `bin()` in both Spark and DuckDB. The estimator downstream
  * (graft.ext.Hll) sums 1/2^rank terms, all exact binary fractions whose
  * partial sums stay under 53 significant bits, so even the floating-point
  * part is bit-exact in any engine.
  *
  * Output: ArrayType(IntegerType) of length m — register j at index j
  * (0 for never-touched buckets), consumable by array expressions.
  */
case class HllSketchAgg(
    child: Expression,
    p: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {

  require(p >= 4 && p <= 16, s"HLL precision must be in [4,16], got $p")
  private val m = 1 << p

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      val bucket = (h & (m - 1)).toInt
      val rest = h >>> p
      // rank = (32-p) - bitlength(rest) + 1; bitlength(0) = 0
      val bitlen = 64 - java.lang.Long.numberOfLeadingZeros(rest)
      val rank = (32 - p - bitlen + 1).toByte
      if (rank > buf(bucket)) buf(bucket) = rank
    }
    buf
  }

  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (b2(i) > b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Byte]): Any = {
    val arr = new Array[Any](m)
    var i = 0
    while (i < m) { arr(i) = buf(i).toInt; i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def withNewMutableAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllSketchAgg =
    copy(child = newChildren.head)
}

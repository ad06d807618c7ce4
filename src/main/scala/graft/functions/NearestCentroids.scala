package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** The `n` nearest centroids of a quantized vector, as an array of cluster
  * ids in (squared-distance, cluster) order — the per-row argmin/top-n of
  * the k-means assignment and the IVF probe list.
  *
  * The codebook rides in the expression itself (driver-side literals, k·dim
  * longs — metadata-sized), so one expression node replaces the former
  * crossJoin(broadcast(centroids)) → row_number window: no N·k row
  * materialization, no exchange, no sort (guide §2.4). A `least()` fold
  * over per-centroid structs computes the same thing but its expression
  * tree is O(k) dot-product subtrees — at PQ sizes (m=8 × ksub=32) the
  * generated code crosses Janino's 64 KB method limit and every stage
  * falls back to interpreted evaluation (measured: q_opq_recall 22→410 s
  * wall). Here the codegen emits ONE call into [[pick]] — a JIT-friendly
  * primitive loop, the same pattern as [[LongArrayDot]].
  *
  * Distances are the exact integer ‖q−c‖² SHIFTED by the per-row constant
  * −q·q (i.e. c·c − 2·q·c): subtracting the row norm from every candidate
  * cannot change the (dist, cluster) order, and the row norm is never
  * computed. Ties break by cluster id ascending — the window form's
  * `row_number() over (order by dist, cluster)` total order, exactly.
  *
  * Returns min(n, k) ids; `n = 1` is the plain nearest-centroid
  * assignment. Null input → null (the assignment contract feeds non-null
  * quantized arrays).
  */
case class NearestCentroids(child: Expression, ids: Seq[Int],
    codebook: Seq[Seq[Long]], n: Int) extends UnaryExpression {

  require(ids.length == codebook.length && codebook.nonEmpty && n >= 1,
    s"ids/codebook length mismatch or empty: ${ids.length}/${codebook.length}, n=$n")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  @transient private lazy val cbArr: Array[Array[Long]] =
    codebook.map(_.toArray).toArray
  @transient private lazy val idArr: Array[Int] = ids.toArray
  // c·c per centroid, precomputed once per task
  @transient private lazy val ccArr: Array[Long] = cbArr.map { c =>
    var s = 0L; var j = 0
    while (j < c.length) { s += c(j) * c(j); j += 1 }
    s
  }

  /** Top-n selection by (shifted dist, cluster id) — insertion sort into a
    * bounded buffer (n is 1 or a small probe count). */
  def pick(qe: ArrayData): ArrayData = {
    val k = cbArr.length
    val m = math.min(n, k)
    val bd = new Array[Long](m)
    val bc = new Array[Int](m)
    var filled = 0
    var i = 0
    while (i < k) {
      val c = cbArr(i)
      val d = math.min(qe.numElements(), c.length)
      var s = 0L; var j = 0
      while (j < d) { s += qe.getLong(j) * c(j); j += 1 }
      val dist = ccArr(i) - 2L * s
      val cid = idArr(i)
      if (filled < m || dist < bd(filled - 1) ||
          (dist == bd(filled - 1) && cid < bc(filled - 1))) {
        var p = if (filled < m) filled else m - 1
        while (p > 0 && (dist < bd(p - 1) ||
            (dist == bd(p - 1) && cid < bc(p - 1)))) {
          bd(p) = bd(p - 1); bc(p) = bc(p - 1); p -= 1
        }
        bd(p) = dist; bc(p) = cid
        if (filled < m) filled += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (filled == m) bc else java.util.Arrays.copyOf(bc, filled))
  }

  override def nullSafeEval(input: Any): Any =
    pick(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCentroids", this,
      classOf[NearestCentroids].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = $ref.pick($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroids =
    copy(child = newChild)
}

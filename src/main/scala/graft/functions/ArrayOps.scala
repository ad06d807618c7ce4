package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the embedding hot path.
  *
  * `aggregate(zip_with(a, b, (x,y) -> x*y), 0L, (acc,v) -> acc+v)` is
  * evaluated as interpreted higher-order functions — one closure call and a
  * boxed Long per element, per pair. On an O(pairs)·O(dim) similarity join
  * that is the whole runtime. These expressions generate a tight primitive
  * loop inside whole-stage codegen instead (~100× on the near-dup join), per
  * the engine guidance: native Expression > HOF > UDF.
  */

/** Integer dot product of two ArrayType(LongType) columns (quantized
  * embeddings — see graft.ext.Similarity). Exact: inputs are ≤ 2^21 so the
  * sum of 64 products fits comfortably in a Long. */
case class LongArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {

  // inputs must be ArrayType(LongType) — internal call sites guarantee it
  // (ExpectsInputTypes is private[sql], so no declarative check here)
  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += x.getLong(i) * y.getLong(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        long $s = 0L;
        for (int $i = 0; $i < $n; $i++) {
          $s += $a.getLong($i) * $b.getLong($i);
        }
        ${ev.value} = $s;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongArrayDot =
    copy(left = newLeft, right = newRight)
}

/** Quantize an ArrayType(Float/Double) column to fixed-point longs:
  * floor(x·scale + 0.5) per element, in one codegen loop. */
case class QuantizeArray(child: Expression, scale: Long)
    extends UnaryExpression {

  // input must be ArrayType(FloatType|DoubleType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val v = if (elemIsFloat) x.getFloat(i).toDouble else x.getDouble(i)
      out(i) = math.floor(v * scale + 0.5).toLong
      i += 1
    }
    ArrayData.toArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val getter = if (elemIsFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
        int $n = $a.numElements();
        long[] $out = new long[$n];
        for (int $i = 0; $i < $n; $i++) {
          $out[$i] = (long) java.lang.Math.floor($getter * ${scale}L + 0.5d);
        }
        ${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): QuantizeArray =
    copy(child = newChild)
}

/** Registration + Column helpers. Registered as SQL temp functions so call
  * sites can use them inside expr()/selectExpr alongside built-ins. */
object GraftFunctions {
  // once-per-session: register is called from every operator entry point for
  // self-sufficiency, and re-registering spams SimpleFunctionRegistry WARNs
  // (the entire readable tail of BENCH_r04 was this). Weak keys: a dropped
  // session must not be pinned by the guard.
  private val registered =
    java.util.Collections.synchronizedSet(
      java.util.Collections.newSetFromMap(
        new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()))

  def register(spark: SparkSession): Unit = {
    if (!registered.add(spark)) return
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("array_dot_long",
      exprs => LongArrayDot(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("quantize_array",
      exprs => QuantizeArray(exprs(0),
        exprs(1).eval(InternalRow.empty).asInstanceOf[Number].longValue()), "scala_udf")
    reg.createOrReplaceTempFunction("rolling_hash",
      exprs => RollingHash(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("nearest_centroids",
      exprs => {
        // ids/codebook/n arrive as foldable literals (typedlit at the call
        // site) and are folded into the expression ONCE here — per-row
        // children would re-evaluate the k·dim literal every row on the
        // interpreted path
        val ids = exprs(1).eval(InternalRow.empty).asInstanceOf[
            org.apache.spark.sql.catalyst.util.ArrayData]
          .toIntArray().toSeq
        val cb = exprs(2).eval(InternalRow.empty).asInstanceOf[
            org.apache.spark.sql.catalyst.util.ArrayData]
          .toObjectArray(ArrayType(LongType))
          .map(_.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
            .toLongArray().toSeq).toSeq
        NearestCentroids(exprs(0), ids, cb,
          exprs(3).eval(InternalRow.empty).asInstanceOf[Number].intValue())
      }, "scala_udf")
    reg.createOrReplaceTempFunction("winnow_fps",
      exprs => WinnowFps(exprs(0),
        exprs(1).eval(InternalRow.empty).asInstanceOf[Number].intValue(),
        exprs(2).eval(InternalRow.empty).asInstanceOf[Number].intValue()), "scala_udf")
    reg.createOrReplaceTempFunction("minhash_sketch",
      exprs => MinHashSketch(exprs.head,
        graft.ext.Dedup.MinhashA, graft.ext.Dedup.MinhashB,
        graft.ext.Dedup.MinhashP), "scala_udf")
    reg.createOrReplaceTempFunction("kmv_sketch",
      exprs => KmvSketchAgg(exprs(0),
        exprs(1).eval(InternalRow.empty).asInstanceOf[Number].intValue()), "scala_udf")
    reg.createOrReplaceTempFunction("bloom_build",
      exprs => BloomBuildAgg(exprs(0),
        exprs(1).eval(InternalRow.empty).asInstanceOf[Number].intValue(),
        exprs(2).eval(InternalRow.empty).asInstanceOf[Number].intValue()), "scala_udf")
    reg.createOrReplaceTempFunction("bloom_might_contain",
      exprs => BloomMightContain(exprs(0), exprs(1),
        exprs(2).eval(InternalRow.empty).asInstanceOf[Number].intValue()), "scala_udf")
    reg.createOrReplaceTempFunction("freq_sketch",
      exprs => FreqSketchAgg(exprs(0),
        exprs(1).eval(InternalRow.empty).asInstanceOf[Number].intValue()), "scala_udf")
    reg.createOrReplaceTempFunction("interleave_bits",
      exprs => InterleaveBits(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("hll_sketch",
      exprs => HllSketchAgg(exprs(0),
        exprs(1).eval(InternalRow.empty).asInstanceOf[Number].intValue()), "scala_udf")
    reg.createOrReplaceTempFunction("quantile_sketch",
      exprs => QuantileSketchAgg(exprs(0), exprs(1),
        exprs(2).eval(InternalRow.empty).asInstanceOf[Number].intValue()), "scala_udf")
    reg.createOrReplaceTempFunction("topk_agg",
      exprs => TopKAgg(exprs(0), exprs(1),
        exprs(2).eval(InternalRow.empty).asInstanceOf[Number].intValue()), "scala_udf")
  }
}

package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial (Rabin–Karp) rolling hash over a string's UTF-8 bytes:
  * `h = Σ byte_i · B^(n−1−i) mod P`. The document-fingerprinting primitive —
  * unlike md5 it supports O(1) sliding-window updates, which is what makes
  * shingle fingerprints cheap at corpus scale. Implemented as a native
  * Catalyst expression with codegen (the per-byte loop stays inside
  * whole-stage codegen; a UDF would box every row).
  */
case class RollingHash(child: Expression, base: Long = 257L, mod: Long = 1000000007L)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * base + (bytes(i) & 0xff)) % mod
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
        byte[] $bytes = $c.getBytes();
        long $h = 0L;
        for (int $i = 0; $i < $bytes.length; $i++) {
          $h = ($h * ${base}L + ($bytes[$i] & 0xff)) % ${mod}L;
        }
        ${ev.value} = $h;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

/** The whole winnow-fingerprint selection (Schleimer/Wilkerson/Aiken 2003)
  * as ONE native pass over a token array: per-token FNV-1a byte hash →
  * rolling k-gram combine (O(1) per position) → monotonic-deque sliding
  * window minimum (O(1) amortized) → sort-dedup. Returns the distinct
  * selected fingerprint values, the same SET semantics as
  * `graft.ext.Dedup.winnowFingerprints` modulo hash function.
  *
  * Exists because the array-expression formulation allocates a `slice` per
  * position for the window min (O(len·w) allocations) and pays md5 per
  * gram — measured at ~1.4× the cost of the exhaustive span pass it is
  * supposed to undercut, which inverted the prefilter's economics
  * (VERDICT r8 #1). This pass is allocation-free per position and
  * hash-cheap, so the candidate prefilter costs a small fraction of the
  * span pass. The hash is INTERNAL (candidate doc-ids are the only
  * output): a collision can only merge two distinct grams, i.e. ADD a
  * candidate — the prefilter stays lossless for any hash, so no
  * DuckDB-replayable hash is needed here.
  */
case class WinnowFps(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 1 && w >= 1, s"k and w must be positive: k=$k w=$w")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    WinnowFps.compute(
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WinnowFps.compute($c, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): WinnowFps =
    copy(child = newChild)
}

object WinnowFps {
  /** Static so generated code calls it directly (one invoke per row inside
    * whole-stage codegen, no boxing beyond the result array). */
  def compute(tokens: org.apache.spark.sql.catalyst.util.ArrayData,
      k: Int, w: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val L = tokens.numElements()
    val nGrams = L - k + 1
    if (nGrams <= 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.emptyLongArray)
    // per-token FNV-1a over UTF-8 bytes
    val th = new Array[Long](L)
    var i = 0
    while (i < L) {
      val u = tokens.getUTF8String(i) // null element (not from split) = empty
      var h = -3750763034362895579L // FNV-1a 64 offset basis
      if (u != null) {
        val b = u.getBytes
        var j = 0
        while (j < b.length) { h = (h ^ (b(j) & 0xff)) * 1099511628211L; j += 1 }
      }
      th(i) = h
      i += 1
    }
    // rolling positional combine: g(i) = Σ th(i+j)·B^(k−1−j), natural Long
    // overflow (B odd ⇒ invertible mod 2^64 — removals cancel exactly)
    val B = 1000003L
    var bk = 1L
    i = 1
    while (i < k) { bk *= B; i += 1 } // B^(k−1)
    val g = new Array[Long](nGrams)
    var acc = 0L
    i = 0
    while (i < k) { acc = acc * B + th(i); i += 1 }
    g(0) = acc
    i = 1
    while (i < nGrams) {
      acc = (acc - th(i - 1) * bk) * B + th(i + k - 1)
      g(i) = acc
      i += 1
    }
    // sliding min over width min(w, nGrams) via monotonic deque of indices
    val m = if (w < nGrams) w else nGrams
    val out = new Array[Long](nGrams - m + 1)
    val dq = new Array[Int](nGrams)
    var head = 0
    var tail = 0 // exclusive
    var oi = 0
    i = 0
    while (i < nGrams) {
      while (tail > head && g(dq(tail - 1)) >= g(i)) tail -= 1
      dq(tail) = i; tail += 1
      if (dq(head) <= i - m) head += 1
      if (i >= m - 1) { out(oi) = g(dq(head)); oi += 1 }
      i += 1
    }
    java.util.Arrays.sort(out)
    var n = 0
    i = 0
    while (i < out.length) {
      if (i == 0 || out(i) != out(i - 1)) { out(n) = out(i); n += 1 }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(out, n))
  }
}

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

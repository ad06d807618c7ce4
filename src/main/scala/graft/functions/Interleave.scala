package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Bit interleaving for Z-order (Morton) keys.
  *
  * `interleave_bits(a, b)` weaves the low 32 bits of two longs into one
  * 64-bit value: bit i of `a` lands at position 2i+1, bit i of `b` at 2i.
  * Sorting by the result gives the Morton space-filling curve — rows close
  * in BOTH dimensions land close in the sort order, so parquet row-group
  * min/max boxes stay tight on both columns simultaneously. That is the
  * property linear sort cannot give: a layout sorted on A has every row
  * group spanning the full domain of B, so a B-predicate prunes nothing.
  *
  * Implemented with the classic magic-number bit spread (5 shift/mask ops
  * per operand, no loop) inside whole-stage codegen.
  */
object Morton {
  /** Spread the low 32 bits of x so bit i moves to bit 2i. */
  def spread(x0: Long): Long = {
    var x = x0 & 0xFFFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8))  & 0x00FF00FF00FF00FFL
    x = (x | (x << 4))  & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2))  & 0x3333333333333333L
    x = (x | (x << 1))  & 0x5555555555555555L
    x
  }

  def interleave(a: Long, b: Long): Long = (spread(a) << 1) | spread(b)
}

case class InterleaveBits(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "interleave_bits"
  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any =
    Morton.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = (graft.functions.Morton.spread($a) << 1) | " +
        s"graft.functions.Morton.spread($b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): InterleaveBits =
    copy(left = newLeft, right = newRight)
}

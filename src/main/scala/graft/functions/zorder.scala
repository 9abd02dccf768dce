package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** JVM kernel for the Z-order (Morton) interleave; static so whole-stage
  * codegen calls it directly.
  */
object ZOrderImpl {
  /** Spread the low 16 bits of v to the even bit positions of a 32-bit
    * word (classic magic-mask doubling).
    */
  private def spread16(v: Int): Long = {
    var x = (v & 0xffff).toLong
    x = (x | (x << 8)) & 0x00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0fL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }

  /** 32-bit Morton code of the low 16 bits of (x, y): x occupies the even
    * bit positions, y the odd.
    */
  def interleave16(x: Int, y: Int): Long =
    spread16(x) | (spread16(y) << 1)
}

/** Z-order (Morton) curve value of two int columns' low 16 bits:
  * `(int, int) -> bigint`. The multi-dimensional CLUSTERING key for data
  * layout: sort (or range-partition) a table by `zorder2(a, b)` before
  * writing and points close in (a, b) land in the same files/row groups, so
  * parquet min/max statistics prune box predicates on EITHER OR BOTH
  * dimensions — where a plain `ORDER BY a` layout serves only `a`. This is
  * how lakehouse OPTIMIZE ZORDER BY works; at 100 TB it is the difference
  * between scanning a few files and scanning the table for a 2-D slice.
  */
case class ZOrder2(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(IntegerType, IntegerType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "zorder2"

  override def nullSafeEval(x: Any, y: Any): Any =
    ZOrderImpl.interleave16(x.asInstanceOf[Int], y.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.ZOrderImpl.interleave16($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder2 =
    copy(left = newLeft, right = newRight)
}

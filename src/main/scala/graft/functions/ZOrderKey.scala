package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) key: bit-interleave of the low 16 bits of two
  * dimension columns — the multi-dimensional clustering primitive behind
  * Delta/Iceberg OPTIMIZE ZORDER. Sorting (or range-partitioning) a table
  * by this key before writing gives every file a tight bounding box in
  * BOTH dimensions, so min/max-stats pruning works for predicates on
  * either column — a linear sort instead of an n² layout problem, and the
  * single highest-leverage data-layout lever at 100 TB (it turns
  * full-corpus scans with 2-D selective predicates into reads of a few
  * percent of files).
  *
  * 16 bits per dimension (inputs masked to 0..65535; callers quantize
  * first) keeps the key in 32 bits and the SQL mirror inside BIGINT shift
  * range — layout clustering needs bucket resolution, not exact values.
  * Native codegen'd expression; one tight loop per row.
  */
case class ZOrderKey(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "zorder_key"

  override protected def nullSafeEval(x: Any, y: Any): Any =
    ZOrderKey.interleave16(
      x.asInstanceOf[Number].longValue, y.asInstanceOf[Number].longValue)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) =>
      s"graft.functions.ZOrderKey.interleave16($x, $y)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ZOrderKey {
  /** x bits land on even positions, y bits on odd. */
  def interleave16(x: Long, y: Long): Long = {
    var key = 0L
    var i = 0
    while (i < 16) {
      key |= ((x >> i) & 1L) << (2 * i)
      key |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    key
  }
}

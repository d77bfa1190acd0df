package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Integer dot product of two int arrays as a LONG — the quantized-ANN
  * (SQ8) scorer. One JVM pass per pair; replaces the zip_with/aggregate
  * lambda composition, which Spark evaluates interpreted and which sat
  * in p34's per-candidate hot loop exactly as the float dot once did in
  * the cosine family (see ArrayCosine). Participates in whole-stage
  * codegen like its float sibling.
  *
  * Integer arithmetic is exact, so the DuckDB oracle's list fold is
  * bit-identical by construction — no rounding contract needed.
  */
case class ArrayIntDot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "array_int_dot"

  // Registered as a general SQL function, so reject non-int arrays at
  // ANALYSIS time: ArrayData.getInt reads a fixed element width, and an
  // array<bigint>/array<tinyint>/array<double> input would silently
  // return garbage instead of failing.
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<int>, array<int>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override protected def nullSafeEval(l: Any, r: Any): Any =
    ArrayIntDot.dot(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ArrayIntDot.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ArrayIntDot {
  def dot(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0L
    var i = 0
    while (i < n) {
      dot += a.getInt(i).toLong * b.getInt(i).toLong
      i += 1
    }
    dot
  }
}

package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Cosine similarity of two numeric arrays in one pass, double precision,
  * index-ordered sums — exactly the arithmetic the DuckDB oracle mirrors
  * (`list_sum(list_transform(...))` folds in index order too, so results
  * are bit-identical).
  *
  * Replaces the zip_with/aggregate lambda composition: Spark evaluates
  * higher-order lambdas interpreted, which made the 64-dim dot product
  * the hot cost of every ANN/near-dup query. Participates in whole-stage
  * codegen (doGenCode → one static call per row, no interpreted
  * fallback re-dispatch in the per-pair loop).
  */
case class ArrayCosine(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "array_cosine"

  // Same analysis-time guard as ArrayIntDot: getFloat/getDouble read a
  // fixed element width, so any other element type would silently
  // produce garbage rather than fail.
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires float/double arrays, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  private lazy val leftFloat = isFloat(left)
  private lazy val rightFloat = isFloat(right)

  override protected def nullSafeEval(l: Any, r: Any): Any =
    ArrayCosine.cosine(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData],
      leftFloat, rightFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ArrayCosine.cosine($a, $b, $leftFloat, $rightFloat)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ArrayCosine {
  def cosine(a: ArrayData, b: ArrayData,
      leftFloat: Boolean, rightFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (leftFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rightFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    // zero-norm vectors: define cosine as 0.0 (no similarity) rather than
    // NaN — NaN sorts ABOVE every double in Spark, so a garbage all-zero
    // embedding would otherwise rank as the #1 neighbor of every query
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }
}

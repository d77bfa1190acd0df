package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression,
  UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Squared euclidean distance of two array<double> columns in one pass,
  * index-ordered sum — bit-identical to the
  * `aggregate(zip_with(a, b, (x, y) => (x-y)*(x-y)), 0.0, _+_)` lambda
  * composition it replaces (same left fold in element order), including
  * the null contract: null if either array is null, if the lengths
  * differ (zip_with pads the shorter side with nulls, and a null term
  * nulls the whole fold), or if any element is null.
  *
  * Replaces the lambdas because Spark evaluates higher-order functions
  * INTERPRETED (CodegenFallback) — per-row closure dispatch plus a
  * materialized intermediate array per pair — which made the distance
  * the hot cost of every assignment loop. This expression participates
  * in whole-stage codegen (one static call per row; the MinHashSigs /
  * ArrayCosine round-18 treatment).
  */
case class SqDist(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "sq_dist"

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> inputs, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override protected def nullSafeEval(l: Any, r: Any): Any =
    SqDist.dist(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val d = ctx.freshName("sqDist")
      s"""
         |java.lang.Double $d = graft.functions.SqDist.dist($a, $b);
         |if ($d == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $d.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SqDist {
  /** null on length mismatch or any null element — exactly when the
    * zip_with/aggregate fold would be null (boxed so the generated code
    * can see the null without a second pass).
    */
  def dist(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getDouble(i) - b.getDouble(i)
      s += d * d
      i += 1
    }
    java.lang.Double.valueOf(s)
  }
}

/** All k squared euclidean distances of a vector against a plan-time
  * centroid matrix, as one array<double> — the fused form of
  * `array(round(aggregate(zip_with(v, c_1, ...), ...), 6), ..., c_k)`
  * (`round6 = true`, Clustering's round-before-argmin contract) and of
  * `transform(centLit, c => aggregate(zip_with(v, c, ...), ...))`
  * (`round6 = false`, SemanticDedup's assignment): one pass per
  * centroid, index-ordered sums, so every element is bit-identical to
  * the lambda composition it replaces. Element-level null contract
  * matches too: a null / length-mismatched / null-element input vector
  * yields null ELEMENTS (the old CreateArray/transform forms returned a
  * non-null array of nulls; the enclosing array itself is only null for
  * a null input vector, where the two forms are observationally
  * identical through array_min / array_position / element_at — all
  * null either way).
  *
  * `round6` replicates Spark's `round(col, 6)` on DoubleType exactly:
  * NaN/Infinity pass through, else
  * `BigDecimal(d).setScale(6, HALF_UP).toDouble` (RoundBase's double
  * branch; SqDistsSpec fuzz-pins the parity against the builtin).
  */
case class SqDistToAll(child: Expression, cents: Seq[Seq[Double]],
    round6: Boolean) extends UnaryExpression {
  require(cents.nonEmpty, "need at least one centroid")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "sq_dist_to_all"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.simpleString}")
  }

  @transient private lazy val centArr: Array[Array[Double]] =
    cents.map(_.toArray).toArray

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(SqDistToAll.compute(
      input.asInstanceOf[ArrayData], centArr, round6))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", centArr, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.SqDistToAll.compute($c, $centsRef, $round6));
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SqDistToAll {
  /** Spark's round(double, 6): NaN/Infinity unchanged, else BigDecimal
    * HALF_UP at scale 6 (RoundBase's DoubleType branch). Shared with
    * Clustering's centroid-update rounding — the Lloyd determinism
    * contract needs the argmin rounding and the update rounding to
    * agree exactly, so there is ONE definition.
    */
  @inline private[graft] def round6(x: Double): Double =
    if (x.isNaN || x.isInfinite) x
    else BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  def compute(v: ArrayData, cents: Array[Array[Double]],
      round: Boolean): Array[Any] = {
    val k = cents.length
    val out = new Array[Any](k)
    val n = v.numElements()
    // any null element nulls every distance (all centroids share dims)
    var hasNull = false
    var i = 0
    while (i < n && !hasNull) { hasNull = v.isNullAt(i); i += 1 }
    var c = 0
    while (c < k) {
      val cent = cents(c)
      if (hasNull || cent.length != n) out(c) = null
      else {
        var s = 0.0
        i = 0
        while (i < n) {
          val d = v.getDouble(i) - cent(i)
          s += d * d
          i += 1
        }
        out(c) = java.lang.Double.valueOf(if (round) round6(s) else s)
      }
      c += 1
    }
    out
  }
}

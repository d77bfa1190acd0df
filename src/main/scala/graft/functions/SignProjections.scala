package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** All `tables` sign-random-projection LSH buckets of an embedding in one
  * pass: bucket_t bit p = [ sum_d(emb[d] * s(t,p,d)) > 0 ] where the
  * ±1 sign s(t,p,d) = MurmurHash3.stringHash("t<t>:<p>:<d>") & 1 — the
  * exact sign source the old per-plane Column formulation used, so the
  * buckets (and the measured recall floors) are bit-identical.
  *
  * Replaces that formulation: expanding planes × dims `getItem × lit`
  * terms per table produced a ~3,000-node expression tree that blew
  * janino's 64 KB method limit and silently fell back to interpreted
  * evaluation (4 CodeGenerator errors per test run). Here the sign matrix
  * is hashed once at plan time into a primitive array and each row is a
  * tight tables × planes × dims loop — one JVM call per row
  * (CodegenFallback), the same pattern as [[MinHashSigs]].
  *
  * Returns array<long> of length `tables`; null only for null input.
  */
case class SignProjections(child: Expression, planes: Int, tables: Int,
    dims: Int) extends UnaryExpression {
  require(planes >= 1 && planes <= 62, "planes must fit in a long bucket id")
  require(tables >= 1 && dims >= 1)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sign_projections"

  // registered as a SQL function, so inputs are user-controlled: only
  // float/double arrays read correctly through getFloat/getDouble (an
  // int array would be silently misread as garbage buckets)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float> or array<double>, got " +
            other.catalogString)
    }

  private lazy val childIsFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  // signs(t)(p * dims + d) = ±1.0, precomputed once per plan
  @transient private lazy val signs: Array[Array[Double]] =
    Array.tabulate(tables) { t =>
      val m = new Array[Double](planes * dims)
      var p = 0
      while (p < planes) {
        var d = 0
        while (d < dims) {
          val h = scala.util.hashing.MurmurHash3.stringHash(s"t$t:$p:$d")
          m(p * dims + d) = if ((h & 1) == 1) 1.0 else -1.0
          d += 1
        }
        p += 1
      }
      m
    }

  /** Shared by the interpreted eval and the generated code. */
  def project(arr: ArrayData): ArrayData = {
    val n = math.min(dims, arr.numElements())
    val v = new Array[Double](n)
    var d = 0
    while (d < n) {
      // null elements contribute 0 to every projection (skipped dimension)
      v(d) = if (arr.isNullAt(d)) 0.0
        else if (childIsFloat) arr.getFloat(d).toDouble
        else arr.getDouble(d)
      d += 1
    }
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      val m = signs(t)
      var bucket = 0L
      var p = 0
      while (p < planes) {
        var proj = 0.0
        val base = p * dims
        d = 0
        while (d < n) { proj += v(d) * m(base + d); d += 1 }
        if (proj > 0) bucket |= 1L << p
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    project(input.asInstanceOf[ArrayData])

  // round-19: real doGenCode instead of CodegenFallback — the fallback
  // forced the enclosing projection out of whole-stage codegen (the
  // MinHashSigs round-18 finding); the sign matrix rides in the plan
  // reference array via `this`, hashed once per task
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("signProjections", this,
      classOf[SignProjections].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.project($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

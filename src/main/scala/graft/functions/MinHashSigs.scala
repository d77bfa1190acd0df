package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** All `numHashes` MinHash values of a shingle array in one pass:
  * m_i = min over shingles of perm_i(rolling_hash31(shingle)), with
  * perm_i(h) = (h*(2i+3) + (i*2654435761 mod P)) mod P, P = 2^31-1 —
  * exactly the affine permutation family Dedup.minhashSignatures used to
  * compute via explode + 128 partial-min aggregates.
  *
  * Replaces that aggregation: the explode materialized ~|shingles| rows
  * per doc through a 128-buffer hash aggregate and forced a groupBy
  * exchange; this expression keeps the whole signature a per-row project
  * (no shuffle at all), hashing each shingle once and updating 128 mins
  * in a tight loop. Returns null for empty arrays (upstream filters
  * size > 0, matching the old groupBy which had no row to aggregate).
  *
  * Round-18 (optimization): proper `doGenCode` instead of
  * CodegenFallback — the fallback forced the whole signature projection
  * out of whole-stage codegen (per-row InternalRow materialization
  * around the call); the generated code now calls the same static
  * [[MinHashSigs.compute]] inline. The inner loop's `% P` is replaced
  * by the Mersenne-prime fold (P = 2^31-1, so x mod P folds as
  * (x & P) + (x >>> 31) with one conditional subtract — valid here
  * because x = h*(2i+3)+c_i < 2^41 stays far inside the fold's
  * exact domain),
  * bit-identical values at ~1/5 the per-op latency of a 64-bit
  * division.
  */
case class MinHashSigs(child: Expression, numHashes: Int)
    extends UnaryExpression {
  require(numHashes >= 1)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sigs"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val len = arr.numElements()
    if (len == 0) null
    else {
      val out = MinHashSigs.compute(arr, len, numHashes)
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val len = ctx.freshName("mhLen")
      s"""
         |int $len = $c.numElements();
         |if ($len == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |    graft.functions.MinHashSigs.compute($c, $len, $numHashes));
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSigs {
  private val P = 2147483647L // 2^31 - 1, prime

  /** x mod P for 0 <= x < 2^61, via the Mersenne fold: x = q*2^31 + r
    * with q = x >>> 31, r = x & P, and 2^31 ≡ 1 (mod P), so
    * x ≡ q + r (mod P); for x < 2^61, q < 2^30 and r <= P, so
    * q + r < 2P and one conditional subtract lands exactly in [0, P).
    * Identical to `x % P` on that domain (callers stay below 2^41).
    */
  @inline private def modP(x: Long): Long = {
    val f = (x & P) + (x >>> 31)
    if (f >= P) f - P else f
  }

  def compute(arr: ArrayData, len: Int, k: Int): Array[Long] = {
    val mins = Array.fill(k)(Long.MaxValue)
    // additive constants c_i = (i * 2654435761) mod P, hoisted per call
    val adds = new Array[Long](k)
    var i = 0
    while (i < k) { adds(i) = (i.toLong * 2654435761L) % P; i += 1 }
    var s = 0
    while (s < len) {
      val h = RollingHash31.hash(arr.getUTF8String(s).toString)
      i = 0
      while (i < k) {
        // h < 2^31, (2i+3) <= 2^9 for k <= 128-ish, c_i < 2^31:
        // h*(2i+3)+c_i < 2^41 — inside the fold's exact domain (< 2^61)
        val v = modP(h * (2L * i + 3) + adds(i))
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      s += 1
    }
    mins
  }
}

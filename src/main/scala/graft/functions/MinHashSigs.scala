package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
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
  */
case class MinHashSigs(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {
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

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSigs {
  private val P = 2147483647L // 2^31 - 1, prime

  private[functions] def compute(arr: ArrayData, len: Int, k: Int): Array[Long] = {
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
        val v = (h * (2L * i + 3) + adds(i)) % P
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      s += 1
    }
    mins
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-store maintenance: L2 normalization and symmetric int8
  * (maxabs) quantization — the standard 4x compression applied before an
  * embedding corpus is served or shipped to an ANN index.
  *
  * Scale design: pure per-row projects over the vector column — no
  * shuffle, fused by Catalyst into the surrounding stage. These run as
  * interpreted higher-order functions, which is fine for a
  * once-per-corpus maintenance pass (unlike the per-candidate-pair hot
  * loops, which use native expressions — ArrayCosine, SignProjections);
  * if quantization ever lands in a verify hot path, promote it to a
  * native expression the same way.
  */
object Embeddings {

  private def asDouble(vec: Column): Column =
    transform(vec, x => x.cast("double"))

  def l2Norm(vec: Column): Column =
    sqrt(aggregate(asDouble(vec), lit(0.0), (acc, x) => acc + x * x))

  def maxAbs(vec: Column): Column =
    aggregate(asDouble(vec), lit(0.0), (acc, x) => greatest(acc, abs(x)))

  /** Unit-norm copy of the vector (null-safe zero vectors pass through). */
  def normalized(vec: Column): Column = {
    val n = l2Norm(vec)
    when(n > 0, transform(asDouble(vec), x => x / n)).otherwise(asDouble(vec))
  }

  /** Symmetric int8 codes: round(127 * x / maxabs) via floor(y + 0.5) —
    * a formulation both engines evaluate identically in IEEE doubles
    * (round() half-rule conventions differ between engines; floor+0.5
    * does not). Zero vectors quantize to all-zero codes.
    */
  def int8Codes(vec: Column): Column = {
    val m = maxAbs(vec)
    transform(asDouble(vec), x =>
      when(m > 0, floor(x * 127.0 / m + 0.5)).otherwise(lit(0.0)).cast("int"))
  }

  /** Deterministic ±1 projection matrix for Johnson-Lindenstrauss sign
    * random projection (Achlioptas 2003's database-friendly variant with
    * p=1/2): sign(j,i) = low bit of fmix32(FNV-1a-32("j:i")), where
    * fmix32 is MurmurHash3's finalizer. The avalanche step matters: the
    * raw FNV low bit is just the parity of the input bytes' low bits
    * (odd-multiplier arithmetic preserves parity), which makes rows of
    * the matrix exact negations of each other. Generated on both engines
    * from the same literals — the matrix is embedded in the plan and in
    * the oracle SQL, so no cross-engine RNG is involved.
    */
  def projectionSigns(outDims: Int, inDims: Int): Array[Array[Double]] =
    Array.tabulate(outDims, inDims) { (j, i) =>
      var h = 0x811c9dc5L // FNV-1a 32-bit offset basis
      s"$j:$i".getBytes("UTF-8").foreach { b =>
        h = ((h ^ (b & 0xffL)) * 0x01000193L) & 0xffffffffL
      }
      h ^= h >>> 16; h = (h * 0x85ebca6bL) & 0xffffffffL
      h ^= h >>> 13; h = (h * 0xc2b2ae35L) & 0xffffffffL
      h ^= h >>> 16
      if ((h & 1L) == 0L) 1.0 else -1.0
    }

  /** JL sign random projection to `outDims` dimensions, scaled by
    * 1/sqrt(outDims): r_j = sum_i(sign(j,i) * x_i) / sqrt(outDims).
    * Output: (id, r0..r{outDims-1}) rounded to 6 dp.
    *
    * Scale design: a pure per-row project (the matrix is plan literals),
    * fused into the corpus scan — the 100 TB cost is the scan itself,
    * and downstream ANN/cluster passes run on outDims/inDims of the data.
    */
  def randomProjection(df: DataFrame, idCol: String, vecCol: String,
      outDims: Int, inDims: Int): DataFrame = {
    val signs = projectionSigns(outDims, inDims)
    val scale = lit(math.sqrt(outDims.toDouble))
    val outs = (0 until outDims).map { j =>
      val dot = aggregate(
        zip_with(asDouble(col(vecCol)), typedLit(signs(j).toSeq),
          (x, s) => x * s),
        lit(0.0), (acc, t) => acc + t)
      round(dot / scale, 6).as(s"r$j")
    }
    df.select(col(idCol) +: outs: _*)
  }

  /** Rows of (id, maxabs, codes) — the stored quantized form. */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol), round(maxAbs(col(vecCol)), 6).as("maxabs"),
      int8Codes(col(vecCol)).as("codes"))

  /** Scalar digest of the quantized form, for oracle-checked verification
    * (the driver's comparator needs scalar cells): dims, L2 norm, maxabs,
    * and a position-weighted code checksum sum(i * code_i) that pins every
    * code and its position without emitting the array.
    */
  def int8Digest(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = col(vecCol)
    val weighted = zip_with(int8Codes(v), sequence(lit(1), size(v)),
      (c, i) => c.cast("double") * i.cast("double"))
    df.select(
      col(idCol),
      size(v).cast("long").as("n_dims"),
      round(l2Norm(v), 6).as("l2_norm"),
      round(maxAbs(v), 6).as("maxabs"),
      aggregate(weighted, lit(0.0), (acc, x) => acc + x)
        .cast("long").as("code_checksum"))
  }
}

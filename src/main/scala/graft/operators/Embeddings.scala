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

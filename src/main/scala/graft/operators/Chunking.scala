package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Fns

/** Training-data shaping operators: overlapping token-window chunking
  * and greedy sequence packing — the two transforms between "clean
  * documents" and "model-ready sequences" in an LLM data pipeline.
  *
  * Scale: chunking is a per-row generator (flatMap shape, no shuffle;
  * output rows ≈ tokens/stride per doc). Packing is one window cumsum
  * per partition key plus a groupBy — two exchanges on the partition
  * key, independent of token budget.
  */
object Chunking {

  /** Overlapping chunks: chunk starting at token offset `i*stride`
    * covers tokens [i*stride, i*stride + window). The final partial
    * chunk is kept (standard practice: short tails are padded
    * downstream, not dropped). Output: id, chunk_start (token offset),
    * n_chunk_tokens, chunk_text.
    */
  def chunks(docs: DataFrame, idCol: String, textCol: String,
      window: Int, stride: Int): DataFrame = {
    require(window >= 1, "window must be >= 1")
    require(stride >= 1, "stride must be >= 1")
    docs.select(col(idCol), Fns.tokens(col(textCol)).as("toks"))
      .select(col(idCol), col("toks"),
        explode(sequence(lit(0),
          greatest(size(col("toks")) - 1, lit(0)),
          lit(stride))).as("cs"))
      .filter(col("cs") < size(col("toks")))
      .withColumn("chunk_start", col("cs").cast("long"))
      .select(col(idCol), col("chunk_start"),
        slice(col("toks"), col("chunk_start") + 1, lit(window)).as("chunk"))
      .select(col(idCol), col("chunk_start"),
        size(col("chunk")).cast("long").as("n_chunk_tokens"),
        array_join(col("chunk"), " ").as("chunk_text"))
  }

  /** Greedy in-order sequence packing: within each `partCol` stratum,
    * documents ordered by `orderCol` fill fixed `budget`-token
    * sequences; a document belongs to the sequence its FIRST token
    * lands in (first-fit-in-order — documents may straddle a boundary;
    * the downstream tokenizer splits them, this op only assigns them).
    * Adds n_toks, cum (running total incl. this doc), seq_id.
    */
  def withSequenceIds(df: DataFrame, partCol: String, orderCol: String,
      tokenCount: Column, budget: Int): DataFrame = {
    require(budget >= 1, "budget must be >= 1")
    val w = Window.partitionBy(partCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("n_toks", tokenCount.cast("long"))
      .withColumn("cum", sum("n_toks").over(w))
      // integer division (`div` / DuckDB `//`): exact at any magnitude,
      // no float rounding to reason about (counts are non-negative)
      .withColumn("seq_id", expr(s"(cum - n_toks) div $budget"))
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Fns

/** Tokenizer evaluation — fertility and compression per corpus slice,
  * the acceptance metrics a tokenizer change ships against: FERTILITY
  * (subword pieces per whitespace word — rising fertility on a language
  * means the vocab underserves it, inflating sequence lengths and
  * training cost for that slice) and CHARS-PER-PIECE (how much text a
  * piece carries — the compression the context window actually buys).
  * Closes the tokenization family's loop: p68 trains, p73 encodes, this
  * MEASURES — per slice, so a vocab retrain can be gated on "no
  * language's fertility regresses" instead of a corpus-blind average.
  *
  * Scale shape: ONE corpus scan, zero corpus-sized shuffles — every
  * per-document number (word count, char sum, piece count) is per-row
  * arithmetic fused into the scan: pieces come from the
  * [[graft.functions.BpeEncodeArray]] scalar (the generator's stream as
  * one bounded array, counted by size() — piece ROWS never exist, so
  * nothing corpus-token-sized reaches the exchange), words/chars from
  * codegen HOFs over the token array. One slice-keyed partial agg
  * carries six numbers per slice; no join, no windows. Ratios are
  * exact-integer divisions rounded at 6dp — the engine-invariance rule.
  */
object TokenizerEval {

  /** Per-slice (slice, n_words, n_word_chars, n_pieces, fertility,
    * chars_per_piece) under the given BPE merge table (lowest rank
    * first — [[graft.operators.BpeTrainer.learnMerges]]'s output order).
    *
    * Degenerate slices: a slice whose every doc has NULL text still
    * emits its row, with null counts and null ratios (the per-row
    * numbers null-propagate and an all-null SUM is null). The older
    * two-scan formulation dropped such slices via its inner join; the
    * one-scan report keeps them deliberately — "this slice exists and
    * contributed no measurable text" is signal, not noise, and the
    * DuckDB oracle's plain GROUP BY agrees with it.
    */
  def fertilityReport(docs: DataFrame, textCol: String, sliceCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val tk = Fns.tokens(col(textCol))
    docs
      .select(col(sliceCol).as("slice"), size(tk).as("nw"),
        aggregate(transform(tk, t => length(t)), lit(0),
          (a, x) => a + x).as("nc"),
        size(Fns.bpeEncodeArray(tk, merges)).as("np"))
      .groupBy("slice")
      .agg(sum(col("nw")).as("n_words"), sum(col("nc")).as("n_word_chars"),
        sum(col("np")).as("n_pieces"))
      .select(col("slice"), col("n_words"), col("n_word_chars"),
        col("n_pieces"),
        round(col("n_pieces").cast("double") / col("n_words"), 6)
          .as("fertility"),
        round(col("n_word_chars").cast("double") / col("n_pieces"), 6)
          .as("chars_per_piece"))
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.WordPieceRows
import graft.operators.TextAnalysis

/** WordPiece generator contract (p47): known-vocab goldens for the greedy
  * longest-match automaton, lossless reassembly on fixture text, the
  * exchange-free plan shape, and constructor validation.
  */
class WordPieceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val tinyVocab = Seq("un", "##able", "a", "##a", "b", "##b", "l",
    "##l", "e", "##e", "n", "##n", "u", "x", "##x")

  private def pieces(token: String, vocab: Seq[String] = tinyVocab,
      maxChars: Int = 16): Seq[String] =
    WordPieceRows(org.apache.spark.sql.catalyst.expressions.Literal(token),
      vocab, maxChars).tokenize(token)

  test("greedy longest-match goldens") {
    // longest-first: "un" beats "u", "##able" beats "##a"
    assert(pieces("unable") == Seq("un", "##able"))
    assert(pieces("banana") ==
      Seq("b", "##a", "##n", "##a", "##n", "##a"))
    // no initial match at all
    assert(pieces("zzz") == Seq("[UNK]"))
    // mid-token failure discards already-matched pieces (the WordPiece
    // contract: the WHOLE token becomes [UNK])
    assert(pieces("ab!") == Seq("[UNK]"))
    // oversized tokens short-circuit to [UNK] even when tokenizable
    assert(pieces("a" * 17) == Seq("[UNK]"))
    assert(pieces("a" * 16) == Seq("a") ++ Seq.fill(15)("##a"))
    assert(pieces("") == Nil)
  }

  test("pieces reassemble into the original token on fixture text") {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val vocab = graft.queries.PipelineMore.wpVocab
    val wp = TextAnalysis.wordpiece(docs, "doc_id", "text", vocab)
    val reassembled = wp.groupBy("doc_id", "tok_idx")
      .agg(array_join(transform(
          array_sort(collect_list(struct(col("piece_idx"), col("piece")))),
          x => regexp_replace(x.getField("piece"), "^##", "")), "").as("glued"),
        max(col("piece") === "[UNK]").as("unk"),
        count(lit(1)).as("n_pieces"),
        max("piece_idx").as("max_idx"))
    // piece_idx is contiguous 0..n-1; the glue sorts by it explicitly
    // (collect_list order is NOT stable under aggregation fallback)
    assert(reassembled.filter(col("max_idx") =!= col("n_pieces") - 1).isEmpty)
    val toks = docs.select(col("doc_id"),
      posexplode(split(col("text"), " ")).as(Seq("tok_idx", "token")))
    val joined = reassembled.join(toks, Seq("doc_id", "tok_idx"))
    val bad = joined.filter(!col("unk") && col("glued") =!= col("token"))
    assert(bad.isEmpty, bad.head(5).mkString("\n"))
    // fixture text is lowercase alnum — it exercises the tokenize path;
    // the [UNK] path end-to-end needs a synthetic row
    assert(joined.filter(!col("unk")).count() > 0, "no tokenized coverage")
    val unkRows = TextAnalysis.wordpiece(
      Seq((1L, "Hello word überlangwortbeispiel")).toDF("doc_id", "text"),
      "doc_id", "text", vocab)
      .select("tok_idx", "piece_idx", "piece")
      .as[(Int, Int, String)].collect().toSet
    assert(unkRows.filter(_._3 == "[UNK]") ==
      Set((0, 0, "[UNK]"), (2, 0, "[UNK]")),
      s"uppercase + oversized tokens must be [UNK]: $unkRows")
  }

  test("plan is a pure generator over the scan — no exchange, no join") {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val wp = TextAnalysis.wordpiece(docs, "doc_id", "text",
      graft.queries.PipelineMore.wpVocab)
    val plan = wp.queryExecution.executedPlan.toString
    assert(plan.contains("Generate"), plan)
    assert(!plan.contains("Exchange") && !plan.contains("Join"), plan)
  }

  test("vocab entries with empty bodies are rejected at construction") {
    intercept[IllegalArgumentException](pieces("a", vocab = Seq("a", "##")))
    intercept[IllegalArgumentException](pieces("a", vocab = Seq("a", "")))
    intercept[IllegalArgumentException](pieces("a", vocab = Nil))
    // the broadcast transport validates driver-side too
    intercept[IllegalArgumentException](
      TextAnalysis.wordpieceBroadcast(
        Seq((1L, "a")).toDF("doc_id", "text"), "doc_id", "text", Seq("##")))
  }

  test("broadcast-vocab transport: identical rows to the literal path on a 30k vocab, exchange-free plan") {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
      .filter(col("doc_id") % 3 === 0) // thin WITHOUT a limit (its Exchange)
    // a realistic-SIZED vocabulary: the fixture-covering vocab plus ~30k
    // synthetic pieces (padding entries that can also genuinely match)
    val vocab = (graft.queries.PipelineMore.wpVocab ++
      (0 until 30000).map(i => s"zq${i}x") ++
      (0 until 2000).map(i => s"##zq${i}x")).distinct
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "tok_idx", "piece_idx", "piece")
        .as[(Long, Int, Int, String)].collect().toSeq.sorted
    val lit = TextAnalysis.wordpiece(docs, "doc_id", "text", vocab)
    val bc = TextAnalysis.wordpieceBroadcast(docs, "doc_id", "text", vocab)
    assert(rows(bc) == rows(lit))
    assert(rows(bc).nonEmpty)
    val plan = bc.queryExecution.executedPlan.toString
    assert(plan.contains("Generate"), plan)
    assert(!plan.contains("Exchange") && !plan.contains("Join"), plan)
    // and the broadcast expression's plan footprint stays vocab-free: a
    // 30k-literal plan would print its entries; the handle must not
    assert(!plan.contains("zq29999x"), "vocab leaked into the plan/closure")
  }
}

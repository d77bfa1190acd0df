package graft.queries

import org.apache.spark.sql.functions._
import graft.api.{QueryDef, Tables}
import graft.operators.{Decontaminate, TextAnalysis}

/** Round-4 training-data pipeline additions: benchmark decontamination,
  * repetition-based quality rules, embedding maintenance, PII
  * pseudonymization. Same conventions as PipelineQueries (total-order
  * output, scalar columns, identical aliases both engines).
  */
object PipelineExt {

  // DuckDB mirror of Fns.shingles(tokens, n): distinct contiguous word
  // n-grams joined by single spaces (i ranges 1..len-n+1, 1-based).
  private def duckGrams(n: Int): String = {
    val terms = (0 until n).map(j => s"tk[i+$j]").mkString(" || ' ' || ")
    s"list_distinct([$terms FOR i IN range(1, len(tk) - ${n - 2})])"
  }

  val defs: Seq[QueryDef] = Seq(

    // --- benchmark decontamination (GPT-3 appendix C procedure): docs
    //     with doc_id % 20 = 0 stand in for the eval/benchmark set; a
    //     train doc is contaminated when it shares any distinct word
    //     4-gram with any eval doc. The eval n-gram set is broadcast, so
    //     the train corpus is never shuffled (see Decontaminate). ---
    QueryDef(
      "p17_decontaminate",
      (s, dir) => {
        val docs = Tables.t(s, dir, "documents")
        Decontaminate.overlapCounts(
            train = docs.filter(col("doc_id") % 20 =!= 0),
            eval = docs.filter(col("doc_id") % 20 === 0),
            idCol = "doc_id", textCol = "text", n = 4)
          .withColumnRenamed("id", "doc_id")
          .orderBy("doc_id")
      },
      Some(
        s"""WITH t AS (SELECT doc_id, string_split(text, ' ') tk FROM documents),
           |g AS (SELECT doc_id, ${duckGrams(4)} s
           |      FROM t WHERE len(tk) >= 4),
           |eg AS (SELECT DISTINCT unnest(s) gram FROM g WHERE doc_id % 20 = 0),
           |tg AS (SELECT doc_id, unnest(s) gram FROM g WHERE doc_id % 20 <> 0)
           |SELECT tg.doc_id, count(*) AS n_overlap
           |FROM tg JOIN eg USING (gram)
           |GROUP BY tg.doc_id ORDER BY tg.doc_id""".stripMargin)),

    // --- Gopher repetition rules: duplicate word/2-gram/3-gram occurrence
    //     fractions per doc (1 - distinct/total). Pure per-row project —
    //     the 100 TB cost is one corpus scan fused into whatever stage
    //     runs next. ---
    QueryDef(
      "p18_repetition",
      (s, dir) => Tables.t(s, dir, "documents")
        .select(col("doc_id") +: TextAnalysis.repetitionColumns(col("text")): _*)
        .orderBy("doc_id"),
      Some(
        s"""WITH t AS (SELECT doc_id, string_split(text, ' ') tk FROM documents)
           |SELECT doc_id,
           |  round(1.0 - len(list_distinct(tk))::DOUBLE / len(tk), 6)
           |    AS dup_word_frac,
           |  CASE WHEN len(tk) >= 2 THEN
           |    round(1.0 - len(${duckGrams(2)})::DOUBLE / (len(tk) - 1), 6)
           |  ELSE 0.0 END AS dup_2gram_frac,
           |  CASE WHEN len(tk) >= 3 THEN
           |    round(1.0 - len(${duckGrams(3)})::DOUBLE / (len(tk) - 2), 6)
           |  ELSE 0.0 END AS dup_3gram_frac
           |FROM t ORDER BY doc_id""".stripMargin))
  )
}

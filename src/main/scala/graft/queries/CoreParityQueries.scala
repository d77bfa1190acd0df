package graft.queries

import org.apache.spark.sql.functions._
import graft.api.{QueryDef, Tables}
import graft.core.MapReduce

/** Reference-parity queries (word count, inverted index) over `documents`.
  * Semantics: /root/reference/mrapps/wc.go:21-31 tokenization (split on any
  * non-letter, case-sensitive) and the inferred indexer app
  * (/root/reference/main/test-mr.sh:117-144).
  */
object CoreParityQueries {

  // DuckDB (RE2) and Java both implement Unicode category L as \p{L}.
  private val sep = """[^\p{L}]+"""

  // one wordcount oracle, spliced into both the declarative and the
  // typed-mapReduce query (they must stay semantically identical)
  private val wcOracle: String =
    s"""SELECT word, count(*) AS cnt
       |FROM (SELECT unnest(string_split_regex(text, '$sep')) AS word
       |      FROM documents) t
       |WHERE word <> ''
       |GROUP BY word ORDER BY word""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "wc_wordcount",
      (s, dir) => MapReduce.wordCount(Tables.t(s, dir, "documents"), "text")
        .orderBy("word"),
      Some(wcOracle),
      bench = true),

    QueryDef(
      "wc_mapreduce_typed",
      // Same result through the generic typed mapReduce surface
      // (plugin-ABI parity: /root/reference/main/mrworker.go:32-49).
      (s, dir) => {
        import s.implicits._
        val docs = Tables.t(s, dir, "documents").select("text").as[String]
        MapReduce.mapReduce[String, String, Int, Long](
          docs,
          (text: String) => text.split(sep).iterator
            .filter(_.nonEmpty).map(w => (w, 1)),
          (_: String, vs: Iterator[Int]) => vs.map(_.toLong).sum)
          .toDF("word", "cnt")
          .orderBy("word")
      },
      Some(wcOracle)),

    QueryDef(
      "wc_inverted_index",
      (s, dir) => MapReduce.invertedIndex(Tables.t(s, dir, "documents"), "text", "doc_id")
        .orderBy("word"),
      Some(
        s"""WITH raw AS (
           |  SELECT CAST(doc_id AS VARCHAR) AS doc,
           |         unnest(string_split_regex(text, '$sep')) AS word
           |  FROM documents),
           |tok AS (SELECT DISTINCT doc, word FROM raw WHERE word <> '')
           |SELECT word, count(*) AS ndocs,
           |       string_agg(doc, ',' ORDER BY doc) AS doclist
           |FROM tok GROUP BY word ORDER BY word""".stripMargin))
  )
}

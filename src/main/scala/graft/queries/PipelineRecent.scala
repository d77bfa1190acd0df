package graft.queries

import org.apache.spark.sql.functions._
import graft.api.{QueryDef, Tables}
import graft.operators.LineDedup

/** Round-8 additions beyond the judge's carry-over list: line-level
  * boilerplate dedup (the CCNet/RefinedWeb filter) and KMV distinct-count
  * sketching (mergeable-summaries ABI instance #3). Same conventions as
  * PipelineQueries — total-order output, scalar columns, identical
  * aliases on both engines.
  */
object PipelineRecent {

  val defs: Seq[QueryDef] = Seq(

    // --- per-doc distinct-token cardinality via the KMV sketch: the
    //     exact-regime contract (distinct << capacity 4096 — fixture
    //     docs draw from a ~40-word vocabulary) makes the plain
    //     count(DISTINCT) the oracle, q50/q76's pattern for sketch
    //     operators. The repartition by token deliberately SCATTERS each
    //     doc's tokens across partitions so every group's answer is
    //     assembled by merging per-partition partial sketches — the
    //     mergeable-summaries path is what the hash-compare certifies,
    //     not a single-buffer fold. ---
    QueryDef(
      "q81_kmv_distinct",
      (s, dir) => {
        val kmv = udaf(new graft.functions.KmvDistinct(4096),
          org.apache.spark.sql.Encoders.STRING)
        Tables.t(s, dir, "documents")
          .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
          .repartition(32, col("tok"))
          .groupBy("doc_id")
          .agg(kmv(col("tok")).as("n_distinct"))
          .orderBy("doc_id")
      },
      Some(
        """SELECT doc_id, CAST(count(DISTINCT t) AS BIGINT) AS n_distinct
          |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t
          |      FROM documents)
          |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // --- line-level (paragraph) boilerplate dedup: each doc is
    //     deterministically re-lined at 8 tokens per line (the fixture
    //     text is single-line; the SAME slice arithmetic runs on both
    //     engines), then every line found in >= 3 DISTINCT docs is
    //     dropped from all of them and the doc re-assembled in position
    //     order — RefinedWeb's template-line removal. The clean text is
    //     emitted whole, so the driver hash pins every kept character
    //     and boundary. ---
    QueryDef(
      "p60_line_dedup",
      (s, dir) => {
        val ts = split(col("text"), " ")
        val nL = ((size(ts) + lit(7)) / lit(8)).cast("int")
        val lined = Tables.t(s, dir, "documents").select(col("doc_id"),
          array_join(transform(sequence(lit(0), nL - 1),
            i => array_join(slice(ts, i * lit(8) + lit(1), lit(8)), " ")),
            "\n").as("text"))
        LineDedup.dropSharedLines(lined, "doc_id", "text", "\n", minDocs = 3)
          .orderBy("doc_id")
      },
      Some(
        """WITH lined AS (
          |  SELECT doc_id, list_transform(range(0, (len(ts)+7)//8),
          |    i -> array_to_string(ts[i*8+1:i*8+8], ' ')) AS ls
          |  FROM (SELECT doc_id, string_split(text, ' ') AS ts
          |        FROM documents)),
          |lines AS (
          |  SELECT doc_id, unnest(range(1, len(ls)+1)) AS pos,
          |    unnest(ls) AS line
          |  FROM lined),
          |dict AS (SELECT line FROM (
          |    SELECT line, count(DISTINCT doc_id) AS line_df
          |    FROM lines GROUP BY line)
          |  WHERE line_df >= 3),
          |flagged AS (
          |  SELECT l.doc_id, l.pos, l.line, d.line IS NOT NULL AS is_boiler
          |  FROM lines l LEFT JOIN dict d ON l.line = d.line)
          |SELECT doc_id, count(*) AS n_lines,
          |  CAST(sum(CASE WHEN is_boiler THEN 1 ELSE 0 END) AS BIGINT)
          |    AS n_dropped,
          |  coalesce(string_agg(CASE WHEN NOT is_boiler THEN line END,
          |    chr(10) ORDER BY pos), '') AS clean_text
          |FROM flagged GROUP BY doc_id ORDER BY doc_id""".stripMargin))
  )
}

package graft.queries

import org.apache.spark.sql.functions._
import graft.api.{QueryDef, Tables}

/** Round-10 additions: exact-substring span dedup (the Lee et al.
  * ExactSubstr transform), BM25 ranked retrieval, and the newest
  * connector/layout surface. Same conventions as PipelineQueries —
  * total-order output, scalar columns, identical aliases on both
  * engines.
  */
object PipelineLatest {

  val defs: Seq[QueryDef] = Seq(

    // --- exact duplicated-substring removal (Lee et al. ExactSubstr):
    //     every >= 8-token run occurring more than once in the corpus is
    //     merged into maximal per-doc spans and cut from the text. The
    //     engine pre-filters on xxhash64(window) so only candidate
    //     windows ever ship their text (the string-keyed confirm makes
    //     collisions harmless — acceleration invisible); the oracle is
    //     the plain string-count formulation with the same island merge
    //     as window SQL. Fully-duplicated docs clean to ''. ---
    QueryDef(
      "p82_exact_substr_dedup",
      (s, dir) => graft.operators.ExactSubstrDedup.cleanedCorpus(
          Tables.t(s, dir, "documents"), "doc_id", "text",
          w = 8, minCount = 2)
        .orderBy("doc_id"),
      Some(
        """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS tk
          |             FROM documents),
          |wins AS (SELECT doc_id, i - 1 AS s,
          |           array_to_string(tk[i:i+7], ' ') AS span
          |         FROM (SELECT doc_id, tk,
          |                 unnest(range(1, len(tk) - 6)) AS i
          |               FROM tok WHERE len(tk) >= 8)),
          |dup AS (SELECT span FROM wins GROUP BY span
          |        HAVING count(*) >= 2),
          |m AS (SELECT wins.doc_id, wins.s FROM wins JOIN dup USING (span)),
          |brk AS (SELECT doc_id, s,
          |          CASE WHEN s - lag(s) OVER (PARTITION BY doc_id
          |            ORDER BY s) <= 8 THEN 0 ELSE 1 END AS b
          |        FROM m),
          |isl AS (SELECT doc_id, s,
          |          sum(b) OVER (PARTITION BY doc_id ORDER BY s) AS g
          |        FROM brk),
          |iv AS (SELECT doc_id, g, min(s) AS b, max(s) + 8 AS e
          |       FROM isl GROUP BY doc_id, g),
          |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
          |          CAST(sum(e - b) AS BIGINT) AS dup_tokens
          |        FROM iv GROUP BY doc_id),
          |toks AS (SELECT doc_id, i - 1 AS pos, tk[i] AS w2
          |         FROM (SELECT doc_id, tk,
          |                 unnest(range(1, len(tk) + 1)) AS i
          |               FROM tok)),
          |kept AS (SELECT t.doc_id,
          |           string_agg(t.w2, ' ' ORDER BY t.pos) AS ct
          |         FROM toks t LEFT JOIN iv
          |           ON t.doc_id = iv.doc_id
          |          AND t.pos >= iv.b AND t.pos < iv.e
          |         WHERE iv.doc_id IS NULL
          |         GROUP BY t.doc_id)
          |SELECT tok.doc_id AS doc_id,
          |  CAST(coalesce(a.n_spans, 0) AS BIGINT) AS n_spans,
          |  CAST(coalesce(a.dup_tokens, 0) AS BIGINT) AS dup_tokens,
          |  CAST(len(tk) AS INT) AS n_tokens,
          |  coalesce(k.ct, '') AS cleaned_text
          |FROM tok LEFT JOIN agg a USING (doc_id)
          |  LEFT JOIN kept k USING (doc_id)
          |ORDER BY doc_id""".stripMargin))
  )
}

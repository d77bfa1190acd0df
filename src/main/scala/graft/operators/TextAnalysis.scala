package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Fns

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token counting, fingerprinting (north-star scope;
  * reference has only word count, /root/reference/mrapps/wc.go).
  * Everything is a deterministic, codegen'd column expression — per-row,
  * embarrassingly parallel, no shuffle.
  */
object TextAnalysis {

  val stopwords: Seq[String] = Seq("the", "a", "of", "and", "in", "to")

  /** Character-class language-ID heuristic (deterministic; mirrored in
    * the DuckDB oracle with identical RE2-compatible patterns).
    */
  def langIdGuess(text: Column): Column =
    when(text.rlike("[\\x{4e00}-\\x{9fff}]"), "zh")
      .when(text.rlike("[áéíóúñ¿¡]"), "es")
      .when(text.rlike("[äöüß]"), "de")
      .when(text.rlike("[èàçêôû]"), "fr")
      .otherwise("en")

  /** Quality metrics + composite score. */
  def qualityColumns(text: Column): Seq[Column] = {
    val toks = Fns.tokens(text)
    val nToks = size(toks).cast("double")
    val stopRatio = size(filter(toks,
      t => stopwords.map(t === _).reduce(_ || _))).cast("double") / nToks
    val punctRatio =
      length(regexp_replace(text, "[A-Za-z0-9 ]", "")).cast("double") / length(text)
    val avgTokLen = (length(text) - (nToks - 1)) / nToks
    Seq(
      nToks.cast("long").as("n_tokens"),
      round(avgTokLen, 6).as("avg_token_len"),
      round(stopRatio, 6).as("stopword_ratio"),
      round(punctRatio, 6).as("punct_ratio"),
      round(log(nToks + 1) - lit(2.0) * punctRatio - stopRatio, 6).as("quality_score"))
  }

  /** Whitespace vs BPE-ish token counts. */
  def tokenCountColumns(text: Column): Seq[Column] = Seq(
    size(Fns.tokens(text)).cast("long").as("ws_tokens"),
    size(regexp_extract_all(text,
      lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).cast("long").as("bpe_tokens"))

  /** Gopher-style repetition metrics (Rae et al. 2021, table A1): the
    * fraction of duplicate word n-gram occurrences, 1 - distinct/total,
    * for n = 1, 2, 3. High values mark boilerplate, spam and degenerate
    * repetition that survive the surface-level qualityColumns gates.
    * Per-row expressions over the same native ShingleArray as the dedup
    * family (distinct by construction) — no shuffle.
    */
  def repetitionColumns(text: Column): Seq[Column] = {
    val toks = Fns.tokens(text)
    def dupFrac(n: Int, as: String) = {
      val total = (size(toks) - (n - 1)).cast("double")
      val dist = size(Fns.shingles(toks, n)).cast("double")
      round(when(total > 0, lit(1.0) - dist / total).otherwise(0.0), 6).as(as)
    }
    Seq(dupFrac(1, "dup_word_frac"), dupFrac(2, "dup_2gram_frac"),
      dupFrac(3, "dup_3gram_frac"))
  }

  /** Composite quality gate — the filter-chain decision a pre-training
    * pipeline materializes (the C4/Gopher/FineWeb shape): every rule is
    * evaluated per row and the doc carries keep = all-pass plus the
    * FIRST failing rule's name for drop attribution (the pipeline
    * operator teams actually debug with — "what killed my data" beats a
    * bare boolean). Rules, in order:
    *   empty          text IS NULL (every other predicate would be NULL
    *                  and fall through the chain — a zero-information
    *                  row must not read as all-pass)
    *   too_short      n_tokens < minTokens
    *   too_long       n_tokens > maxTokens
    *   repetitive     dup word fraction (1 − distinct/total) > maxDupFrac
    *   token_length   mean token length outside [2, 12]
    * All per-row expressions over one scan; no shuffle — at 100 TB the
    * gate fuses into whatever stage runs next.
    */
  def qualityGate(df: DataFrame, idCol: String, textCol: String,
      minTokens: Int = 5, maxTokens: Int = 5000,
      maxDupFrac: Double = 0.3): DataFrame = {
    val toks = Fns.tokens(col(textCol))
    val nToks = size(toks).cast("double")
    val dupFrac = qualityDupFrac(col(textCol))
    val meanLen = qualityMeanTokenLen(col(textCol))
    val reason = qualityFailReason(col(textCol), minTokens, maxTokens,
      maxDupFrac)
    df.select(col(idCol),
      nToks.cast("long").as("n_tokens"),
      round(dupFrac, 6).as("dup_frac"),
      round(meanLen, 6).as("mean_token_len"),
      reason.isNull.as("keep"),
      reason.as("fail_reason"))
  }

  private[operators] def qualityDupFrac(text: Column): Column = {
    val toks = Fns.tokens(text)
    val nToks = size(toks).cast("double")
    when(nToks > 0,
      lit(1.0) - size(array_distinct(toks)).cast("double") / nToks)
      .otherwise(0.0)
  }

  // summed from the token array itself, not (char_length - separators):
  // the arithmetic shortcut assumes exactly one space between tokens
  // and skews on multi-space/tab text
  private[operators] def qualityMeanTokenLen(text: Column): Column = {
    val toks = Fns.tokens(text)
    aggregate(transform(toks, t => length(t)),
      lit(0L), (acc, x) => acc + x).cast("double") / size(toks).cast("double")
  }

  /** The gate's decision chain as a reusable expression: null = all-pass,
    * else the FIRST failing rule's name (see [[qualityGate]]).
    */
  private[operators] def qualityFailReason(text: Column, minTokens: Int,
      maxTokens: Int, maxDupFrac: Double): Column = {
    val nToks = size(Fns.tokens(text)).cast("double")
    when(text.isNull, "empty")
      .when(nToks < minTokens, "too_short")
      .when(nToks > maxTokens, "too_long")
      .when(qualityDupFrac(text) > maxDupFrac, "repetitive")
      .when(qualityMeanTokenLen(text) < 2 || qualityMeanTokenLen(text) > 12,
        "token_length")
      .otherwise(null)
  }

  /** Canonical text normalization — the step every dedup/fingerprint
    * stage assumes has already happened: Unicode NFC composition (native
    * NormalizeNFC expression; Spark has no builtin), lowercasing, and
    * whitespace collapse. Per-row, codegen'd, no shuffle.
    */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(lower(Fns.normalizeNfc(text)), "\\s+", " "))

  /** Rolling-hash document fingerprint (custom codegen'd expression). */
  def fingerprint(text: Column): Column = Fns.rollingHash31(text)

  /** One row per document with the full analysis column set. */
  def analyze(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol) +: analysisColumns(col(textCol)): _*)

  /** [[analyze]]'s columns as a bare projection — for composing into an
    * existing SELECT. `analyze(df, id, text)` then joining back on id
    * recomputes df's whole upstream twice (the analysis is per-row; a
    * join re-derives the left side for no information); appending these
    * columns costs one projection on one scan.
    */
  def analysisColumns(t: org.apache.spark.sql.Column)
      : Seq[org.apache.spark.sql.Column] =
    langIdGuess(t).as("lang_guess") +:
      fingerprint(t).as("fingerprint") +:
      (qualityColumns(t) ++ tokenCountColumns(t))

  /** Unigram-LM cross-entropy quality score (the CCNet-family filter
    * signal, with the corpus itself as the LM): per document, the mean
    * of -ln p(token) under the corpus unigram distribution. Low =
    * stopword-heavy/common prose, high = rare-token/gibberish tails —
    * threshold either side to filter.
    *
    * Scale design: token counts are one partial-agg shuffle (map-side
    * combine collapses each partition to its distinct tokens); the
    * tokens->counts join shuffles on the token key, whose stopword skew
    * is exactly the AQE skew-join case (the count side is one row per
    * token, so splitting a hot partition is always legal); the final
    * per-doc mean is one more linear shuffle. The corpus total rides a
    * broadcast 1-row cross join, never a driver collect. At 100 TB with
    * a bounded vocabulary the counts side can instead be broadcast
    * (top-V + OOV smoothing) — this exact formulation is the
    * oracle-checkable baseline.
    */
  def unigramLmScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = df.select(col(idCol).as("id"),
      explode(Fns.tokens(col(textCol))).as("t"))
    val cnt = tok.groupBy("t").agg(count(lit(1)).as("c"))
    val total = cnt.agg(sum("c").cast("double").as("n"))
    tok.join(cnt, "t")
      .crossJoin(broadcast(total))
      .groupBy("id")
      .agg(round(avg(-log(col("c") / col("n"))), 6).as("lm_score"))
      .withColumnRenamed("id", idCol)
  }

  /** Encoding-quality gate — the ingest filter that runs BEFORE any text
    * operator: mojibake and binary-contaminated docs poison every
    * downstream stage (tokenizers explode, dedup hashes diverge, LMs
    * learn garbage). Three per-row signals, all from codegen'd regex
    * counts over one scan (no shuffle):
    *   n_ctrl      C0 control characters except \t \n \r — binary
    *               contamination / truncated multibyte sequences;
    *   n_repl      U+FFFD replacement characters — a decoder already
    *               lost data upstream;
    *   ascii_ratio printable-ASCII fraction of CODEPOINTS (diagnostic,
    *               not a rule — legitimate non-Latin text scores low);
    *   keep        n_ctrl == 0 AND n_repl == 0.
    * Null text gates as keep = false with zeroed counts.
    *
    * ascii_ratio's denominator is the codepoint count, not Spark
    * `length()`'s UTF-16 code units: supplementary-plane characters
    * (emoji, rare CJK) occupy two units, and a unit-based ratio would
    * diverge from any codepoint-based engine (DuckDB's length(), Python's
    * len()) on exactly those documents. Codepoints = units − one per
    * supplementary char (each is 2 units, counted via a \\x{10000}+
    * regex removal). n_ctrl/n_repl need no adjustment — both count BMP
    * single-unit characters, where units and codepoints coincide.
    */
  def encodingGate(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = coalesce(col(textCol), lit(""))
    def removed(pattern: String) =
      (length(t) - length(regexp_replace(t, pattern, ""))).cast("long")
    val nCtrl = removed("[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]")
    val nRepl = removed("�")
    val cpLen = (length(t) -
      removed("[\\x{10000}-\\x{10FFFF}]") / 2).cast("double")
    val ascii = length(regexp_replace(t, "[^\\x20-\\x7E]", "")).cast("double")
    df.select(col(idCol),
      nCtrl.as("n_ctrl"), nRepl.as("n_repl"),
      round(when(cpLen > 0, ascii / cpLen).otherwise(0.0), 6)
        .as("ascii_ratio"),
      (col(textCol).isNotNull && nCtrl === 0 && nRepl === 0).as("keep"))
  }

  /** Per-document n-gram NOVELTY against the corpus, in id order: the
    * fraction of a doc's distinct n-grams whose FIRST corpus occurrence
    * (min doc id over all docs containing the gram) is this doc. A
    * curation signal with two live uses: ingest ordering (docs adding
    * near-zero novel content late in the corpus are dedup/boilerplate
    * suspects even when no single pair crosses a near-dup threshold) and
    * contribution attribution (how much genuinely new text a source
    * added). Docs shorter than n tokens carry no grams → excluded.
    *
    * Scale design: per-doc distinct grams stream off the ShingleRows
    * generator (no arrays); first occurrences are one partial-agg
    * min(id) shuffle on the gram key (vocab-sized, stopword-gram skew =
    * the AQE skew case since the min side is 1 row per gram); the
    * join-back is a gram-keyed equi-join; the final per-doc fraction is
    * a linear partial-agg on id. No all-pairs anything — novelty is a
    * per-gram min, not a doc×doc comparison.
    */
  def ngramNovelty(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    val grams = df.select(col(idCol).cast("long").as("id"),
        Fns.shingleRows(Fns.tokens(col(textCol)), n).as("gram"))
      .distinct()
    val first = grams.groupBy("gram").agg(min("id").as("first_id"))
    grams.join(first, "gram")
      .groupBy("id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("id") === col("first_id"), 1L).otherwise(0L)).as("n_novel"))
      .select(col("id").as(idCol), col("n_grams"), col("n_novel"),
        round(col("n_novel").cast("double") / col("n_grams"), 6).as("novelty"))
  }

  /** Variable-length repeated-span mining — the ladder extension of the
    * fixed-n p36 signal toward Lee et al.'s longest-match semantics
    * ("Deduplicating Training Data Makes Language Models Better"):
    * doubling span widths n = baseN, 2·baseN, 4·baseN, … report every
    * span occurring in >= minDf distinct documents at every width, until
    * a width yields none (or maxN is hit). Output one row per
    * (span_len, span): (span_len, span, n_docs, first_doc).
    *
    * Termination and pruning are both EXACT by window monotonicity: any
    * n-token sub-window of a 2n-token span appears in every document the
    * 2n-span appears in, so df is non-increasing in width — an empty
    * width implies all wider widths empty (safe stop), and a document
    * with no surviving n-span can contain no surviving 2n-span (so it is
    * pruned from the next pass without changing the result).
    *
    * Scale design: each pass is p36's shape — ShingleRows generator (one
    * row per distinct span per doc, no arrays) into a partial-agg count —
    * over a corpus that SHRINKS geometrically: pass k scans only documents
    * that still held a surviving span at pass k−1 (semi-join on the
    * surviving ids; boilerplate-heavy corpora converge in 2-3 passes).
    * Survivors are localCheckpoint'ed: the per-pass emptiness probe,
    * the prune join, and the final union all reuse one materialization,
    * and driver-side lineage stays flat across passes (the PageRank
    * pattern). O(log(maxN/baseN)) passes, each corpus-linear in the
    * surviving slice.
    */
  def repeatedSpansLadder(df: DataFrame, idCol: String, textCol: String,
      baseN: Int = 8, minDf: Long = 3, maxN: Int = 64,
      pruneDocs: Boolean = true): DataFrame = {
    // pruneDocs=false disables the (exact) doc prune — an A/B knob for
    // measuring the prune, never a semantics switch (RepeatedSpansSpec
    // pins equality; tools.LadderBench records the numbers)
    require(baseN >= 1 && maxN >= baseN, s"bad ladder [$baseN, $maxN]")
    val empty = df.sparkSession.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      org.apache.spark.sql.types.StructType.fromDDL(
        "span_len INT NOT NULL, span STRING, n_docs BIGINT, first_doc BIGINT"))
    var eligible = df.select(col(idCol).cast("long").as("id"),
      col(textCol).as("t"))
    var out = empty
    var n = baseN
    var exhausted = false
    while (!exhausted && n <= maxN) {
      val docSpans = eligible.select(col("id"),
        Fns.shingleRows(Fns.tokens(col("t")), n).as("span"))
      val survivors = docSpans.groupBy("span")
        .agg(count(lit(1)).as("n_docs"), min("id").as("first_doc"))
        .filter(col("n_docs") >= minDf)
        .transform(Materialize.cut) // one materialization: probe + prune + result
      if (survivors.isEmpty) exhausted = true
      else {
        out = out.unionByName(survivors.select(
          lit(n).as("span_len"), col("span"), col("n_docs"),
          col("first_doc")))
        // exact prune (see scaladoc): only docs holding a survivor can
        // hold a wider survivor
        if (pruneDocs) {
          val keep = docSpans.join(survivors.select("span"), "span")
            .select("id").distinct().transform(Materialize.cut)
          eligible = eligible.join(keep, Seq("id"), "left_semi")
            .transform(Materialize.cut)
        }
        n *= 2
      }
    }
    out
  }

  /** Zipf's-law fit over the top-N token-frequency ranks: OLS of
    * ln(count) on ln(rank) — slope near −1 is the natural-language
    * signature; a synthetic/templated corpus bends it. Returns one row
    * (n_ranks, zipf_slope, zipf_intercept, zipf_r2).
    *
    * Scale design: token counts are one partial-agg shuffle; the global
    * top-N is a distributed sort + limit (never a full-vocabulary
    * single-partition window — at 100 TB the vocabulary is tens of
    * millions of rows, so ranking happens AFTER the limit, over topN
    * rows). The regression itself is the q64 closed form over exact
    * sums, identically mirrored in the oracle.
    */
  def zipfFit(df: DataFrame, textCol: String, topN: Int = 500): DataFrame = {
    require(topN >= 3, s"need at least 3 ranks to fit, got $topN")
    val top = df.select(explode(Fns.tokens(col(textCol))).as("t"))
      .groupBy("t").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("t")).limit(topN)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("c").desc, col("t")) // post-limit: topN rows, not vocab
    val xy = top.withColumn("rank", row_number().over(w))
      .select(log(col("rank").cast("double")).as("x"),
        log(col("c").cast("double")).as("y"))
    val m = xy.agg(count(lit(1)).cast("double").as("n"),
      sum("x").as("sx"), sum("y").as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"))
    val slope = (col("n") * col("sxy") - col("sx") * col("sy")) /
      (col("n") * col("sxx") - col("sx") * col("sx"))
    // degenerate flat corpus (all counts equal): y-variance is 0, the
    // horizontal line fits exactly — define r2 = 1 instead of dividing
    // by zero (ANSI mode throws on 0/0)
    val dy = col("n") * col("syy") - col("sy") * col("sy")
    m.select(col("n").cast("long").as("n_ranks"),
      round(slope, 6).as("zipf_slope"),
      round((col("sy") - slope * col("sx")) / col("n"), 6).as("zipf_intercept"),
      round(when(dy === 0, lit(1.0))
        .otherwise(pow(col("n") * col("sxy") - col("sx") * col("sy"), 2) /
          ((col("n") * col("sxx") - col("sx") * col("sx")) * dy)), 6)
        .as("zipf_r2"))
  }

  /** Bigram-LM cross-entropy quality score: mean −ln p(w_i | w_{i−1})
    * per doc with add-one smoothing p = (c(w1,w2) + 1) / (c(w1) + V) —
    * the order-sensitive upgrade of [[unigramLmScore]] (a shuffled
    * bag of common words scores well under a unigram LM; only real
    * phrase structure scores well under a bigram one). Docs with fewer
    * than 2 tokens have no bigrams and emit no row.
    *
    * Scale design (plan-verified, PLANS.md round 6): per-doc bigrams
    * come from a lead() window on the id-partitioned token stream; in
    * the usual regime (count tables ≪ corpus → broadcast joins) the
    * final per-doc aggregate REUSES that id partitioning — partial +
    * final agg with no further corpus-wide exchange. Past broadcast
    * size the score joins shuffle on gram keys and the final aggregate
    * re-exchanges on id (inherent to scoring against global counts).
    * Count-table joins carry the stopword-pair skew AQE handles; V
    * rides a broadcast 1-row cross join.
    *
    * Catalyst has no automatic common-subplan reuse, so by default the
    * token stream computes twice (bigram branch + unigram counts) and
    * the bigram subtree twice (score join + bigram counts).
    * `persistGrams = true` caches both (MEMORY_AND_DISK, TfIdf.scored's
    * explicit-persist pattern) so the corpus is scanned and windowed
    * exactly once — the 100 TB setting. Caches are LRU-evicted; callers
    * wanting deterministic release unpersist via lineage.
    */
  def bigramLmScore(df: DataFrame, idCol: String, textCol: String,
      persistGrams: Boolean = false): DataFrame = {
    def keep(f: DataFrame) = if (persistGrams)
      f.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK) else f
    val tok = keep(df.select(col(idCol).as("id"),
      posexplode(Fns.tokens(col(textCol))).as(Seq("pos", "w"))))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy("pos")
    val bg = keep(tok.withColumn("w2", lead("w", 1).over(w))
      .filter(col("w2").isNotNull)
      .select(col("id"), col("w").as("w1"), col("w2")))
    val bgCnt = bg.groupBy("w1", "w2").agg(count(lit(1)).cast("double").as("cb"))
    val uniCnt = tok.groupBy(col("w").as("w1"))
      .agg(count(lit(1)).cast("double").as("cu"))
    val vocab = uniCnt.agg(count(lit(1)).cast("double").as("v"))
    bg.join(bgCnt, Seq("w1", "w2")).join(uniCnt, "w1")
      .crossJoin(broadcast(vocab))
      .groupBy("id")
      .agg(round(avg(-log((col("cb") + 1) / (col("cu") + col("v")))), 6)
        .as("bigram_lm_score"))
      .withColumnRenamed("id", idCol)
  }

  /** Collocation extraction (p33) — corpus-level PMI of adjacent token
    * pairs, the multi-word-expression / tokenizer-vocab-candidate
    * primitive: pmi = ln(P(w1,w2) / (P(w1)·P(w2))), bigrams with count
    * >= minCount, top k by pmi rounded to 6dp BEFORE ranking (so the cut
    * is engine-invariant; ties break lexicographically).
    *
    * Scale shape: bigrams are zipped per row (slice + arrays_zip — no
    * self-join, no extra shuffle); uni/bigram counts are partial aggs;
    * the pmi join runs on vocabulary-sized frames; totals ride 1-row
    * broadcasts. Three branches consume the tokenized corpus (unigram
    * counts, bigram counts, the n_big total); `persistTokens = true`
    * caches the token-array frame so the corpus is scanned and tokenized
    * exactly once (TfIdf.scored's explicit-persist pattern) — without it
    * each branch re-reads and re-tokenizes.
    */
  def collocationsPmi(df: DataFrame, textCol: String, minCount: Long = 5,
      k: Int = 50, persistTokens: Boolean = false): DataFrame = {
    val toks0 = df.select(Fns.tokens(col(textCol)).as("tk"))
    val toks = if (persistTokens)
      toks0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else toks0
    val tk = col("tk")
    val uni = toks.select(explode(tk).as("w"))
      .groupBy("w").agg(count(lit(1)).cast("double").as("cw"))
    val nTok = uni.agg(sum("cw").as("n_tok"))
    val big = toks
      .select(explode(arrays_zip(
        slice(tk, lit(1), size(tk) - 1).as("w1"),
        slice(tk, lit(2), size(tk) - 1).as("w2"))).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).cast("double").as("c2"))
      .filter(col("c2") >= minCount)
    val nBig = toks.select(
      sum(greatest(size(tk) - 1, lit(0))).cast("double").as("n_big"))
    big
      .join(uni.select(col("w").as("w1"), col("cw").as("c1")), "w1")
      .join(uni.select(col("w").as("w2"), col("cw").as("c2w")), "w2")
      .crossJoin(broadcast(nTok)).crossJoin(broadcast(nBig))
      .select(col("w1"), col("w2"), col("c2").cast("long").as("n_pair"),
        round(log((col("c2") / col("n_big")) /
          ((col("c1") / col("n_tok")) * (col("c2w") / col("n_tok")))), 6)
          .as("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(k)
  }

  /** CCNet's actual quality-filter shape: score EVERY document's
    * cross-entropy under a unigram LM trained on a CURATED REFERENCE
    * slice (Wikipedia-like), not on the corpus itself — low scores read
    * "looks like the reference", high scores read "far from it".
    * Add-one smoothing over (reference vocab + UNK) keeps OOV tokens
    * finite: p(w) = (c_ref(w) + 1) / (N_ref + V_ref + 1), unseen w
    * scoring as 1/(N_ref + V_ref + 1).
    *
    * Scale design: the reference count table is vocabulary-sized (LEFT
    * join, so scored tokens missing from it survive as OOV); stopword
    * skew on the token join is the AQE case as in [[unigramLmScore]];
    * the (N, V) totals ride a broadcast 1-row cross join.
    */
  def refLmScore(docs: DataFrame, ref: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val refCnt = ref
      .select(explode(Fns.tokens(col(textCol))).as("t"))
      .groupBy("t").agg(count(lit(1)).cast("double").as("c"))
    val totals = refCnt.agg(sum("c").as("n"),
      count(lit(1)).cast("double").as("v"))
    val tok = docs.select(col(idCol).as("id"),
      explode(Fns.tokens(col(textCol))).as("t"))
    val p = (coalesce(col("c"), lit(0.0)) + 1) / (col("n") + col("v") + 1)
    tok.join(refCnt, Seq("t"), "left_outer")
      .crossJoin(broadcast(totals))
      .groupBy("id")
      .agg(round(avg(-log(p)), 6).as("ref_lm_score"))
      .withColumnRenamed("id", idCol)
  }

  /** Jelinek-Mercer INTERPOLATED bigram LM score — the smoothing real
    * CCNet-family filters actually run (add-one alone over-penalizes
    * plausible-but-unseen bigrams; interpolation backs off smoothly):
    * per doc, the mean over bigram positions of
    *   -ln( λ·P_bg(w|h) + (1−λ)·P_uni(w) )
    * with MLE P_bg = c(h,w)/c(h) from a reference slice (0 when the
    * history is unseen — pure backoff) and add-one-smoothed P_uni =
    * (c(w)+1)/(N+V+1) (p38's family), so OOV stays finite without a
    * bigram-level smoothing term. Docs with < 2 tokens carry no bigrams
    * and are absent from the output.
    *
    * Scale design: count tables are (observed-bigram)- and vocab-sized
    * partial aggs; the three score joins are LEFT joins on gram keys
    * (stopword skew = the AQE case); (N, V) ride a 1-row broadcast; the
    * final per-doc mean is a linear partial agg on id — p42's envelope
    * with one extra vocab-sized join.
    *
    * `persistCounts = true` caches the reference token stream (feeds
    * both the bigram and unigram count branches) and the unigram count
    * table (consumed three times: two score joins + the totals row) —
    * [[bigramLmScore]]'s explicit-persist pattern; without it the
    * reference corpus tokenizes twice and the vocab aggregate runs
    * three times.
    */
  def interpolatedLmScore(docs: DataFrame, ref: DataFrame, idCol: String,
      textCol: String, lambda: Double = 0.7,
      persistCounts: Boolean = false): DataFrame = {
    require(lambda > 0 && lambda < 1, s"lambda must be in (0,1), got $lambda")
    def keep(f: DataFrame) = if (persistCounts)
      f.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK) else f
    val w = org.apache.spark.sql.expressions.Window
    def toks(df: DataFrame, as: String) = df.select(col(idCol).as(as),
      posexplode(Fns.tokens(col(textCol))).as(Seq("pos", "w")))
    def bigrams(tok: DataFrame, idAs: String) = tok
      .withColumn("w2", lead("w", 1).over(
        w.partitionBy(idAs).orderBy("pos")))
      .filter(col("w2").isNotNull)
      .select(col(idAs), col("w").as("w1"), col("w2"))
    val rTok = keep(toks(ref, "rid"))
    val bgCnt = bigrams(rTok, "rid")
      .groupBy("w1", "w2").agg(count(lit(1)).cast("double").as("cb"))
    val uniCnt = keep(rTok.groupBy(col("w").as("w1"))
      .agg(count(lit(1)).cast("double").as("cu")))
    val totals = uniCnt.agg(sum("cu").as("n"),
      count(lit(1)).cast("double").as("v"))
    val dBg = bigrams(toks(docs, "id"), "id")
    val pBg = when(col("cu_h").isNotNull && col("cb").isNotNull,
      col("cb") / col("cu_h")).otherwise(0.0)
    val pUni = (coalesce(col("cu_w"), lit(0.0)) + 1) /
      (col("n") + col("v") + 1)
    dBg
      .join(bgCnt, Seq("w1", "w2"), "left_outer")
      .join(uniCnt.select(col("w1"), col("cu").as("cu_h")),
        Seq("w1"), "left_outer")
      .join(uniCnt.select(col("w1").as("w2"), col("cu").as("cu_w")),
        Seq("w2"), "left_outer")
      .crossJoin(broadcast(totals))
      .groupBy("id")
      .agg(round(avg(-log(lit(lambda) * pBg + lit(1.0 - lambda) * pUni)), 6)
        .as("interp_lm_score"))
      .withColumnRenamed("id", idCol)
  }

  /** WordPiece subword tokenization (p47): one row per (doc, token,
    * piece) via the [[graft.functions.WordPieceRows]] generator — greedy
    * longest-match-first over a plan-literal vocabulary, continuation
    * pieces "##"-prefixed, failed/oversized tokens -> [UNK]. Pure per-row
    * generator: no join, no shuffle; the vocab ships in the task closure
    * (the broadcast-vocab pattern at real BPE sizes).
    */
  def wordpiece(df: DataFrame, idCol: String, textCol: String,
      vocab: Seq[String], maxInputChars: Int = 16): DataFrame =
    df.select(col(idCol),
      Fns.wordpieceRows(Fns.tokens(col(textCol)), vocab, maxInputChars))

  /** [[wordpiece]] with the vocabulary shipped as a Spark BROADCAST
    * instead of a plan literal — the transport for realistic BPE vocabs
    * (30k pieces ≈ 300 KB): the literal form serializes the whole vocab
    * into every task closure of every stage that plans the expression,
    * while the broadcast moves it once per executor and tasks share the
    * deserialized hash set. Output rows are bit-identical to [[wordpiece]]
    * (WordPieceSpec pins parity on a 30k vocab) and the plan is the same
    * exchange-free per-row generator.
    */
  def wordpieceBroadcast(df: DataFrame, idCol: String, textCol: String,
      vocab: Seq[String], maxInputChars: Int = 16): DataFrame =
    df.select(col(idCol),
      Fns.wordpieceRowsBroadcast(df.sparkSession,
        Fns.tokens(col(textCol)), vocab, maxInputChars))

  /** CORPUS-level distinct-n diversity (Li et al. 2016's distinct-1/2/3,
    * the synthetic-data mode-collapse detector) per slice: for each
    * (slice, n) the total number of stride-1 n-gram OCCURRENCES, the
    * number of DISTINCT n-grams across the whole slice, and their ratio.
    * Complements the per-document diversity family — p32's entropy and
    * p18's within-doc repetition see one document at a time and cannot
    * distinguish "every doc is internally varied" from "every doc is the
    * same varied doc"; a slice whose distinct-2 craters is templated or
    * model-generated even when each member looks fine alone.
    *
    * Scale design: occurrence totals need no gram materialization at all
    * (len−n+1 summed per row — a metadata-cheap partial agg); only the
    * DISTINCT side ships grams, and those feed straight into a
    * per-(slice, gram) distinct partial agg (map-side combine collapses
    * every within-partition repeat, the wordcount shape). One pass per
    * width; widths are a 3-element literal family, so the union is 3
    * scans of a 2-column projection — no joins, no windows.
    */
  def distinctNgramDiversity(df: DataFrame, sliceCol: String,
      textCol: String, ns: Seq[Int] = Seq(1, 2, 3)): DataFrame = {
    require(ns.nonEmpty && ns.forall(_ >= 1), s"bad widths $ns")
    val perN = ns.map { n =>
      val tk = Fns.tokens(col(textCol))
      val grams = transform(
        sequence(lit(0), size(tk) - lit(n)),
        i => array_join(slice(tk, i + lit(1), lit(n)), " "))
      val base = df.select(col(sliceCol).as("slice"),
        when(size(tk) >= n, grams)
          .otherwise(array().cast("array<string>")).as("g"))
      val totals = base.groupBy("slice")
        .agg(sum(size(col("g"))).as("n_grams"))
      val distincts = base.select(col("slice"), explode(col("g")).as("gram"))
        .distinct()
        .groupBy("slice").agg(count(lit(1)).as("n_distinct"))
      totals.join(distincts, Seq("slice"), "left")
        .select(col("slice"), lit(n).as("n"), col("n_grams"),
          coalesce(col("n_distinct"), lit(0L)).as("n_distinct"))
    }
    perN.reduce(_ unionByName _)
      .withColumn("distinct_ratio",
        when(col("n_grams") > 0,
          round(col("n_distinct").cast("double") / col("n_grams"), 6))
          .otherwise(lit(null)))
  }
}

package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII handling for training corpora: masking, deterministic
  * pseudonymization, and numeric generalization (the k-anonymity-style
  * coarsening step). All built-in codegen'd expressions — per-row, no
  * shuffle, no UDFs — so the scrub pass fuses into the corpus scan.
  *
  * Deterministic pseudonyms (salted hash rather than random ids) are the
  * standard choice for training pipelines: the same entity maps to the
  * same token across shards and reruns without any coordination state.
  */
object Anonymize {

  /** Replace every digit with `mask` (account/phone-number shaped PII). */
  def maskDigits(c: Column, mask: String = "#"): Column =
    regexp_replace(c, "[0-9]", mask)

  /** Salted SHA-256 pseudonym, lowercase hex. The salt blocks trivial
    * dictionary reversal of low-entropy identifiers.
    */
  def pseudonym(c: Column, salt: String): Column =
    sha2(concat(lit(salt), c), 256)

  /** Generalize a numeric to the floor of its `width`-sized bucket. */
  def generalize(c: Column, width: Long): Column =
    (floor(c / width.toDouble) * width).cast("long")

  // --- structured-PII detection + scrubbing (round 9) ---
  // Patterns are deliberately lookaround-free so the SAME source text
  // matches identically under Java regex (Spark) and RE2 (DuckDB, the
  // oracle) — the p74 parity contract. Detection counts run on the
  // ORIGINAL text; the scrub replaces in a fixed class order.

  /** RFC-shaped email addresses. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4 literals. */
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Standalone long digit runs (account / ticket / SSN-shaped ids). */
  val IdNumRe = "\\b\\d{6,}\\b"

  /** Occurrences of `re` in `c` — codegen'd regexp_count, no UDF. */
  def countPattern(c: Column, re: String): Column =
    regexp_count(c, lit(re))

  /** All three PII classes replaced by typed placeholders, email →
    * ip → id order (an email's local part can contain digit runs; the
    * earlier classes' placeholders contain no digits, so later passes
    * never re-match inside them).
    */
  def scrubPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, lit(EmailRe), lit("[EMAIL]")),
        lit(Ipv4Re), lit("[IP]")),
      lit(IdNumRe), lit("[ID]"))

  /** Per-doc PII audit + scrub in ONE text pass: (id, n_email, n_ip,
    * n_idnum, clean_text). Counts are measured on the original text;
    * `clean_text` is [[scrubPii]]'s output. Pure per-row expressions —
    * the pass fuses into the corpus scan, no shuffle, no UDF.
    */
  def piiReport(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame =
    docs.select(col(idCol).cast("long").as("id"),
      countPattern(col(textCol), EmailRe).cast("long").as("n_email"),
      countPattern(col(textCol), Ipv4Re).cast("long").as("n_ip"),
      countPattern(col(textCol), IdNumRe).cast("long").as("n_idnum"),
      scrubPii(col(textCol)).as("clean_text"))

  // --- k-anonymity (round 10): the GROUP-level privacy check the
  // row-level tools above cannot make — scrubbed text is still
  // re-identifiable when its quasi-identifier combination is rare.

  /** Per-quasi-identifier-group audit: (quasi..., n, compliant) where
    * compliant = the group reaches size `k` — Sweeney's k-anonymity
    * criterion. One hash partial agg over the quasi projection; group
    * cardinality is the product of quasi-column cardinalities, not the
    * corpus.
    */
  def kAnonymityReport(df: org.apache.spark.sql.DataFrame,
      quasi: Seq[String], k: Long): org.apache.spark.sql.DataFrame = {
    require(quasi.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 1, s"k must be >= 1, got $k")
    df.groupBy(quasi.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("compliant", col("n") >= k)
  }

  /** Enforcement by SUPPRESSION (the standard release model): rows in
    * groups below `k` are dropped, so every surviving quasi combination
    * is shared by >= k released rows. The group sizes re-enter as a
    * broadcast-or-shuffle join on the quasi key — no window, and the
    * released table provably satisfies [[kAnonymityReport]]. Pair with
    * [[generalize]] on the quasi columns first when suppression cost is
    * too high: wider buckets are monotonically easier to release
    * (spec-pinned).
    */
  def suppressSmallGroups(df: org.apache.spark.sql.DataFrame,
      quasi: Seq[String], k: Long): org.apache.spark.sql.DataFrame = {
    // null-safe (<=>) semi join: kAnonymityReport's groupBy puts all
    // NULL quasi values in one group, so enforcement must match it —
    // a plain equality join would silently suppress every NULL-quasi
    // row even when its group is compliant (report and release would
    // disagree). Renamed right side keeps the self-join unambiguous.
    val ok = kAnonymityReport(df, quasi, k)
      .filter(col("compliant"))
      .select(quasi.map(c => col(c).as(s"__ok_$c")): _*)
    df.join(ok,
      quasi.map(c => col(c) <=> col(s"__ok_$c")).reduce(_ && _),
      "left_semi")
  }
}

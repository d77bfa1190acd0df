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
}

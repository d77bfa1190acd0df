package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** WordPiece subword tokenization as a GENERATOR: one (tok_idx, piece_idx,
  * piece) row per emitted subword — the tokenizer-shape operator of a
  * training pipeline (greedy longest-match-first over a fixed vocabulary,
  * continuation pieces prefixed "##", whole token -> [UNK] when any
  * position fails to match or the token exceeds `maxInputChars`; the
  * HuggingFace WordPiece contract).
  *
  * Scale: the vocabulary rides in the expression as a plan literal (the
  * broadcast-vocab pattern — every task gets the same hash set, no join,
  * no shuffle; a real 30k-entry BPE vocab is ~300 KB, well inside task
  * closure budget), and tokenization is a pure per-row generator that
  * fuses into whatever stage scans the text — the plan has no exchange
  * (WordPieceSpec pins this). Matching cost is bounded by
  * `longest-vocab-entry` probes per consumed character.
  */
case class WordPieceRows(child: Expression, vocab: Seq[String],
    maxInputChars: Int) extends UnaryExpression with Generator
    with CodegenFallback {
  require(vocab.nonEmpty, "vocab must be non-empty")
  require(maxInputChars >= 1, "maxInputChars must be >= 1")
  // a piece with an empty body would match without consuming input —
  // an infinite loop, so reject it at construction
  require(vocab.forall(v => v.nonEmpty && !(v.startsWith("##") && v.length == 2)),
    "vocab entries must have non-empty bodies")

  override def prettyName: String = "wordpiece_rows"

  override def elementSchema: StructType = StructType(Seq(
    StructField("tok_idx", IntegerType, nullable = false),
    StructField("piece_idx", IntegerType, nullable = false),
    StructField("piece", StringType, nullable = false)))

  @transient private lazy val vocabSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](vocab.size * 2)
    vocab.foreach(s.add)
    s
  }
  @transient private lazy val maxBody: Int =
    vocab.map(v => if (v.startsWith("##")) v.length - 2 else v.length).max

  private val Unk = "[UNK]"

  /** Greedy longest-match pieces of one token; Seq(\[UNK\]) on failure,
    * Nil for the empty token.
    */
  private[graft] def tokenize(token: String): Seq[String] = {
    if (token.isEmpty) return Nil
    if (token.length > maxInputChars) return Seq(Unk)
    val pieces = List.newBuilder[String]
    var pos = 0
    while (pos < token.length) {
      var end = math.min(token.length, pos + maxBody)
      var found: String = null
      while (found == null && end > pos) {
        val cand =
          if (pos == 0) token.substring(pos, end)
          else "##" + token.substring(pos, end)
        if (vocabSet.contains(cand)) found = cand else end -= 1
      }
      if (found == null) return Seq(Unk)
      pieces += found
      pos = end
    }
    pieces.result()
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Nil
    val arr = v.asInstanceOf[ArrayData]
    val out = Seq.newBuilder[InternalRow]
    var ti = 0
    while (ti < arr.numElements()) {
      val token = arr.getUTF8String(ti).toString
      var pi = 0
      tokenize(token).foreach { p =>
        out += InternalRow(ti, pi, UTF8String.fromString(p))
        pi += 1
      }
      ti += 1
    }
    out.result()
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

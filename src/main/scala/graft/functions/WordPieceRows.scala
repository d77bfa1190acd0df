package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** The WordPiece greedy longest-match-first matcher, shared by the
  * plan-literal ([[WordPieceRows]]) and broadcast-vocab
  * ([[WordPieceRowsBc]]) generators — one algorithm, two vocabulary
  * transports, bit-identical output (WordPieceSpec pins the parity).
  */
private[functions] object WordPieceCore {
  val Unk = "[UNK]"

  val elementSchema: StructType = StructType(Seq(
    StructField("tok_idx", IntegerType, nullable = false),
    StructField("piece_idx", IntegerType, nullable = false),
    StructField("piece", StringType, nullable = false)))

  def requireValid(vocab: Iterable[String], maxInputChars: Int): Unit = {
    require(vocab.nonEmpty, "vocab must be non-empty")
    require(maxInputChars >= 1, "maxInputChars must be >= 1")
    // a piece with an empty body would match without consuming input —
    // an infinite loop, so reject it at construction
    require(vocab.forall(v =>
      v.nonEmpty && !(v.startsWith("##") && v.length == 2)),
      "vocab entries must have non-empty bodies")
  }

  def toSet(vocab: Iterable[String]): java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](vocab.size * 2)
    vocab.foreach(s.add)
    s
  }

  def maxBody(vocab: Iterable[String]): Int =
    vocab.map(v => if (v.startsWith("##")) v.length - 2 else v.length).max

  /** Greedy longest-match pieces of one token; Seq(\[UNK\]) on failure,
    * Nil for the empty token.
    */
  def tokenize(token: String, vocabSet: java.util.HashSet[String],
      maxBody: Int, maxInputChars: Int): Seq[String] = {
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

  def rows(arr: ArrayData, vocabSet: java.util.HashSet[String],
      maxBody: Int, maxInputChars: Int): IterableOnce[InternalRow] = {
    val out = Seq.newBuilder[InternalRow]
    var ti = 0
    while (ti < arr.numElements()) {
      val token = arr.getUTF8String(ti).toString
      var pi = 0
      tokenize(token, vocabSet, maxBody, maxInputChars).foreach { p =>
        out += InternalRow(ti, pi, UTF8String.fromString(p))
        pi += 1
      }
      ti += 1
    }
    out.result()
  }
}

/** WordPiece subword tokenization as a GENERATOR: one (tok_idx, piece_idx,
  * piece) row per emitted subword — the tokenizer-shape operator of a
  * training pipeline (greedy longest-match-first over a fixed vocabulary,
  * continuation pieces prefixed "##", whole token -> [UNK] when any
  * position fails to match or the token exceeds `maxInputChars`; the
  * HuggingFace WordPiece contract).
  *
  * Scale: the vocabulary rides in the expression as a plan literal —
  * every task gets the same hash set, no join, no shuffle — and
  * tokenization is a pure per-row generator that fuses into whatever
  * stage scans the text; the plan has no exchange (WordPieceSpec pins
  * this). The literal serializes into EVERY task closure, which is fine
  * for test/demo vocabs; at real BPE sizes (30k pieces ≈ 300 KB × every
  * task × every stage retry) use [[WordPieceRowsBc]], which ships the
  * vocab once per EXECUTOR as a Spark broadcast instead. Matching cost
  * is bounded by `longest-vocab-entry` probes per consumed character.
  */
case class WordPieceRows(child: Expression, vocab: Seq[String],
    maxInputChars: Int) extends UnaryExpression with Generator
    with RowsGen {
  WordPieceCore.requireValid(vocab, maxInputChars)

  override def prettyName: String = "wordpiece_rows"

  override def elementSchema: StructType = WordPieceCore.elementSchema

  @transient private lazy val vocabSet = WordPieceCore.toSet(vocab)
  @transient private lazy val maxBody = WordPieceCore.maxBody(vocab)

  private[graft] def tokenize(token: String): Seq[String] =
    WordPieceCore.tokenize(token, vocabSet, maxBody, maxInputChars)

  override def rowsOf(v: ArrayData): IterableOnce[InternalRow] =
    if (v == null) Nil
    else WordPieceCore.rows(v, vocabSet, maxBody, maxInputChars)

  override def eval(input: InternalRow): IterableOnce[InternalRow] =
    rowsOf(child.eval(input).asInstanceOf[ArrayData])

  // round-19: real doGenCode instead of CodegenFallback (see RowsGen)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    RowsGen.genCode(ctx, ev, child, this, "wordPieceRows")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** [[WordPieceRows]] with the vocabulary carried as a Spark BROADCAST
  * variable instead of a plan literal — the realistic-vocab transport:
  * the expression serializes only the broadcast HANDLE (bytes, not the
  * vocab), executors fetch the block once and every task on the executor
  * shares the one deserialized hash set. Same matcher, same output rows
  * ([[WordPieceCore]]); the plan stays a pure per-row generator with no
  * join and no exchange.
  *
  * Validation of the vocab happens at the FIRST use on each executor
  * (the handle is opaque until .value), so construct the broadcast from
  * a vocab validated driver-side via [[graft.functions.Fns.wordpieceRowsBroadcast]].
  */
case class WordPieceRowsBc(child: Expression,
    bcVocab: org.apache.spark.broadcast.Broadcast[Array[String]],
    maxInputChars: Int) extends UnaryExpression with Generator
    with RowsGen {
  require(maxInputChars >= 1, "maxInputChars >= 1")

  override def prettyName: String = "wordpiece_rows_bc"

  override def elementSchema: StructType = WordPieceCore.elementSchema

  @transient private lazy val vocabSet = WordPieceCore.toSet(bcVocab.value)
  @transient private lazy val maxBody = WordPieceCore.maxBody(bcVocab.value)

  override def rowsOf(v: ArrayData): IterableOnce[InternalRow] =
    if (v == null) Nil
    else WordPieceCore.rows(v, vocabSet, maxBody, maxInputChars)

  override def eval(input: InternalRow): IterableOnce[InternalRow] =
    rowsOf(child.eval(input).asInstanceOf[ArrayData])

  // round-19: real doGenCode instead of CodegenFallback (see RowsGen)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    RowsGen.genCode(ctx, ev, child, this, "wordPieceRowsBc")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

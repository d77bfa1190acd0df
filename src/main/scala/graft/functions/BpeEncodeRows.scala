package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** BPE ENCODING core, shared by the plan-literal ([[BpeEncodeRows]])
  * and broadcast ([[BpeEncodeRowsBc]]) transports — the inference twin
  * of [[graft.operators.BpeTrainer]]: split each token into characters
  * and apply the learned merge table.
  *
  * Semantics: SEQUENTIAL in rank order — "we apply the learned
  * operations in the order they were learned" (Sennrich et al. 2016),
  * each applied as the same whole-token left-to-right non-overlapping
  * fold the trainer uses, so encoding the training corpus reproduces
  * the trainer's final state EXACTLY (spec-pinned against
  * `subwordVocab`), and an SQL oracle can unroll the identical folds.
  * (A later merge CAN form a pair whose rank already passed — e.g.
  * when two different merges share an output string; sequential
  * semantics BY DEFINITION never revisits it, which is exactly what
  * the candidate floor below encodes. The priority-queue
  * lowest-rank-first formulation some libraries use WOULD apply it —
  * the two differ only in that corner, and the fuzz spec pins this
  * implementation to the sequential reference.) The efficient form:
  * a word's applicable ranks sit in a sorted set, each applied merge
  * costs O(len) to fold and O(adjacent) map probes for newly-formed
  * pairs, and pairs whose rank is at or below the cursor are not
  * re-admitted — O(applied · len · log) per word, NOT O(numMerges)
  * per word, so a 30k-merge table costs only the merges that
  * actually fire.
  */
private[functions] object BpeEncodeCore {

  val elementSchema: StructType = StructType(Seq(
    StructField("tok_idx", IntegerType, nullable = false),
    StructField("piece_idx", IntegerType, nullable = false),
    StructField("piece", StringType, nullable = false)))

  def requireValid(merges: Seq[(String, String)]): Unit = {
    require(merges.forall { case (l, r) => l.nonEmpty && r.nonEmpty },
      "merge sides must be non-empty")
    require(merges.distinct.length == merges.length,
      "duplicate merge pair — a pair can be learned once")
  }

  /** (lhs, rhs) -> 1-based rank (= learn order). */
  def toRankMap(merges: Seq[(String, String)])
      : java.util.HashMap[(String, String), Int] = {
    val m = new java.util.HashMap[(String, String), Int](merges.size * 2)
    merges.zipWithIndex.foreach { case (p, i) => m.put(p, i + 1) }
    m
  }

  /** Encode one token: characters, then the learned merges in rank
    * order, each as the trainer's left-to-right non-overlapping fold.
    * `byRank(r - 1)` must be the pair of rank r (the forward map's
    * inverse, built once per expression, O(1) per applied merge).
    */
  def encode(token: String,
      ranks: java.util.HashMap[(String, String), Int],
      byRank: Array[(String, String)]): Seq[String] = {
    if (token.isEmpty) return Nil
    var ts: Vector[String] = token.map(_.toString).toVector
    if (ts.length < 2 || ranks.isEmpty) return ts
    // sorted candidate ranks currently applicable somewhere in the word
    val cand = new java.util.TreeSet[Integer]()
    def addPair(a: String, b: String, floor: Int): Unit = {
      val r = ranks.get((a, b))
      if (r != null && r >= floor) { cand.add(r); () }
    }
    ts.zip(ts.tail).foreach { case (a, b) => addPair(a, b, 1) }
    var cursor = 1
    while (!cand.isEmpty) {
      val r = cand.pollFirst().intValue()
      if (r >= cursor) {
        cursor = r
        val (l, rr) = byRank(r - 1)
        // the trainer's fold: left-to-right, whole-token compare,
        // non-overlapping (an output never chains into the same round)
        val folded = Vector.newBuilder[String]
        var i = 0
        var acc = Vector.empty[String]
        while (i < ts.length) {
          val x = ts(i)
          if (acc.nonEmpty && acc.last == l && x == rr)
            acc = acc.init :+ (acc.last + x)
          else acc = acc :+ x
          i += 1
        }
        folded ++= acc
        val next = folded.result()
        if (next.length != ts.length) {
          ts = next
          if (ts.length < 2) return ts
          // newly adjacent pairs may enable LATER ranks only — ranks
          // below the cursor were already passed by the sequential
          // order and are never revisited
          ts.zip(ts.tail).foreach { case (a, b) => addPair(a, b, cursor + 1) }
        }
      }
    }
    ts
  }

  /** Scalar transport: all pieces of every token, concatenated in token
    * order — the flattened [[rows]] stream as one array.
    */
  def encodeAll(arr: ArrayData,
      ranks: java.util.HashMap[(String, String), Int],
      byRank: Array[(String, String)]): ArrayData = {
    val out = Seq.newBuilder[UTF8String]
    var ti = 0
    while (ti < arr.numElements()) {
      encode(arr.getUTF8String(ti).toString, ranks, byRank)
        .foreach(p => out += UTF8String.fromString(p))
      ti += 1
    }
    ArrayData.toArrayData(out.result().toArray)
  }

  def rows(arr: ArrayData,
      ranks: java.util.HashMap[(String, String), Int],
      byRank: Array[(String, String)]): IterableOnce[InternalRow] = {
    val out = Seq.newBuilder[InternalRow]
    var ti = 0
    while (ti < arr.numElements()) {
      val token = arr.getUTF8String(ti).toString
      var pi = 0
      encode(token, ranks, byRank).foreach { p =>
        out += InternalRow(ti, pi, UTF8String.fromString(p))
        pi += 1
      }
      ti += 1
    }
    out.result()
  }
}

/** BPE encoding as a GENERATOR: one (tok_idx, piece_idx, piece) row per
  * emitted subword of each input token — [[WordPieceRows]]'s shape with
  * the merge-table algorithm instead of longest-match. The merge table
  * rides as a plan literal (fine for test/demo sizes; at real 30k-merge
  * sizes use [[BpeEncodeRowsBc]]); encoding is a pure per-row generator
  * that fuses into whatever stage scans the text — no join, no shuffle,
  * no exchange anywhere (spec-pinned).
  */
case class BpeEncodeRows(child: Expression,
    merges: Seq[(String, String)]) extends UnaryExpression with Generator
    with RowsGen {
  BpeEncodeCore.requireValid(merges)

  override def prettyName: String = "bpe_encode_rows"

  override def elementSchema: StructType = BpeEncodeCore.elementSchema

  @transient private lazy val ranks = BpeEncodeCore.toRankMap(merges)
  @transient private lazy val byRank = merges.toArray

  private[graft] def encode(token: String): Seq[String] =
    BpeEncodeCore.encode(token, ranks, byRank)

  /** Shared by the interpreted eval and the generated code. */
  override def rowsOf(v: ArrayData): IterableOnce[InternalRow] =
    if (v == null) Nil else BpeEncodeCore.rows(v, ranks, byRank)

  override def eval(input: InternalRow): IterableOnce[InternalRow] =
    rowsOf(child.eval(input).asInstanceOf[ArrayData])

  // round-19: real doGenCode instead of CodegenFallback — GenerateExec
  // codegens IterableOnce generators (see ShingleRows for the rationale)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    RowsGen.genCode(ctx, ev, child, this, "bpeEncodeRows")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** [[BpeEncodeRows]] with the merge table carried as a Spark BROADCAST
  * ([[WordPieceRowsBc]]'s transport): the expression serializes only
  * the handle, executors fetch the table once and all tasks share one
  * deserialized rank map. Validate the merges driver-side before
  * broadcasting ([[graft.functions.Fns.bpeEncodeRowsBroadcast]]).
  */
case class BpeEncodeRowsBc(child: Expression,
    bcMerges: org.apache.spark.broadcast.Broadcast[Array[(String, String)]])
    extends UnaryExpression with Generator with RowsGen {

  override def prettyName: String = "bpe_encode_rows_bc"

  override def elementSchema: StructType = BpeEncodeCore.elementSchema

  @transient private lazy val ranks =
    BpeEncodeCore.toRankMap(bcMerges.value.toSeq)

  override def rowsOf(v: ArrayData): IterableOnce[InternalRow] =
    if (v == null) Nil else BpeEncodeCore.rows(v, ranks, bcMerges.value)

  override def eval(input: InternalRow): IterableOnce[InternalRow] =
    rowsOf(child.eval(input).asInstanceOf[ArrayData])

  // round-19: real doGenCode instead of CodegenFallback (see RowsGen)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    RowsGen.genCode(ctx, ev, child, this, "bpeEncodeRowsBc")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** BPE encoding as a SCALAR: the whole document's pieces as ONE
  * array<string> (tokens encoded independently, outputs concatenated in
  * token order — exactly the row stream [[BpeEncodeRows]] emits,
  * flattened). This is the transport for AGGREGATE consumers (piece
  * counts, distinct-piece counts, fertility): a per-row array bounded
  * by the document's own length, consumed by codegen collection
  * functions (size / array_distinct), so the count NEVER becomes rows —
  * p73/p89 aggregate O(docs) rows instead of shuffling O(corpus tokens)
  * piece rows through a groupBy. Use the generator when downstream
  * genuinely needs per-piece rows (indexing, joins); use this when it
  * needs per-document numbers.
  */
case class BpeEncodeArray(child: Expression,
    merges: Seq[(String, String)]) extends UnaryExpression {
  BpeEncodeCore.requireValid(merges)

  override def prettyName: String = "bpe_encode_array"

  override def dataType: org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)

  @transient private lazy val ranks = BpeEncodeCore.toRankMap(merges)
  @transient private lazy val byRank = merges.toArray

  /** Shared by the interpreted eval and the generated code. */
  def encodeAll(arr: ArrayData): ArrayData =
    BpeEncodeCore.encodeAll(arr, ranks, byRank)

  override def nullSafeEval(v: Any): Any =
    encodeAll(v.asInstanceOf[ArrayData])

  // round-19: real doGenCode instead of CodegenFallback — the fallback
  // forced the enclosing projection out of whole-stage codegen (the
  // MinHashSigs round-18 finding); the rank map rides in the plan
  // reference array, deserialized once per task
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeEncodeArray", this,
      classOf[BpeEncodeArray].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.encodeAll($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** [[BpeEncodeArray]] with the merge table carried as a Spark BROADCAST
  * ([[BpeEncodeRowsBc]]'s transport): the expression serializes only the
  * handle, executors fetch the table once and all tasks share one
  * deserialized rank map — the form for realistic (30k-merge) tables.
  * Validate the merges driver-side before broadcasting
  * ([[graft.functions.Fns.bpeEncodeArrayBroadcast]]).
  */
case class BpeEncodeArrayBc(child: Expression,
    bcMerges: org.apache.spark.broadcast.Broadcast[Array[(String, String)]])
    extends UnaryExpression {

  override def prettyName: String = "bpe_encode_array_bc"

  override def dataType: org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)

  @transient private lazy val ranks =
    BpeEncodeCore.toRankMap(bcMerges.value.toSeq)

  /** Shared by the interpreted eval and the generated code. */
  def encodeAll(arr: ArrayData): ArrayData =
    BpeEncodeCore.encodeAll(arr, ranks, bcMerges.value)

  override def nullSafeEval(v: Any): Any =
    encodeAll(v.asInstanceOf[ArrayData])

  // round-19: real doGenCode instead of CodegenFallback (see
  // BpeEncodeArray; the broadcast handle rides in the reference array)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeEncodeArrayBc", this,
      classOf[BpeEncodeArrayBc].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.encodeAll($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{BpeEncodeRows, Fns}
import graft.operators.BpeTrainer
import scala.util.Random

/** BPE encoding (p73): training-corpus round-trip (encode == trainer's
  * final state), sequential-reference fuzz for the rank-cursor
  * optimization, literal/broadcast transport parity, edge tokens, and
  * the exchange-free plan.
  */
class BpeEncodeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def learned(texts: Seq[String], n: Int): Seq[(String, String)] =
    BpeTrainer.learnMerges(texts.toDF("text"), "text", n)
      .orderBy("merge_rank").select("lhs", "rhs")
      .as[(String, String)].collect().toSeq

  /** The definitionally-sequential reference: apply EVERY rank's fold in
    * learn order, no candidate-set shortcuts.
    */
  private def sequentialRef(token: String,
      merges: Seq[(String, String)]): Seq[String] = {
    var ts = token.map(_.toString).toVector
    merges.foreach { case (l, r) =>
      ts = ts.foldLeft(Vector.empty[String]) { (acc, x) =>
        if (acc.nonEmpty && acc.last == l && x == r)
          acc.init :+ (acc.last + x)
        else acc :+ x
      }
    }
    ts
  }

  test("encoding the training corpus reproduces the trainer's final state") {
    val texts = Seq("low low lower", "low lower lowest", "newest widest")
    val merges = learned(texts, 6)
    val vocab = BpeTrainer.subwordVocab(texts.toDF("text"), "text", 6)
      .as[(String, Long)].collect().toMap
    val encoded = texts.toDF("text")
      .select(Fns.bpeEncodeRows(Fns.tokens(col("text")), merges))
      .groupBy("piece").agg(count(lit(1)).as("freq"))
      .as[(String, Long)].collect().toMap
    assert(encoded == vocab,
      s"encode(train corpus) must equal subwordVocab\n$encoded\nvs\n$vocab")
  }

  test("rank-cursor encode matches the plain sequential reference on random corpora") {
    val rnd = new Random(90210L)
    for (trial <- 1 to 5) {
      val alphabet = "abc"
      val texts = (0 until 5).map { _ =>
        Seq.fill(6 + rnd.nextInt(8))(
          Seq.fill(2 + rnd.nextInt(6))(
            alphabet(rnd.nextInt(alphabet.length))).mkString).mkString(" ")
      }
      val merges = learned(texts, 8)
      val expr = BpeEncodeRows(
        org.apache.spark.sql.catalyst.expressions.Literal("x"), merges)
      // fresh words INCLUDING ones never seen in training
      val probes = texts.flatMap(_.split(" ")) ++
        Seq.fill(20)(Seq.fill(1 + rnd.nextInt(9))(
          alphabet(rnd.nextInt(alphabet.length))).mkString)
      probes.foreach { w =>
        assert(expr.encode(w) == sequentialRef(w, merges),
          s"trial $trial word '$w' merges $merges")
      }
    }
  }

  test("literal and broadcast transports emit identical rows") {
    val texts = Seq("abab abab banana", "ban ana nab")
    val merges = learned(texts, 5)
    val df = texts.toDF("text")
    def rows(c: org.apache.spark.sql.Column) = df
      .select(Fns.tokens(col("text")).as("ts"))
      .select(c)
      .as[(Int, Int, String)].collect().toSeq
    val lit = rows(Fns.bpeEncodeRows(col("ts"), merges))
    val bc = rows(Fns.bpeEncodeRowsBroadcast(spark, col("ts"), merges))
    assert(lit == bc && lit.nonEmpty)
  }

  test("edge tokens: unknown characters pass through as singletons; empty emits nothing") {
    val merges = Seq(("a", "b"))
    val expr = BpeEncodeRows(
      org.apache.spark.sql.catalyst.expressions.Literal("x"), merges)
    assert(expr.encode("zq") == Seq("z", "q"))
    assert(expr.encode("ab") == Seq("ab"))
    assert(expr.encode("aab") == Seq("a", "ab"))
    assert(expr.encode("") == Nil)
    assert(expr.encode("a") == Seq("a"))
  }

  test("merge interaction: a later rank consumes an earlier rank's output") {
    // (a,b) then (ab,ab): "abab" -> [ab, ab] -> [abab]
    val expr = BpeEncodeRows(
      org.apache.spark.sql.catalyst.expressions.Literal("x"),
      Seq(("a", "b"), ("ab", "ab")))
    assert(expr.encode("abab") == Seq("abab"))
    // non-overlap inside one rank: "aaa" under (a,a) -> [aa, a]
    val e2 = BpeEncodeRows(
      org.apache.spark.sql.catalyst.expressions.Literal("x"),
      Seq(("a", "a")))
    assert(e2.encode("aaa") == Seq("aa", "a"))
  }

  test("the encode projection plans with zero exchanges") {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val plan = docs
      .select(Fns.bpeEncodeRows(Fns.tokens(col("text")),
        Seq(("a", "b"), ("c", "d"))))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"per-row generator must not shuffle:\n$plan")
  }

  test("invalid merge tables are rejected") {
    intercept[IllegalArgumentException] {
      BpeEncodeRows(org.apache.spark.sql.catalyst.expressions.Literal("x"),
        Seq(("", "b")))
    }
    intercept[IllegalArgumentException] {
      BpeEncodeRows(org.apache.spark.sql.catalyst.expressions.Literal("x"),
        Seq(("a", "b"), ("a", "b")))
    }
    intercept[IllegalArgumentException] {
      graft.functions.BpeEncodeArray(
        org.apache.spark.sql.catalyst.expressions.Literal("x"),
        Seq(("a", "b"), ("a", "b")))
    }
  }

  test("scalar array transport equals the generator's flattened stream on real docs") {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val merges = BpeTrainer.learnMerges(docs, "text", 8)
      .orderBy("merge_rank").select("lhs", "rhs")
      .as[(String, String)].collect().toSeq
    val tk = Fns.tokens(col("text"))
    // the generator's piece stream per doc, in (tok_idx, piece_idx) order
    val viaRows = docs
      .select(col("doc_id"), Fns.bpeEncodeRows(tk, merges))
      .groupBy("doc_id")
      .agg(collect_list(struct(col("tok_idx"), col("piece_idx"),
        col("piece"))).as("ps"))
      .select(col("doc_id"), transform(array_sort(col("ps")),
        p => p.getField("piece")).as("pieces"))
      .as[(Long, Seq[String])].collect().toMap
    val viaArray = docs
      .select(col("doc_id"), Fns.bpeEncodeArray(tk, merges).as("pieces"))
      .as[(Long, Seq[String])].collect().toMap
    assert(viaArray == viaRows && viaArray.nonEmpty)
    // the broadcast transport emits the identical arrays
    val viaArrayBc = docs
      .select(col("doc_id"),
        Fns.bpeEncodeArrayBroadcast(spark, tk, merges).as("pieces"))
      .as[(Long, Seq[String])].collect().toMap
    assert(viaArrayBc == viaArray)
    // null input follows the scalar convention (null, not empty)
    val nullRow = Seq((1L, null: String)).toDF("id", "text")
      .select(Fns.bpeEncodeArray(Fns.tokens(col("text")), merges))
      .collect().head
    assert(nullRow.isNullAt(0))
  }

  test("p73/p89 shape: per-doc piece numbers plan with no Generate and no piece-row shuffle") {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val merges = Seq(("a", "b"), ("c", "d"))
    // p73's projection: the only exchange in the whole query is the
    // final orderBy's O(docs) range partition — assert the per-doc
    // numbers themselves plan with ZERO exchanges and no generator
    val perDoc = docs.select(col("doc_id"),
      size(Fns.bpeEncodeArray(Fns.tokens(col("text")), merges))
        .as("n_pieces"))
    val plan = perDoc.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Generate"),
      s"per-doc piece counts must be a pure projection:\n$plan")
    // p89's report: one slice-keyed aggregate exchange, nothing
    // corpus-token-sized — and no Generate node anywhere
    val report = graft.operators.TokenizerEval.fertilityReport(
      docs, "text", "lang", merges)
    val rPlan = report.queryExecution.executedPlan.toString
    assert(!rPlan.contains("Generate"),
      s"fertility must not explode piece rows:\n$rPlan")
    assert(rPlan.split("Exchange").length - 1 == 1,
      s"expected exactly the slice aggregate's exchange:\n$rPlan")
  }
}

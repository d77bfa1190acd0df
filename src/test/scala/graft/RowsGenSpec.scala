package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.{GenerateExec, SparkPlan,
  WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Round-19: the row generators (shingles, BPE, WordPiece) carry real
  * `doGenCode` instead of CodegenFallback, so GenerateExec runs INSIDE
  * whole-stage codegen (its codeGenIterableOnce path). These tests pin
  * (a) that the span actually forms over a generate pipeline, and
  * (b) output parity between the codegen'd generator and its scalar
  * array twin — the generated code calls the same rowsOf, but the pin
  * guards the wiring.
  */
class RowsGenSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def finalPlan(p: SparkPlan): SparkPlan = p match {
    case a: AdaptiveSparkPlanExec => a.executedPlan
    case other => other
  }

  private def generateInsideWsc(p: SparkPlan): Boolean =
    finalPlan(p).exists {
      case w: WholeStageCodegenExec => w.exists(_.isInstanceOf[GenerateExec])
      case _ => false
    }

  test("shingle_rows generate runs inside a WholeStageCodegen span") {
    val df = spark.range(200).select(col("id"),
        split(concat_ws(" ", lit("a"), col("id").cast("string"), lit("b c"),
          (col("id") % 7).cast("string")), " ").as("tk"))
      .select(col("id"), graft.functions.Fns.shingleRows(col("tk"), 2).as("sh"))
    df.count() // execute so AQE finalizes the plan
    assert(generateInsideWsc(df.queryExecution.executedPlan),
      s"Generate not in codegen span:\n${df.queryExecution.executedPlan}")
    // parity with explode(shingle_array(...)) — rows AND order
    val viaArray = spark.range(200).select(col("id"),
        split(concat_ws(" ", lit("a"), col("id").cast("string"), lit("b c"),
          (col("id") % 7).cast("string")), " ").as("tk"))
      .select(col("id"),
        explode(graft.functions.Fns.shingles(col("tk"), 2)).as("sh"))
    assert(df.collect().map(_.toString).toSeq ===
      viaArray.collect().map(_.toString).toSeq)
  }

  test("bpe_encode_rows generator matches the scalar array transport") {
    val merges = Seq(("a", "b"), ("ab", "c"))
    val docs = spark.range(100).select(col("id"),
      split(concat_ws(" ", lit("abc"), concat(lit("ab"),
        (col("id") % 3).cast("string")), lit("xyz")), " ").as("tk"))
    val gen = docs.select(col("id"),
      graft.functions.Fns.bpeEncodeRows(col("tk"), merges))
    gen.count()
    assert(generateInsideWsc(gen.queryExecution.executedPlan),
      s"Generate not in codegen span:\n${gen.queryExecution.executedPlan}")
    val flatGen = gen.groupBy("id")
      .agg(collect_list(col("piece")).as("ps"))
    val flatArr = docs.select(col("id"),
      graft.functions.Fns.bpeEncodeArray(col("tk"), merges).as("ps"))
    val joined = flatGen.alias("g").join(flatArr.alias("a"), "id")
      .filter(to_json(col("g.ps")) =!= to_json(col("a.ps")))
    assert(joined.count() === 0)
  }

  test("wordpiece_rows generator emits identical rows through codegen") {
    val vocab = Seq("un", "##aff", "##able", "aff", "[UNK]", "x")
    val docs = spark.range(50).select(col("id"),
      split(lit("unaffable x zz"), " ").as("tk"))
    val gen = docs.select(col("id"),
      graft.functions.Fns.wordpieceRows(col("tk"), vocab, 100))
    gen.count()
    assert(generateInsideWsc(gen.queryExecution.executedPlan),
      s"Generate not in codegen span:\n${gen.queryExecution.executedPlan}")
    val rows = gen.filter(col("id") === 0)
      .select("tok_idx", "piece_idx", "piece").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2))).toSeq
    assert(rows === Seq((0, 0, "un"), (0, 1, "##aff"), (0, 2, "##able"),
      (1, 0, "x"), (2, 0, "[UNK]")))
  }
}

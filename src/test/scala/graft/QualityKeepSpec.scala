package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

/** Quality-aware canonical keep (p90): the component argmax over
  * explicit near-dup edges — chained components keep one best member,
  * quality ties break low-id, singletons keep themselves.
  */
class QualityKeepSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("each component keeps its quality argmax; ties low-id; singletons keep themselves") {
    // component {1,2,3} via CHAIN 1-2, 2-3 (closure, not direct pairs);
    // component {10,11} with a quality tie; 20 is a singleton
    val docs = Seq(
      (1L, 0.1), (2L, 0.9), (3L, 0.5),
      (10L, 0.7), (11L, 0.7),
      (20L, 0.2))
      .toDF("doc_id", "q")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val got = Dedup.qualityCanonicalKeep(docs, "doc_id", pairs, col("q"))
      .orderBy("group_id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 3L, 2L, 0.9),   // chain closed; best member wins, not min-id
      (10L, 2L, 10L, 0.7), // tie -> lower id
      (20L, 1L, 20L, 0.2)))
  }

  test("keep rule differs from p48's min-id exactly when quality disagrees with id order") {
    val docs = Seq((1L, 0.1), (2L, 0.9)).toDF("doc_id", "q")
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val kept = Dedup.qualityCanonicalKeep(docs, "doc_id", pairs, col("q"))
      .select("kept_id").as[Long].head()
    assert(kept == 2L, "min-id would keep 1; quality keep must pick 2")
  }
}

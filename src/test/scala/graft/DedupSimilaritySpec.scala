package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Similarity}

class DedupSimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
  lazy val embs = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")

  test("minhash LSH pairs equal exact all-pairs jaccard (3-gram, t=0.8)") {
    val lsh = Dedup.minhashNearDupPairs(docs, "doc_id", "text",
      shingleSize = 3, threshold = 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      shingleSize = 3, threshold = 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(lsh == exact)
    assert(exact.nonEmpty, "fixtures plant near-dup pairs")
  }

  test("simhash banding finds every pair with hamming <= 3 (pigeonhole completeness)") {
    val sigs = Dedup.simhashSignatures(docs, "doc_id", "text").cache()
    val banded = Dedup.simhashNearDupPairs(sigs, maxDist = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val a = sigs.select($"id".as("id_a"), $"simhash".as("sh_a"))
    val b = sigs.select($"id".as("id_b"), $"simhash".as("sh_b"))
    val brute = a.join(b, $"id_a" < $"id_b")
      .filter(bit_count($"sh_a".bitwiseXOR($"sh_b")) <= 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(banded == brute)
  }

  test("exact dedup groups partition the corpus") {
    val g = Dedup.exactGroups(docs, "doc_id", "text")
    assert(g.agg(sum("n_copies")).head().getLong(0) == docs.count())
  }

  test("brute-force top-k: rank 1 is the max-cosine neighbor") {
    val queries = embs.filter($"vec_id" % 100 === 0)
    val topk = Similarity.bruteForceTopK(queries, embs, k = 3)
    val r1 = topk.filter($"rank" === 1).select("qid", "cos")
      .as[(Long, Double)].collect().toMap
    val maxCos = topk.groupBy("qid").agg(max("cos").as("m"))
      .as[(Long, Double)].collect().toMap
    assert(r1 == maxCos)
    assert(topk.groupBy("qid").count().select("count").as[Long].collect().forall(_ == 3))
  }

  test("IVF ANN (kmeans coarse quantizer) achieves usable recall vs brute force") {
    val queries = embs.filter($"vec_id" % 50 === 0)
    val bf = Similarity.bruteForceTopK(queries, embs, k = 5)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(queries, embs, k = 5, nlist = 16, nprobe = 4)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val recall = (bf & ivf).size.toDouble / bf.size
    assert(recall >= 0.4, s"recall=$recall")
  }

  test("LSH ANN achieves usable recall vs brute force on random vectors") {
    // uniformly random embeddings are LSH's worst case (no cluster
    // structure); the bound here documents that floor rather than
    // promising production recall, which depends on data geometry
    val queries = embs.filter($"vec_id" % 50 === 0)
    val bf = Similarity.bruteForceTopK(queries, embs, k = 5)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val lsh = Similarity.lshTopK(queries, embs, k = 5)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val recall = (bf & lsh).size.toDouble / bf.size
    assert(recall >= 0.4, s"recall=$recall")
  }
}

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

  test("containment catches asymmetric duplication that Jaccard misses") {
    // doc 2 is a verbatim quote from the middle of doc 1: every 3-gram
    // of doc 2 appears in doc 1 (containment 1.0), while doc 1 has many
    // grams of its own (reverse containment and Jaccard both low)
    val long = (1 to 40).map(i => s"w$i").mkString(" ")
    val quote = (10 to 16).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, long), (2L, quote), (3L, "x y z q r s"))
      .toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs, "doc_id", "text",
        shingleSize = 3, threshold = 0.9)
      .as[(Long, Long, Double)].collect().toSet
    assert(got == Set((2L, 1L, 1.0)), got.toString)
    // the same pair under symmetric Jaccard sits far below any dedup cut
    val j = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        shingleSize = 3, threshold = 0.0)
      .as[(Long, Long, Double)].collect()
      .find(p => p._1 == 1L && p._2 == 2L).map(_._3)
    assert(j.exists(_ < 0.2), j.toString)
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
    // structure); 6 independent tables + 2-bit multiprobe (the lshTopK
    // defaults) hold a 0.8 floor even here — production recall on
    // clustered embedding geometry is higher
    val queries = embs.filter($"vec_id" % 50 === 0)
    val bf = Similarity.bruteForceTopK(queries, embs, k = 5)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val lsh = Similarity.lshTopK(queries, embs, k = 5)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val recall = (bf & lsh).size.toDouble / bf.size
    assert(recall >= 0.8, s"recall=$recall")
  }

  test("LSH ANN shuffled path (broadcastQueries=false): identical output, no cross product") {
    // the large-query-set escape hatch: both joins become shuffled
    // equi-joins — the result must be IDENTICAL (same buckets, same
    // rerank, the join strategy is invisible) and the plan must stay
    // free of any all-pairs node
    val queries = embs.filter($"vec_id" % 50 === 0)
    val shuffled = Similarity.lshTopK(queries, embs, k = 5,
      broadcastQueries = false)
    val plan = shuffled.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
    val got = shuffled.select("qid", "nid", "cos")
      .as[(Long, Long, Double)].collect().toSet
    val bc = Similarity.lshTopK(queries, embs, k = 5)
      .select("qid", "nid", "cos").as[(Long, Long, Double)].collect().toSet
    assert(got == bc)
    assert(got.nonEmpty)
  }

  test("ANN recall sweep: monotone in tables (LSH) / nprobe (IVF), >=0.95 at the generous end") {
    // p10/p13 are the registry's two no-oracle-by-design rows; this
    // sweep characterizes their accuracy contract beyond a single
    // fixed floor: recall vs exact brute force must be monotone
    // non-decreasing in the quality knob (more tables / more probed
    // cells only ADD candidates, and any candidate that displaces a
    // true top-k member from the rerank is itself a true top-k member),
    // and the generous end must be near-exact. At nprobe = nlist every
    // cell is probed, so IVF degenerates to brute force exactly.
    val queries = embs.filter($"vec_id" % 50 === 0)
    val bf = Similarity.bruteForceTopK(queries, embs, k = 5)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    def recallOf(ann: org.apache.spark.sql.DataFrame) = {
      val got = ann.select("qid", "nid").as[(Long, Long)].collect().toSet
      (bf & got).size.toDouble / bf.size
    }
    val lshCurve = Seq(2, 6, 12).map(t =>
      recallOf(Similarity.lshTopK(queries, embs, k = 5, tables = t)))
    assert(lshCurve == lshCurve.sorted, s"LSH recall not monotone: $lshCurve")
    assert(lshCurve.last >= 0.95, s"LSH recall curve: $lshCurve")
    val ivfCurve = Seq(1, 4, 16).map(p =>
      recallOf(Similarity.ivfTopK(queries, embs, k = 5, nlist = 16, nprobe = p)))
    assert(ivfCurve == ivfCurve.sorted, s"IVF recall not monotone: $ivfCurve")
    assert(ivfCurve.last >= 0.95, s"IVF recall curve: $ivfCurve")
  }

  test("quantized top-k (int8 SQ) recall floor vs float brute force") {
    // uniform-random fixtures are the WORST case for quantized rank
    // fidelity: the true top-5 sit in a near-tie band (cos ~0.4, barely
    // above the random-pair distribution), and int8 coordinate error
    // (~0.4% of maxabs) legitimately reorders near-ties — measured 0.68
    // here. On real clustered embeddings neighbor margins dwarf the
    // quantization noise. The p34 oracle already pins the quantized
    // ranking itself EXACTLY; this floor guards against quantizer bugs
    // (a broken scale or sign collapses recall toward k/n ~ 0.005).
    val queries = embs.filter($"vec_id" % 50 === 0)
    val bf = Similarity.bruteForceTopK(queries, embs, k = 5)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val qz = Similarity.quantizedTopK(queries, embs, k = 5)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val recall = (bf & qz).size.toDouble / bf.size
    assert(recall >= 0.6, s"recall=$recall")
  }

  test("quantized top-k rank-1 is exact on planted near-identical vectors") {
    // where margins are real (a planted duplicate at cos ~0.999), the
    // quantized rank must agree with float brute force
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val rnd = new scala.util.Random(7)
    val base = Array.fill(64)(rnd.nextFloat() * 2 - 1)
    val rows = (0 until 40).map { i =>
      val v =
        if (i == 1) base.map(x => x + 0.001f) // near-identical to vec 0
        else if (i == 0) base
        else Array.fill(64)(rnd.nextFloat() * 2 - 1)
      Row(i.toLong, v.toSeq)
    }
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val top1 = Similarity.quantizedTopK(df.filter($"vec_id" === 0), df, k = 1)
      .select("nid").as[Long].head()
    assert(top1 == 1L)
  }

  test("blocked cosine pair join == naive all-pairs, with no BNLJ/cartesian in the plan") {
    val blocked = Similarity.cosineNearDupPairs(embs, threshold = 0.4, blocks = 7)
    val a = embs.select($"vec_id".as("id_a"), $"embedding".as("va"))
    val b = embs.select($"vec_id".as("id_b"), $"embedding".as("vb"))
    val naive = a.join(b, $"id_a" < $"id_b")
      .select($"id_a", $"id_b",
        round(graft.functions.Fns.cosineSimilarity($"va", $"vb"), 6).as("cos"))
      .filter($"cos" >= 0.4)
    val got = blocked.select("id_a", "id_b", "cos").as[(Long, Long, Double)].collect().toSet
    val exp = naive.select("id_a", "id_b", "cos").as[(Long, Long, Double)].collect().toSet
    assert(got == exp)
    assert(exp.nonEmpty)
    val plan = blocked.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("CartesianProduct"),
      s"exact pair join must be a blocked equi-join, got:\n$plan")
  }

  test("native SignProjections == per-plane Column formulation (bit parity)") {
    // the old formulation: bit p of table t = [sum_d emb[d]*s > 0] with
    // s = ±1 from MurmurHash3("t<t>:<p>:<d>") & 1 — rebuilt here as an
    // independent cross-check that the native expression (which replaced
    // it to stay under janino's 64 KB codegen limit) is bit-identical
    val planes = 8; val dims = 64; val tables = 6
    def oldBucket(t: Int) = (0 until planes).map { p =>
      val proj = (0 until dims).map { d =>
        val s = if ((scala.util.hashing.MurmurHash3.stringHash(s"t$t:$p:$d") & 1) == 1) 1.0 else -1.0
        $"embedding".getItem(d).cast("double") * lit(s)
      }.reduce(_ + _)
      when(proj > 0, lit(1L << p)).otherwise(0L)
    }.reduce(_ + _)
    val sample = embs.limit(100)
    val native = sample.select($"vec_id",
      graft.functions.Fns.signProjections($"embedding", planes, tables, dims).as("sigs"))
      .select($"vec_id", posexplode($"sigs").as(Seq("tbl", "bucket")))
      .as[(Long, Int, Long)].collect().toSet
    // one projection per table (a single table's 512-term tree stays
    // under janino's 64 KB method limit — the all-tables-at-once tree
    // the native expression replaced did not)
    val old = (0 until tables).flatMap { t =>
      sample.select($"vec_id", oldBucket(t).as("bucket"))
        .as[(Long, Long)].collect().map { case (id, b) => (id, t, b) }
    }.toSet
    assert(native == old)
  }

  test("LSH near-dup pairs == exact pairs on planted near-identical vectors (t=0.95)") {
    // plant 20 near-identical pairs (cos ~0.999) among 200 random vectors:
    // the high-threshold regime cosineNearDupPairsLsh is built for
    val rng = new scala.util.Random(7)
    def vec() = Array.fill(64)(rng.nextGaussian().toFloat)
    val base = (0L until 200L).map(i => (i, vec()))
    val dups = (0L until 20L).map { i =>
      val v = base(i.toInt)._2.clone()
      v(0) = v(0) + 0.01f
      (1000L + i, v)
    }
    val df = spark.createDataFrame(base ++ dups).toDF("vec_id", "embedding")
    val lsh = Similarity.cosineNearDupPairsLsh(df, threshold = 0.95)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val exact = Similarity.cosineNearDupPairs(df, threshold = 0.95)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(lsh == exact)
    assert(exact.size >= 20)
  }
}

package graft

import scala.util.Random
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{LineDedup, Winnowing}

/** Seeded differential fuzz over the round-8 dedup family — random
  * corpora checked against independent in-JVM reference
  * implementations, the ZoneMapFuzzSpec pattern: a fixed fixture can
  * memorize a bug's shape, a thousand random shapes cannot.
  */
class DedupFamilyFuzzSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("LineDedup drop-all and keep-first match a brute-force reference on random corpora") {
    val rnd = new Random(20260814L)
    for (trial <- 1 to 4) {
      val pool = (0 until 12).map(i => s"line_${trial}_$i")
      val docs = (1L to 50L).map { id =>
        id -> Seq.fill(1 + rnd.nextInt(7))(pool(rnd.nextInt(pool.size)))
          .mkString("\n")
      }
      for (minDocs <- Seq(2, 3); keepFirst <- Seq(false, true)) {
        // reference: distinct-doc frequency + first-doc ownership
        val lineDocs = docs.flatMap { case (id, t) =>
          t.split("\n", -1).map(l => (l, id)) }
        val df = lineDocs.distinct.groupBy(_._1).view.mapValues(_.size).toMap
        val firstId = lineDocs.groupBy(_._1).view
          .mapValues(_.map(_._2).min).toMap
        val expected = docs.map { case (id, t) =>
          val lines = t.split("\n", -1).toSeq
          val kept = lines.filter { l =>
            df(l) < minDocs ||
              (keepFirst && firstId(l) == id)
          }
          val dropped = lines.size - kept.size
          id -> ((lines.size.toLong, dropped.toLong, kept.mkString("\n")))
        }.toMap
        val got = LineDedup.dropSharedLines(docs.toDF("id", "text"),
            "id", "text", "\n", minDocs = minDocs, keepFirst = keepFirst)
          .as[(Long, Long, Long, String)].collect()
          .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
        assert(got == expected,
          s"trial $trial minDocs=$minDocs keepFirst=$keepFirst")
      }
    }
  }

  test("Winnowing fingerprints match an in-JVM reference; planted shared runs are never missed") {
    val k = 4; val w = 4
    def rh31(s: String): Long =
      s.codePoints().toArray.foldLeft(0L)((h, c) => (h * 31 + c) % 2147483648L)
    def refFps(tokens: Seq[String]): Set[Long] = {
      if (tokens.size < k) Set.empty
      else {
        val hs = tokens.sliding(k).map(g => rh31(g.mkString(" "))).toVector
        (0 to math.max(hs.size - w, 0))
          .map(j => hs.slice(j, j + w).min).toSet
      }
    }
    val rnd = new Random(97L)
    val shared = (0 until w + k - 1).map(i => s"run$i")
    val docs = (1L to 40L).map { id =>
      val body = Seq.fill(3 + rnd.nextInt(20))(s"t${rnd.nextInt(200)}")
      // plant the shared run in every 4th doc at a random offset
      val toks = if (id % 4 == 0) {
        val off = rnd.nextInt(body.size + 1)
        body.take(off) ++ shared ++ body.drop(off)
      } else body
      id -> toks
    }
    val got = Winnowing.fingerprints(
        docs.map { case (id, t) => (id, t.mkString(" ")) }.toDF("id", "text"),
        "id", "text", k, w)
      .as[(Long, Long)].collect().groupBy(_._1)
      .map { case (id, a) => id -> a.map(_._2).toSet }
    docs.foreach { case (id, toks) =>
      assert(got.getOrElse(id, Set.empty) == refFps(toks), s"doc $id")
    }
    // the guarantee, over every planted pair
    val planted = docs.filter(_._1 % 4 == 0).map(_._1)
    assert(planted.size >= 8)
    for (a <- planted; b <- planted if a < b)
      assert((got(a) & got(b)).nonEmpty,
        s"planted shared run missed for pair ($a, $b)")
  }

  test("BPE merge learning matches an in-JVM reference on random corpora") {
    import graft.operators.BpeTrainer
    val rnd = new Random(31337L)
    for (trial <- 1 to 3) {
      val alphabet = "abcd"
      val texts = (0 until 6).map { _ =>
        Seq.fill(8 + rnd.nextInt(10))(
          Seq.fill(2 + rnd.nextInt(5))(
            alphabet(rnd.nextInt(alphabet.length))).mkString).mkString(" ")
      }
      // reference: classic BPE over the word-frequency table
      var vocab = texts.flatMap(_.split(" ")).groupBy(identity).view
        .mapValues(_.size.toLong).toMap
        .map { case (w, c) => w.map(_.toString).toVector -> c }
      val ref = scala.collection.mutable.ArrayBuffer
        .empty[(Int, String, String, Long)]
      var r = 0
      var done = false
      while (r < 6 && !done) {
        val pairs = scala.collection.mutable.Map
          .empty[(String, String), Long]
        vocab.foreach { case (ts, c) =>
          ts.zip(ts.drop(1)).foreach { pr =>
            pairs(pr) = pairs.getOrElse(pr, 0L) + c }
        }
        if (pairs.isEmpty) done = true
        else {
          val ((l, rr), c) = pairs.minBy { case ((a, b), n) => (-n, a, b) }
          r += 1
          ref += ((r, l, rr, c))
          vocab = vocab.groupBy { case (ts, _) =>
            ts.foldLeft(Vector.empty[String]) { (acc, x) =>
              if (acc.nonEmpty && acc.last == l && x == rr)
                acc.init :+ (acc.last + x)
              else acc :+ x
            }
          }.view.mapValues(_.values.sum).toMap
        }
      }
      // both finish strategies against the reference: the driver loop
      // (default threshold) and the distributed rounds (threshold 0)
      val got = BpeTrainer.learnMerges(texts.toDF("text"), "text", 6)
        .orderBy("merge_rank")
        .as[(Int, String, String, Long)].collect().toSeq
      assert(got == ref.toSeq, s"trial $trial (driver finish)")
      val gotDist = BpeTrainer.learnMerges(texts.toDF("text"), "text", 6,
          driverMaxWords = 0L)
        .orderBy("merge_rank")
        .as[(Int, String, String, Long)].collect().toSeq
      assert(gotDist == ref.toSeq, s"trial $trial (distributed rounds)")
    }
  }

  test("KMV stays exact below capacity on random data under random layouts") {
    val rnd = new Random(5150L)
    val kmv = org.apache.spark.sql.functions.udaf(
      new graft.functions.KmvDistinct(512),
      org.apache.spark.sql.Encoders.STRING)
    for (trial <- 1 to 3) {
      val rows = (0 until 4000).map { _ =>
        val g = rnd.nextInt(5)
        (g, s"v${g}_${rnd.nextInt(400)}") // <= 400 distinct per group < 512
      }
      val expected = rows.distinct.groupBy(_._1).view.mapValues(_.size.toLong)
        .toMap
      val got = rows.toDF("g", "k")
        .repartition(1 + rnd.nextInt(40),
          org.apache.spark.sql.functions.col("k"))
        .groupBy("g").agg(kmv(org.apache.spark.sql.functions.col("k"))
          .as("d"))
        .as[(Int, Long)].collect().toMap
      assert(got == expected, s"trial $trial")
    }
  }
}

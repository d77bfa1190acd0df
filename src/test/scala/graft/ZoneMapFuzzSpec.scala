package graft

import java.nio.file.Files

import scala.util.Random

import org.apache.spark.sql.{Column, SaveMode}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Randomized differential check of manifest zone-map skipping: for
  * seeded random data (extreme longs, ±Infinity, NaN, nulls) and random
  * range/equality/IN predicates, a read THROUGH the connector (file
  * skipping active) must equal the same predicate evaluated on the
  * in-memory rows. Skipping is I/O-only by construction (filters stay
  * residual) — this pins that no bound rounding, NaN ordering, or
  * null-handling corner can make a pruned file hide a matching row.
  */
class ZoneMapFuzzSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Fmt = "graft.sources.ManifestTable"
  private val rnd = new Random(42)

  private def randLong(): java.lang.Long = rnd.nextInt(6) match {
    case 0 => Long.MaxValue
    case 1 => Long.MinValue
    case 2 => Long.MaxValue - rnd.nextInt(3)
    case 3 => null
    case _ => rnd.between(-100L, 100L)
  }
  private def randDouble(): java.lang.Double = rnd.nextInt(8) match {
    case 0 => Double.NaN
    case 1 => Double.PositiveInfinity
    case 2 => Double.NegativeInfinity
    case 3 => null
    case 4 => (1L << 53).toDouble + 2
    case _ => math.rint(rnd.between(-50.0, 50.0) * 4) / 4
  }

  // Spark total order: NaN greater than every double, null excluded by
  // any comparison/IN
  private def cmp(v: java.lang.Double, w: Double): Int =
    if (v.isNaN) 1 else java.lang.Double.compare(v, w)

  test("seeded fuzz: connector read equals in-memory evaluation under every predicate") {
    for (table <- 1 to 4) {
      val n = 40 + rnd.nextInt(80)
      val rows = (0 until n).map(i => (i.toLong, randLong(), randDouble()))
      val dir = Files.createTempDirectory(s"graft_zmfuzz$table").toString
      val parts = 1 + rnd.nextInt(6)
      val df = rows.toDF("pk", "k", "x")
      (if (rnd.nextBoolean()) df.repartitionByRange(parts, $"k")
       else df.repartition(parts))
        .write.format(Fmt).option("path", dir).mode(SaveMode.Append).save()
      val back = spark.read.format(Fmt).option("path", dir).load()

      for (trial <- 1 to 10) {
        val (pred, expect): (Column, ((Long, java.lang.Long, java.lang.Double)) => Boolean) =
          rnd.nextInt(6) match {
            case 0 =>
              val v = rnd.between(-120L, 120L)
              ($"k" > v, r => r._2 != null && r._2 > v)
            case 1 =>
              val v = Long.MaxValue - rnd.nextInt(3)
              ($"k" >= v, r => r._2 != null && r._2 >= v)
            case 2 =>
              val v = math.rint(rnd.between(-60.0, 60.0) * 4) / 4
              ($"x" <= v, r => r._3 != null && cmp(r._3, v) <= 0)
            case 3 =>
              val v = rnd.between(-120L, 120L)
              ($"k" === v, r => r._2 != null && r._2 == v)
            case 4 =>
              val vs = Seq.fill(3)(rnd.between(-120L, 120L))
              ($"k".isin(vs: _*), r => r._2 != null && vs.contains(r._2.longValue))
            case _ =>
              val v = math.rint(rnd.between(-60.0, 60.0) * 4) / 4
              ($"x" > v, r => r._3 != null && cmp(r._3, v) > 0)
          }
        val got = back.filter(pred).select("pk").as[Long].collect().sorted
        val exp = rows.filter(expect).map(_._1).sorted.toArray
        assert(got.sameElements(exp),
          s"table $table trial $trial predicate $pred: " +
            s"got ${got.mkString(",")} expected ${exp.mkString(",")}")
      }
    }
  }
}

package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{AsOfJoin, Sessionize}

class OperatorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asof backward: latest right row at-or-before each left row, per key") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L),
      (1L, ts("2024-01-01 12:00:00"), 101L),
      (2L, ts("2024-01-01 10:30:00"), 200L))
      .toDF("user_id", "ts", "event_id")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), 900L, 5.0),
      (1L, ts("2024-01-01 10:00:00"), 901L, 6.0), // exact tie: inclusive
      (1L, ts("2024-01-01 11:00:00"), 902L, 7.0),
      (2L, ts("2024-01-01 11:00:00"), 903L, 8.0)) // after left -> no match
      .toDF("user_id", "ts", "purchase_id", "purchase_value")
    val got = AsOfJoin.backward(left, right, Seq("user_id"), "ts", "purchase_id")
      .orderBy("event_id")
      .select("event_id", "purchase_id")
      .as[(Long, Option[Long])].collect().toSeq
    assert(got == Seq(
      (100L, Some(901L)), // 10:00 matches the simultaneous purchase
      (101L, Some(902L)), // latest before noon
      (200L, None)))      // user 2 has no prior purchase
  }

  test("asof backward: simultaneous right rows resolve to greatest tiebreak") {
    val left = Seq((1L, ts("2024-01-01 10:00:00"), 1L)).toDF("k", "ts", "lid")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), 7L, 1.0),
      (1L, ts("2024-01-01 09:00:00"), 9L, 2.0),
      (1L, ts("2024-01-01 09:00:00"), 8L, 3.0))
      .toDF("k", "ts", "rid", "v")
    val got = AsOfJoin.backward(left, right, Seq("k"), "ts", "rid")
      .select("rid").as[Long].head()
    assert(got == 9L)
  }

  test("sessionize: gap > threshold starts a new session") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 10:10:00")),
      (1L, ts("2024-01-01 11:30:00")), // 80 min gap -> new session
      (2L, ts("2024-01-01 10:00:00")))
      .toDF("user_id", "ts")
    val got = Sessionize.sessions(ev, "user_id", "ts", gapSeconds = 1800)
      .orderBy("user_id", "session_start")
      .select("user_id", "n_events")
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L), (1L, 1L), (2L, 1L)))
  }

  test("approx_count_distinct is within 5% of exact on lineitem") {
    val li = spark.read.parquet(s"${TestSpark.sf0001}/lineitem.parquet")
    val r = li.agg(
      countDistinct($"l_partkey").as("exact"),
      approx_count_distinct($"l_partkey", 0.02).as("approx")).head()
    val (exact, approx) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    assert(math.abs(approx - exact) / exact < 0.05, s"exact=$exact approx=$approx")
  }

  test("merge upsert: update replaces whole row, insert lands, rest carries forward") {
    import graft.operators.MergeUpsert
    val target = Seq((1L, Some("a"), 10.0), (2L, Some("b"), 20.0),
      (3L, Some("c"), 30.0)).toDF("k", "s", "v")
    // row 2: whole-row UPDATE with a NULL data column — MERGE SET *
    // semantics require the NULL to overwrite, not fall back
    val source = Seq((2L, None: Option[String], 99.0), (4L, Some("d"), 40.0))
      .toDF("k", "s", "v")
    val got = MergeUpsert.merge(target, source, Seq("k"))
      .as[(Long, Option[String], Double)].collect().toSet
    assert(got == Set(
      (1L, Some("a"), 10.0), (2L, None, 99.0),
      (3L, Some("c"), 30.0), (4L, Some("d"), 40.0)))
  }

  test("merge upsert: composite keys and schema-mismatch rejection") {
    import graft.operators.MergeUpsert
    val target = Seq((1L, "x", 10.0), (1L, "y", 20.0)).toDF("k1", "k2", "v")
    val source = Seq((1L, "y", 99.0), (2L, "x", 1.0)).toDF("k1", "k2", "v")
    val got = MergeUpsert.merge(target, source, Seq("k1", "k2"))
      .as[(Long, String, Double)].collect().toSet
    assert(got == Set((1L, "x", 10.0), (1L, "y", 99.0), (2L, "x", 1.0)))
    assertThrows[IllegalArgumentException] {
      MergeUpsert.merge(target, source.select("k2", "k1", "v"), Seq("k1"))
    }
  }

  test("snapshot diff: I/U/D tagged, unchanged dropped, null-safe compare") {
    import graft.operators.SnapshotDiff
    val old = Seq(
      (1L, Some("a"), 10.0), // unchanged -> dropped
      (2L, Some("b"), 20.0), // value update
      (3L, None: Option[String], 30.0), // null -> value update
      (5L, Some("e"), 50.0)) // deleted
      .toDF("k", "s", "v")
    val neu = Seq(
      (1L, Some("a"), 10.0),
      (2L, Some("b"), 21.0),
      (3L, Some("c"), 30.0),
      (4L, None: Option[String], 40.0)) // insert with a null field
      .toDF("k", "s", "v")
    val got = SnapshotDiff.diff(old, neu, Seq("k"))
      .orderBy("k")
      .as[(Long, String, Option[String], Option[String], Option[Double], Option[Double])]
      .collect().toSeq
    assert(got == Seq(
      (2L, "U", Some("b"), Some("b"), Some(20.0), Some(21.0)),
      (3L, "U", None, Some("c"), Some(30.0), Some(30.0)),
      (4L, "I", None, None, None, Some(40.0)),
      (5L, "D", Some("e"), None, Some(50.0), None)))
    // diff is the inverse of merge: applying the changeset reproduces new
    val reapplied = graft.operators.MergeUpsert.merge(
      old.filter($"k" =!= 5L), // deletes applied separately
      neu.join(SnapshotDiff.diff(old, neu, Seq("k"))
        .filter($"change_type" =!= "D").select("k"), Seq("k")),
      Seq("k")).as[(Long, Option[String], Double)].collect().toSet
    assert(reapplied == neu.as[(Long, Option[String], Double)].collect().toSet)
  }

  test("incremental agg: delta-applied == recomputed, incl. group moves/drops") {
    import graft.operators.{IncrementalAgg, SnapshotDiff}
    val old = Seq(
      (1L, "g1", 10.0), (2L, "g1", 20.0), // g1: one row moves to g2
      (3L, "g2", 30.0),
      (4L, "g3", 40.0))                   // g3's only row deleted -> drop
      .toDF("k", "g", "v")
    val neu = Seq(
      (1L, "g1", 10.0),
      (2L, "g2", 25.0),                   // moved g1 -> g2, value changed
      (3L, "g2", 30.0),
      (5L, "g4", 50.0))                   // new group appears
      .toDF("k", "g", "v")
    val matAgg = old.groupBy("g")
      .agg(count(lit(1)).as("cnt"), sum("v").as("sv"))
    val got = IncrementalAgg.applyDelta(matAgg,
        SnapshotDiff.diff(old, neu, Seq("k")), "g", "v", "cnt", "sv")
      .orderBy("g").as[(String, Long, Double)].collect().toSeq
    val recomputed = neu.groupBy("g")
      .agg(count(lit(1)).as("cnt"), sum("v").as("sv"))
      .orderBy("g").as[(String, Long, Double)].collect().toSeq
    assert(got == recomputed)
    assert(!got.exists(_._1 == "g3")) // zero-count group dropped
  }

  test("snapshot diff: schema mismatch and key-only schemas rejected") {
    import graft.operators.SnapshotDiff
    val a = Seq((1L, "x")).toDF("k", "v")
    assertThrows[IllegalArgumentException] {
      SnapshotDiff.diff(a, a.select("v", "k"), Seq("k"))
    }
    val keysOnly = Seq(Tuple1(1L)).toDF("k")
    assertThrows[IllegalArgumentException] {
      SnapshotDiff.diff(keysOnly, keysOnly, Seq("k"))
    }
  }
}

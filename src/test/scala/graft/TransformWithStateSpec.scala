package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{EventStreams, TransformWithStateOps}

class TransformWithStateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Batch twin: q68's window cascade, reduced to per-user (t1,t2,t3). */
  private def batchFunnelTruth: Set[(Long, Long, Long, Long)] = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts")
    val marked = graft.api.Tables.t(spark, TestSpark.sf0001, "events")
      .select($"user_id", unix_micros($"ts").as("ts"), $"event_type")
      .withColumn("t1r", min(when($"event_type" === "view", $"ts")).over(w))
      .withColumn("t2c", when($"event_type" === "click" && $"ts" > $"t1r", $"ts"))
      .withColumn("t2r", min($"t2c").over(w))
      .withColumn("t3c", when($"event_type" === "purchase" && $"ts" > $"t2r", $"ts"))
    marked.groupBy("user_id")
      .agg(coalesce(min(when($"event_type" === "view", $"ts")), lit(-1L)).as("t1"),
        coalesce(min($"t2c"), lit(-1L)).as("t2"),
        coalesce(min($"t3c"), lit(-1L)).as("t3"))
      .select($"user_id", $"t1", $"t2", $"t3")
      .as[(Long, Long, Long, Long)].collect().toSet
  }

  /** Stream the events fixture as 4 range-ordered files (1 per trigger,
    * ascending mtimes so trigger order follows the ts ranges — with
    * disjoint ranges even a 0-second watermark delay drops nothing),
    * run userFunnels in the given mode, return converged per-user rows.
    */
  private def runFunnelStream(queryName: String,
      watermarkDelay: Option[String]): Set[(Long, Long, Long, Long)] = {
    val src = graft.api.Tables.t(spark, TestSpark.sf0001, "events")
      .select("user_id", "ts", "event_type", "event_id", "value", "props")
    val staged = java.nio.file.Files
      .createTempDirectory("graft-funnel-src").toString
    src.repartitionByRange(4, $"ts").write.mode("overwrite").parquet(staged)
    val parts = new java.io.File(staged).listFiles()
      .filter(f => f.getName.startsWith("part-")).sortBy(_.getName)
    parts.zipWithIndex.foreach { case (f, i) =>
      f.setLastModified(f.lastModified() - 60000L + i * 1000L) }
    val q = graft.streaming.FunnelStateOps.userFunnels(
        spark.readStream.schema(src.schema)
          .option("maxFilesPerTrigger", "1").parquet(staged),
        watermarkDelay = watermarkDelay)
      .toDF()
      .writeStream.outputMode("update").format("memory")
      .queryName(queryName).start()
    try q.processAllAvailable() finally q.stop()
    // converged row per user = the one with the highest n_seen
    spark.table(queryName).groupBy("user_id")
      .agg(max(struct($"n_seen", $"t1", $"t2", $"t3")).as("s"))
      .select($"user_id", $"s.t1", $"s.t2", $"s.t3")
      .as[(Long, Long, Long, Long)].collect().toSet
  }

  test("transformWithState funnel converges to the batch window-cascade funnel") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // multi-batch stream (4 files, 1 per trigger) so incremental state
      // maintenance — including cross-batch ordering — actually runs
      val got = runFunnelStream("t_funnel", None)
      val batch = batchFunnelTruth
      assert(got == batch)
      assert(batch.exists(_._4 >= 0), "fixture reaches the purchase stage")
    } finally {
      prev match {
        case Some(p) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("funnel watermark mode (EventTime prune + silent-user sweep) converges and quiesces") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // the TTL mode hangs processAllAvailable forever here (see the
      // FunnelStateOps scaladoc); EventTime mode must terminate AND
      // match the batch truth exactly — the watermark prune is exact
      val got = runFunnelStream("t_funnel_wm", Some("0 seconds"))
      assert(got == batchFunnelTruth)
    } finally {
      prev match {
        case Some(p) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("funnel pruning: completed stages evict unselectable candidates, replays dedup") {
    import graft.streaming.FunnelStateOps.deriveAndPrune
    // nothing qualifies yet: everything retained (a future earlier view
    // could make any click the pick), but deduped + sorted
    val (t1a, t2a, t3a, c1, p1) =
      deriveAndPrune(Long.MaxValue, Seq(5L, 3L, 3L), Seq(9L, 9L))
    assert((t1a, t2a, t3a) == (-1L, -1L, -1L))
    assert(c1 == Seq(3L, 5L) && p1 == Seq(9L))
    // completed funnel: candidates above the current pick can never be
    // selected by any future arrival (t1 only decreases => t2, t3 only
    // decrease) and are EVICTED
    val (t1b, t2b, t3b, c2, p2) =
      deriveAndPrune(2L, Seq(3L, 5L, 7L), Seq(4L, 6L, 8L))
    assert((t1b, t2b, t3b) == (2L, 3L, 4L))
    assert(c2 == Seq(3L) && p2 == Seq(4L))
    // the retained state still supports revision by a late earlier view
    val (t1c, t2c, t3c, _, _) = deriveAndPrune(1L, c2, p2)
    assert((t1c, t2c, t3c) == (1L, 3L, 4L))
  }

  test("funnel pruning property: any arrival order + replays converge to the batch funnel") {
    val rnd = new scala.util.Random(20260813L)
    for (trial <- 1 to 200) {
      val events = Seq.fill(2 + rnd.nextInt(12))(
        (Seq("view", "click", "purchase")(rnd.nextInt(3)),
          1L + rnd.nextInt(20)))
      // ground truth: derive once from the complete multiset
      val allViews = events.collect { case ("view", t) => t }
      val mvAll = if (allViews.isEmpty) Long.MaxValue else allViews.min
      val truth = graft.streaming.FunnelStateOps.deriveAndPrune(mvAll,
        events.collect { case ("click", t) => t },
        events.collect { case ("purchase", t) => t })
      // incremental: shuffled arrival, random replays, chunked batches,
      // carrying only the PRUNED lists between batches
      val arrivals = rnd.shuffle(events ++ events.filter(_ => rnd.nextBoolean()))
      var mv = Long.MaxValue
      var cs = Seq.empty[Long]; var ps = Seq.empty[Long]
      var last = (-1L, -1L, -1L)
      arrivals.grouped(1 + rnd.nextInt(4)).foreach { chunk =>
        chunk.foreach {
          case ("view", t) => if (t < mv) mv = t
          case ("click", t) => cs = cs :+ t
          case ("purchase", t) => ps = ps :+ t
        }
        val r = graft.streaming.FunnelStateOps.deriveAndPrune(mv, cs, ps)
        cs = r._4; ps = r._5
        last = (r._1, r._2, r._3)
      }
      assert(last == ((truth._1, truth._2, truth._3)),
        s"trial $trial: events=$events arrivals=$arrivals got=$last")
    }
  }

  test("watermark prune exactness: pruned state + any future (>= W) arrivals converge identically") {
    import graft.streaming.FunnelStateOps.{deriveAndPrune, watermarkPrune}
    // one per-batch state step, carrying the algebraically pruned lists
    def fold(events: Seq[(String, Long)], mv0: Long, cs0: Seq[Long],
        ps0: Seq[Long]): (Long, (Long, Long, Long, Seq[Long], Seq[Long])) = {
      var mv = mv0; var cs = cs0; var ps = ps0
      events.foreach {
        case ("view", t) => if (t < mv) mv = t
        case ("click", t) => cs = cs :+ t
        case ("purchase", t) => ps = ps :+ t
      }
      (mv, deriveAndPrune(mv, cs, ps))
    }
    val rnd = new scala.util.Random(20260814L)
    val W = 10L
    for (trial <- 1 to 300) {
      val kinds = Seq("view", "click", "purchase")
      val past = Seq.fill(2 + rnd.nextInt(10))(
        (kinds(rnd.nextInt(3)), 1L + rnd.nextInt(20)))
      // the watermark contract: future arrivals are all at or above W
      val future = Seq.fill(rnd.nextInt(8))(
        (kinds(rnd.nextInt(3)), W + rnd.nextInt(15)))
      val (mv1, r1) = fold(past, Long.MaxValue, Nil, Nil)
      val prunedC = watermarkPrune(r1._2, r1._4, W)
      val prunedP = watermarkPrune(r1._3, r1._5, W)
      // the watermark prune is strictly an eviction...
      assert(prunedC.toSet.subsetOf(r1._4.toSet) && prunedP.toSet.subsetOf(r1._5.toSet))
      // ...that changes no future outcome
      val (_, rA) = fold(future, mv1, r1._4, r1._5)
      val (_, rB) = fold(future, mv1, prunedC, prunedP)
      assert((rA._1, rA._2, rA._3) == ((rB._1, rB._2, rB._3)),
        s"trial $trial: past=$past future=$future full=$rA pruned=$rB")
    }
  }

  test("transformWithState user profiles converge to the batch aggregate") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val streamed = EventStreams.runToMemory(spark, TestSpark.sf0001,
        "t_tws", "update")(df => TransformWithStateOps.userProfiles(df).toDF())
      // update mode emits one row per key per micro-batch; the row with
      // the highest n_events per user is the converged state
      val last = streamed.groupBy("user_id")
        .agg(max(struct($"n_events", $"n_types", $"max_value")).as("s"))
        .select($"user_id", $"s.n_types", $"s.n_events",
          round($"s.max_value", 6).as("mx"))
        .as[(Long, Long, Long, Double)].collect().toSet
      val batch = graft.api.Tables.t(spark, TestSpark.sf0001, "events")
        .groupBy("user_id")
        .agg(countDistinct("event_type").as("nt"), count(lit(1)).as("n"),
          round(max("value"), 6).as("mx"))
        .select($"user_id", $"nt", $"n", $"mx")
        .as[(Long, Long, Long, Double)].collect().toSet
      assert(streamed.count() >= batch.size)
      assert(last == batch)
    } finally {
      prev match {
        case Some(p) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}

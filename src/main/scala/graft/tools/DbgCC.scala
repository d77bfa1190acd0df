package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: decompose the connected-components stage of p92 — time
  * pair generation, the edges checkpoint, each label-propagation
  * round's jobs, and the final group join separately, with job counts
  * from a SparkListener (`runMain graft.tools.DbgCC [sfDir]`).
  */
object DbgCC {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    s.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs += 1; stages += j.stageInfos.size
          tasks += j.stageInfos.map(_.numTasks).sum
        }
      })
    def timed[T](label: String)(f: => T): T = {
      val (j0, s0, t0) = (jobs, stages, tasks)
      val w0 = System.nanoTime()
      val r = f
      val w = (System.nanoTime() - w0) / 1e9
      println(f"$label%-28s ${w}%.3f s  jobs=${jobs - j0} " +
        s"stages=${stages - s0} tasks=${tasks - t0}")
      r
    }
    // warm the session on a small run first
    new graft.queries.PipelineE2e.Chain(s, dir).groups.count()

    val chain = new graft.queries.PipelineE2e.Chain(s, dir)
    val pairs = timed("pairs (minhash)") {
      chain.nearPairs.localCheckpoint(true)
    }
    println(s"  pairs rows = ${pairs.count()}")

    // replicate componentLabels with per-round timing
    // mirrors ConnectedComponents.componentLabels round-18 shape
    // (fused neighbor-min init, edges pre-partitioned on d)
    val edges = timed("edges union+checkpoint") {
      pairs.select(col("id_a").cast("long").as("s"),
          col("id_b").cast("long").as("d"))
        .union(pairs.select(col("id_b").cast("long").as("s"),
          col("id_a").cast("long").as("d")))
        .repartition(col("d"))
        .localCheckpoint(true)
    }
    println(s"  edges rows = ${edges.count()}")
    var labels = timed("labels init (fused round)") {
      edges.groupBy(col("s"))
        .agg(org.apache.spark.sql.functions.least(col("s"),
          org.apache.spark.sql.functions.min(col("d"))).as("label"))
        .select(col("s").as("id"), col("label"))
        .localCheckpoint(true)
    }
    var improving = 0
    var converged = false
    while (improving <= 20 && !converged) {
      val next = timed(s"round ${improving} propagate") {
        val nm = edges
          .join(labels.select(col("id").as("d"), col("label").as("dl")), "d")
          .groupBy(col("s").as("id")).agg(min("dl").as("nmin"))
        val prop = labels.join(nm, Seq("id"), "left")
          .select(col("id"), col("label").as("old"),
            least(col("label"), coalesce(col("nmin"), col("label"))).as("mid"))
        prop
          .join(labels.select(col("id").as("mid"), col("label").as("midl")), "mid")
          .select(col("id"), col("old"), least(col("mid"), col("midl")).as("label"))
          .localCheckpoint(true)
      }
      converged = timed(s"round ${improving} converge?") {
        next.filter(col("label") =!= col("old")).isEmpty
      }
      labels = next.select("id", "label")
      if (!converged) improving += 1
    }
    timed("dedupGroups join + count") {
      graft.operators.ConnectedComponents
        .dedupGroups(chain.exactDeduped, "doc_id", pairs).count()
    }
    s.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: time a registered query under the Bench session shape —
  * warm run + min/median of 5 — and print the exchange count of its
  * executed plan (`runMain graft.tools.TimeQ <name> [sfDir] [noext]`).
  * The quiet-box counterpart of one extended-group artifact row;
  * `noext` drops the GraftExtensions registration for session A/Bs.
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: TimeQ <queryName> [sfDir] [noext]")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val b0 = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.ui.enabled", "false")
    val s = (if (args.contains("noext")) b0
      else b0.config("spark.sql.extensions", "graft.GraftExtensions"))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val q = graft.api.Registry.byName(args(0))
    q.run(s, dir).count() // warm
    // gc/peak telemetry across the timed window (the r13 playbook: a
    // slow reading with flat gc/peak is environmental; gc rivaling
    // wall time is an allocation problem in the query)
    import java.lang.management.{ManagementFactory, MemoryType}
    import scala.jdk.CollectionConverters._
    val gcBeans = ManagementFactory.getGarbageCollectorMXBeans.asScala
    val pools = ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(_.getType == MemoryType.HEAP)
    pools.foreach(_.resetPeakUsage())
    val gc0 = gcBeans.map(_.getCollectionTime).sum
    val times = (1 to 5).map { _ =>
      val t0 = System.nanoTime()
      q.run(s, dir).count()
      (System.nanoTime() - t0) / 1e9
    }.sorted
    val gcMs = gcBeans.map(_.getCollectionTime).sum - gc0
    val peakMb = pools.map(_.getPeakUsage.getUsed).sum / (1024L * 1024L)
    val plan = q.run(s, dir).queryExecution.executedPlan.toString
    println(f"${args(0)}: min=${times.head}%.3f median=${times(2)}%.3f " +
      s"exchanges=${"Exchange".r.findAllIn(plan).length} " +
      s"gc_ms=$gcMs peak_mb=$peakMb")
    s.stop()
  }
}

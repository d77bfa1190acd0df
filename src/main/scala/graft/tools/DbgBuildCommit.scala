package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: attribute a partitioned BUILD's wall time to in-job work
  * vs driver-side commit/listing (`runMain graft.tools.DbgBuildCommit
  * [sfDir]`). Runs the q87 fact build (83 month-partition dirs) three
  * times, reporting total wall vs the sum of job walls — the gap is
  * driver work: output-commit renames, file listing, planning.
  */
object DbgBuildCommit {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    @volatile var jobMs = 0L
    @volatile var jobs = 0
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    s.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          starts.put(j.jobId, j.time); ()
        }
        override def onJobEnd(
            j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val t0 = starts.getOrDefault(j.jobId, j.time)
          jobMs += j.time - t0; jobs += 1
        }
      })
    (1 to 3).foreach { i =>
      val (j0, m0) = (jobs, jobMs)
      val t0 = System.nanoTime()
      graft.queries.StorageLayout.q87Dpp(s, dir) // the build runs eagerly
      val wall = (System.nanoTime() - t0) / 1e9
      // listener events are async; give the bus a beat
      Thread.sleep(300)
      println(f"build $i: wall=$wall%.3f s, jobs=${jobs - j0}, " +
        f"jobWall=${(jobMs - m0) / 1e3}%.3f s, " +
        f"driverGap=${wall - (jobMs - m0) / 1e3}%.3f s")
    }
    s.stop()
  }
}

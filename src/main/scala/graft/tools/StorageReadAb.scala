package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: build ONE storage-group bench pair and time its READ
  * (min/median of 5) under the Bench session shape — the quiet-box
  * counterpart of the driver artifact's storage rows
  * (`runMain graft.tools.StorageReadAb <name> [sfDir]`).
  */
object StorageReadAb {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: StorageReadAb <q9x_name> [sfDir]")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val mk = graft.queries.StorageLayout.benchPairs.collectFirst {
      case (n, f) if n == args(0) => f
    }.getOrElse(sys.error(s"unknown storage pair '${args(0)}'; have " +
      graft.queries.StorageLayout.benchPairs.map(_._1).mkString(", ")))
    val tb = System.nanoTime()
    val read = mk(s, dir)
    val buildS = (System.nanoTime() - tb) / 1e9
    read().count() // warm
    val times = (1 to 5).map { _ =>
      val t0 = System.nanoTime(); read().count()
      (System.nanoTime() - t0) / 1e9
    }.sorted
    println(f"${args(0)}: build=$buildS%.3f read_min=${times.head}%.3f " +
      f"read_median=${times(2)}%.3f")
    read().explain("formatted")
    s.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch driver for certifying individual queries at a given SF
  * outside the ScalaTest harness (kept out of the registry). Usage:
  * runMain graft.tools.DbgRL <sfDir> <q1,q2> [outDir]
  */
object DbgRL {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args(1).split(",").toSeq
      else Seq("q102_sql_merge", "q103_sql_update")
    val outDir = if (args.length > 2) Some(args(2)) else None
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    outDir.foreach { d =>
      val sqls = names.flatMap(n =>
        graft.SparkEntry.oracleSql.get(n).map(n -> _)).toMap
      val json = sqls.map { case (k, v) =>
        "\"" + k + "\":\"" + v.replace("\\", "\\\\")
          .replace("\"", "\\\"").replace("\n", "\\n") + "\""
      }.mkString("{", ",", "}")
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(d, "oracle_sql.json"), json)
    }
    names.foreach { n =>
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      outDir match {
        case Some(d) => df.write.mode("overwrite").parquet(s"$d/$n")
        case None => df.count(): Unit
      }
      println(s"CERT $n " +
        f"sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}

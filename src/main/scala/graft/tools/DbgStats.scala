package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object DbgStats {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dbgstats").toString
    (0 until 1000).map(i => (i.toLong, i * 0.5, s"r$i")).toDF("id", "x", "s")
      .repartitionByRange(4, col("id")).sortWithinPartitions("id")
      .write.format("graft.sources.ManifestTable").option("path", dir)
      .mode("append").save()
    val df = spark.read.format("graft.sources.ManifestTable")
      .option("path", dir).load()
    val st = df.queryExecution.optimizedPlan.stats
    println("ATTRSTATS " + st.attributeStats.toSeq.map { case (a, cs) =>
      s"${a.name}: ndv=${cs.distinctCount} min=${cs.min} max=${cs.max}" })
    println("PLAN " + df.queryExecution.optimizedPlan.getClass.getName)
    spark.stop()
  }
}

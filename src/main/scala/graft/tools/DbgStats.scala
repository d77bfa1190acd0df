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
    val wh = java.nio.file.Files.createTempDirectory("dbgmerge").toString
    spark.conf.set("spark.sql.catalog.g", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.g.warehouse", wh)
    spark.sql("CREATE NAMESPACE g.db")
    spark.sql("CREATE TABLE g.db.t (id BIGINT, v BIGINT, s STRING)")
    (0 until 100).map(i => (i.toLong, i * 10L, s"r$i")).toDF("id", "v", "s")
      .createOrReplaceTempView("src")
    spark.sql("INSERT INTO g.db.t SELECT * FROM src")
    graft.sources.ManifestTable.compact(spark, s"$wh/db/t", 4,
      clusterBy = Seq("id"))
    (5 until 10).map(i => (i.toLong, -7L, "gf")).toDF("id", "v", "s")
      .createOrReplaceTempView("upd")
    println("CONF " + spark.conf.get(
      "spark.sql.optimizer.runtime.rowLevelOperationGroupFilter.enabled"))
    spark.sql("""EXPLAIN COST MERGE INTO g.db.t t USING upd u ON t.id = u.id
      WHEN MATCHED THEN UPDATE SET t.v = u.v, t.s = u.s
      WHEN NOT MATCHED THEN INSERT *""").collect()
      .foreach(r => println(r.getString(0).take(4000)))
    spark.stop()
  }
}

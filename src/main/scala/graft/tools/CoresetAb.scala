package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: A/B the two farthest-point-first formulations at k = 64 on
  * the sf0.1 embeddings table — the RESCAN path (round r rebuilds
  * `least` over all r center literals: O(k²/2 · corpus) distances,
  * plans growing linearly in literals; the pre-round-9 implementation,
  * kept here verbatim as the baseline) vs the INCREMENTAL path now in
  * [[graft.operators.Coreset]] (running min-distance column, one new
  * distance per round, localCheckpoint-truncated lineage:
  * O(k · corpus)). Also asserts the two selections are identical.
  * (`runMain graft.tools.CoresetAb [sfDir] [k]`)
  */
object CoresetAb {

  /** The pre-round-9 rescan implementation, verbatim. */
  private def kCenterRescan(embeddings: DataFrame, idCol: String,
      embCol: String, k: Int): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val base = embeddings
      .select(col(idCol).cast("long").as("id"),
        col(embCol).cast("array<double>").as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      def distTo(center: Array[Double]): Column =
        round(sqrt(aggregate(
          zip_with(col("v"), array(center.map(lit): _*),
            (a, b) => (a - b) * (a - b)),
          lit(0.0), (acc, x) => acc + x)), 6)
      val seed = base.orderBy("id").limit(1)
        .select(col("id"), col("v")).as[(Long, Seq[Double])].head()
      var centers = Vector((seed._1, seed._2.toArray, 0.0))
      while (centers.size < k) {
        val ds = centers.map(c => distTo(c._2))
        val md = if (ds.size == 1) ds.head else least(ds: _*)
        val next = base
          .filter(!col("id").isin(centers.map(_._1): _*))
          .select(col("id"), col("v"), md.as("md"))
          .orderBy(col("md").desc, col("id").asc).limit(1)
          .as[(Long, Seq[Double], Double)].head()
        centers = centers :+ ((next._1, next._2.toArray, next._3))
      }
      centers.zipWithIndex
        .map { case ((id, _, d), i) => (i + 1, id, d) }
        .toDF("sel_round", "id", "dist")
    } finally base.unpersist(): Unit
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val k = if (args.length > 1) args(1).toInt else 64
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val e = s.read.parquet(s"$dir/embeddings.parquet")

    def time(label: String, f: () => Array[(Int, Long, Double)]): Array[(Int, Long, Double)] = {
      val t0 = System.nanoTime()
      val out = f()
      println(f"$label (k=$k): ${(System.nanoTime() - t0) / 1e9}%.2f s")
      out
    }
    import s.implicits._
    def run(df: DataFrame) =
      df.orderBy("sel_round").as[(Int, Long, Double)].collect()
    val inc = time("incremental", () =>
      run(graft.operators.Coreset.kCenter(e, "vec_id", "embedding", k)))
    val rescan = time("rescan    ", () =>
      run(kCenterRescan(e, "vec_id", "embedding", k)))
    require(inc.sameElements(rescan), "selections diverged!")
    println(s"selection-identical across ${inc.length} rounds: OK")
    s.stop()
  }
}

package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, IncrementalDedup}

/** Dev tool: stage-by-stage timing for the p46 probe variants. */
object IncProbeDebug {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val docs = graft.api.Tables.t(s, dir, "documents")
    val p = IncrementalDedup.Params()
    val path = java.nio.file.Files
      .createTempDirectory("graft_incdebug").toString
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val batch = docs.filter(col("doc_id") % 5 === 0)
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"== $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    t("buildIndex")(IncrementalDedup.buildIndex(
      corpus, "doc_id", "text", p, path))

    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(path.getBytes("UTF-8")).take(6).map(b => f"$b%02x").mkString
    val iBandsAll = s.table(s"graft_bands_$md")
    val iSh = s.table(s"graft_sh_$md")

    val bSh = Dedup.shingled(batch, "doc_id", "text", p.shingleSize)
    val bBands = Dedup.bandRows(
      Dedup.minhashSignatures(bSh, p.numHashes), p.numHashes, p.bands)

    def cands(iBands: DataFrame): DataFrame = {
      val cross = bBands.as("x").hint("SHUFFLE_HASH")
        .join(iBands.as("y"),
          col("x.bkey") === col("y.bkey") && col("x.id") =!= col("y.id"))
        .select(least(col("x.id"), col("y.id")).as("id_a"),
          greatest(col("x.id"), col("y.id")).as("id_b"))
      val internal = bBands.as("x").hint("SHUFFLE_HASH")
        .join(bBands.as("y").hint("SHUFFLE_HASH"),
          col("x.bkey") === col("y.bkey") && col("x.id") < col("y.id"))
        .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      cross.unionByName(internal).distinct()
    }
    def verify(c: DataFrame): DataFrame = {
      def lookup(cc: DataFrame, idName: String, tag: String): DataFrame =
        cc.hint("SHUFFLE_HASH")
          .join(iSh.select(col("id").as(idName), col("sh").as(s"i_$tag")),
            Seq(idName), "left")
          .hint("SHUFFLE_HASH")
          .join(bSh.select(col("id").as(idName), col("sh").as(s"b_$tag"))
            .hint("SHUFFLE_HASH"), Seq(idName), "left")
          .withColumn(s"sh_$tag", coalesce(col(s"b_$tag"), col(s"i_$tag")))
          .drop(s"i_$tag", s"b_$tag")
      lookup(lookup(c, "id_a", "a"), "id_b", "b")
        .withColumn("inter",
          size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
        .withColumn("jaccard",
          col("inter") / (size(col("sh_a")) + size(col("sh_b")) - col("inter")))
        .filter(col("jaccard") >= p.threshold)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
        .distinct()
    }

    val keys = t("collect keys")(bBands.select("bkey").distinct()
      .collect().map(_.getInt(0)))
    println(s"   nKeys=${keys.length}")
    val iFiltered = iBandsAll.filter(col("bkey").isin(keys.toSeq: _*))

    t("cands no-filter 1st")(cands(iBandsAll).count())
    t("cands no-filter 2nd")(cands(iBandsAll).count())
    for (n <- Seq(512, 2048, 8192)) {
      val f = iBandsAll.filter(col("bkey").isin(keys.take(n).toSeq: _*))
      t(s"cands filtered k=$n")(cands(f).count())
    }
    t("cands filtered  full")(cands(iFiltered).count())
    t("full  no-filter")(verify(cands(iBandsAll)).count())
    s.stop()
  }
}

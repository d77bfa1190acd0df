package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Fns

/** Similarity search over embedding columns (`array<float>`).
  *
  * Scale design (100 TB): the brute-force path broadcasts the (small)
  * query set against the corpus — the corpus is never shuffled and the
  * scan streams through whole-stage codegen; cost is O(|corpus|·|queries|).
  * The LSH path buckets both sides with sign-random-projections so each
  * query only scores its bucket (plus 1-bit probes): the join is an
  * equi-join on bucket id — no cross product at any scale.
  */
object Similarity {

  /** Exact top-k cosine neighbors per query vector (excluding self).
    * Cosine is rounded to 6dp before ranking so ordering is stable across
    * engines; ties break by neighbor id.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val c = corpus.select(col("vec_id").as("nid"), col("embedding").as("nv"))
    val scored = c.join(broadcast(q), col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        round(Fns.cosineSimilarity(col("qv"), col("nv")), 6).as("cos"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Deterministic ±1 sign-random-projection bucket of an embedding:
    * bit p = sign of sum_d(emb[d] * s(p,d)) where s(p,d) in {-1,+1} comes
    * from the rolling hash of "p:d" — reproducible everywhere, no RNG
    * state. `planes` <= 16 keeps buckets dense enough to rerank.
    */
  private def bucketCol(emb: String, planes: Int, dims: Int) = {
    val bit = (p: Int) => {
      val proj = (0 until dims).map { d =>
        val s = if ((graft.functions.RollingHash31.hash(s"$p:$d") & 1L) == 1L) 1.0 else -1.0
        col(emb).getItem(d).cast("double") * lit(s)
      }.reduce(_ + _)
      when(proj > 0, lit(1L << p)).otherwise(0L)
    }
    (0 until planes).map(bit).reduce(_ + _)
  }

  /** Approximate top-k: LSH bucket join + exact cosine rerank in-bucket.
    * `probe` additionally searches all 1-bit-flipped buckets of the query
    * (multiprobe), trading compute for recall.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      planes: Int = 8, dims: Int = 64, probe: Boolean = true): DataFrame = {
    val c = corpus.select(col("vec_id").as("nid"), col("embedding").as("nv"),
      bucketCol("embedding", planes, dims).as("bucket"))
    val q0 = queries.select(col("vec_id").as("qid"), col("embedding").as("qv"),
      bucketCol("embedding", planes, dims).as("b0"))
    val q =
      if (!probe) q0.select(col("qid"), col("qv"), col("b0").as("bucket"))
      else q0.select(col("qid"), col("qv"),
        explode(array(col("b0") +: (0 until planes).map(p =>
          col("b0").bitwiseXOR(lit(1L << p))): _*)).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        round(Fns.cosineSimilarity(col("qv"), col("nv")), 6).as("cos"))
      .dropDuplicates("qid", "nid")
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** IVF-style approximate top-k: a k-means coarse quantizer (spark.ml,
    * fixed seed) assigns every corpus vector to its nearest centroid;
    * each query searches only its `nprobe` nearest cells, reranked by
    * exact cosine. The classic big-corpus ANN layout: the corpus is
    * partitioned by cell id, a query touches nprobe/nlist of the data.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val spark = corpus.sparkSession
    val c = corpus.select(col("vec_id").as("nid"), col("embedding").as("nv"),
      array_to_vector(col("embedding").cast("array<double>")).as("features"))
    val model = new KMeans().setK(nlist).setSeed(42).setMaxIter(10)
      .fit(c.select("features"))
    val assigned = model.transform(c)
      .select(col("nid"), col("nv"), col("prediction").as("cell"))
    // nprobe nearest centroids per query, by exact distance to centroids
    val centroids = model.clusterCenters.zipWithIndex.map {
      case (v, i) => (i, v.toArray)
    }.toSeq
    val cents = spark.createDataFrame(centroids).toDF("cell", "centroid")
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val qCells = q.crossJoin(broadcast(cents))
      .withColumn("dist", -Fns.cosineSimilarity(col("qv"), col("centroid")))
      .withColumn("cr", row_number().over(
        Window.partitionBy("qid").orderBy(col("dist"), col("cell"))))
      .filter(col("cr") <= nprobe)
      .select("qid", "qv", "cell")
    val scored = assigned.join(broadcast(qCells), Seq("cell"))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        round(Fns.cosineSimilarity(col("qv"), col("nv")), 6).as("cos"))
      .dropDuplicates("qid", "nid")
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** All embedding pairs with cosine >= threshold (near-duplicate pairs
    * in embedding space). Brute force over id_a < id_b; the LSH-bucketed
    * variant above is the scale path.
    */
  def cosineNearDupPairs(embeddings: DataFrame, threshold: Double): DataFrame = {
    val a = embeddings.select(col("vec_id").as("id_a"), col("embedding").as("va"))
    val b = embeddings.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(Fns.cosineSimilarity(col("va"), col("vb")), 6).as("cos"))
      .filter(col("cos") >= threshold)
  }
}

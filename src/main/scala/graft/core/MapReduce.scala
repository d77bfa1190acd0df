package graft.core

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Reference-parity core: the MapReduce programming surface of
  * yifanz01/TDA596-Lab02MapReduce re-expressed on Spark.
  *
  * The reference runs `Map(filename, contents) -> [(k,v)]`, hash-partitions
  * by key, sorts each bucket, groups adjacent equal keys, and calls
  * `Reduce(k, [v...]) -> v'` (/root/reference/mr/worker.go:79-155). Here the
  * whole control plane (RPC scheduler, shuffle files, stage barrier, task
  * retry — /root/reference/mr/coordinator.go) is Spark's DAGScheduler +
  * shuffle service; only the *semantics* are reproduced, with two strict
  * improvements: partial (map-side) aggregation where the reducer is
  * associative, and streaming iterators instead of whole-bucket
  * materialization.
  */
object MapReduce {

  /** Generic mapReduce with the reference's exact UDF shape:
    * mapf: (key, value) => Seq[(k, v)]; reducef: (k, values) => out.
    * Mirrors /root/reference/main/mrworker.go:41,46 type assertions.
    * `groupByKey.mapGroups` reproduces "all values of one key in one call"
    * (/root/reference/mr/worker.go:139-155) without materializing the whole
    * bucket: Spark hands the group as an Iterator.
    */
  def mapReduce[IN, K: org.apache.spark.sql.Encoder, V, OUT](
      ds: Dataset[IN],
      mapf: IN => IterableOnce[(K, V)],
      reducef: (K, Iterator[V]) => OUT)(
      implicit kvEnc: org.apache.spark.sql.Encoder[(K, V)],
      outEnc: org.apache.spark.sql.Encoder[(K, OUT)]): Dataset[(K, OUT)] =
    ds.flatMap(mapf)(kvEnc)
      .groupByKey(_._1)
      .mapGroups((k, it) => (k, reducef(k, it.map(_._2))))

  /** Go `strings.FieldsFunc(contents, !unicode.IsLetter)` parity
    * (/root/reference/mrapps/wc.go:21-31): split on any non-letter rune,
    * keep case, drop empties. Java `\p{L}` tracks the same Unicode
    * general category L as Go's `unicode.IsLetter`.
    */
  val tokenSeparator = "[^\\p{L}]+"

  /** Word count (/root/reference/mrapps/wc.go) as a declarative plan:
    * scan -> generator (flatMap) -> shuffle on word -> hash agg. Spark adds
    * map-side partial counts the reference lacks (every ("w","1") crossed
    * its shuffle; see /root/reference/mr/worker.go:80-95).
    */
  def wordCount(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(split(col(textCol), tokenSeparator)).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))

  /** Inverted index (the absent-but-intended `mrapps/indexer.go`; inferred
    * from /root/reference/main/test-mr.sh:64,117-144): word ->
    * (#distinct docs, sorted distinct doc list).
    */
  def invertedIndex(docs: DataFrame, textCol: String, docIdCol: String): DataFrame =
    docs
      .select(col(docIdCol).cast("string").as("doc"),
        explode(split(col(textCol), tokenSeparator)).as("word"))
      .filter(length(col("word")) > 0)
      .distinct()
      .groupBy("word")
      .agg(count(lit(1)).as("ndocs"),
        concat_ws(",", sort_array(collect_set(col("doc")))).as("doclist"))

  /** Whole-file text source parity (/root/reference/mr/coordinator.go:86-97):
    * each file becomes one row (filename, contents).
    */
  def wholeTextFiles(spark: SparkSession, glob: String): DataFrame =
    spark.read.option("wholetext", "true").text(glob)
      .withColumn("filename", input_file_name())
      .withColumnRenamed("value", "contents")

  /** RDD-flavored core (SURVEY.md §1.5): the literal reference dataflow —
    * wholeTextFiles ≙ O1, flatMap(mapf) ≙ O2, hash partition + per-key
    * reduce ≙ O4–O8 — on the RDD API. `reduceByKey` map-side-combines,
    * which the reference lacked (every KV crossed its shuffle). Kept for
    * the rare per-partition imperative case; the DataFrame surface above
    * is the engine's real path (codegen + Catalyst).
    */
  def mapReduceRdd[K: scala.reflect.ClassTag, V: scala.reflect.ClassTag](
      spark: SparkSession, glob: String,
      mapf: (String, String) => Seq[(K, V)],
      reducef: (V, V) => V,
      numPartitions: Int = 0): org.apache.spark.rdd.RDD[(K, V)] = {
    val files = spark.sparkContext.wholeTextFiles(glob)
    val mapped = files.flatMap { case (name, contents) => mapf(name, contents) }
    if (numPartitions > 0) mapped.reduceByKey(
      new org.apache.spark.HashPartitioner(numPartitions), reducef)
    else mapped.reduceByKey(reducef)
  }
}

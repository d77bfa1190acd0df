package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.Fns

/** Dev tool: A/B the decontamination gram-stream formulations —
  * `explode(shingle_array(...))` (materializes each doc's gram array)
  * vs the `shingle_rows` Generator (streams grams row-by-row). Both
  * feed the p17 join+count shape on the sf0.1 documents table.
  * (`runMain graft.tools.MicroBench [sfDir]`)
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val docs = graft.api.Tables.t(s, dir, "documents")
    val train = docs.filter(col("doc_id") % 20 =!= 0)
    val eval = docs.filter(col("doc_id") % 20 === 0)
    val evalGrams = eval
      .select(Fns.shingleRows(Fns.tokens(col("text")), 4).as("gram"))
      .distinct()

    def overlap(grams: org.apache.spark.sql.DataFrame) =
      grams.join(broadcast(evalGrams), Seq("gram"))
        .groupBy("id").agg(count(lit(1)).as("n_overlap"))

    val viaArray = () => overlap(train.select(col("doc_id").as("id"),
      explode(Fns.shingles(Fns.tokens(col("text")), 4)).as("gram"))).count()
    val viaGenerator = () => overlap(train.select(col("doc_id").as("id"),
      Fns.shingleRows(Fns.tokens(col("text")), 4).as("gram"))).count()

    def time(label: String, f: () => Long): Unit = {
      f() // warm
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
      }
      println(f"$label: min ${runs.min}%.3f s  median ${runs.sorted.apply(1)}%.3f s")
    }
    time("explode(shingle_array)", viaArray)
    time("shingle_rows generator", viaGenerator)
    s.stop()
  }
}

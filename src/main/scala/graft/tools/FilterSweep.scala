package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: sweep every registered query's physical plan for EXPENSIVE
  * expressions that predicate pushdown has copied into a data-source
  * Filter (the p02/p73 round-18 finding: `isnotnull(minhash_sigs(...))`
  * / `size(bpe_encode_array(...)) > 0` re-ran a full encode per row
  * inside the scan). Prints query -> matched filter fragment.
  * (`runMain graft.tools.FilterSweep [sfDir]`)
  */
object FilterSweep {
  private val Expensive = Seq("minhash_sigs", "bpe_encode", "wordpiece",
    "shingle_array", "shingle_rows", "sign_projections", "simhash",
    "array_int_dot", "cosine_similarity", "bloom_might_contain",
    "zorder_key", "fnv1a32", "rolling_hash31")

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val s = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    graft.api.Registry.all.foreach { q =>
      try {
        val plan = q.run(s, dir).queryExecution.executedPlan
        val hits = plan.collect {
          case f: org.apache.spark.sql.execution.FilterExec
              if Expensive.exists(f.condition.toString.contains) =>
            "Filter: " + f.condition.toString.take(160)
          case sc: org.apache.spark.sql.execution.FileSourceScanExec
              if Expensive.exists(e =>
                sc.dataFilters.exists(_.toString.contains(e))) =>
            "ScanFilter: " + sc.dataFilters.mkString(";").take(160)
        }
        // a Filter DIRECTLY above the project that computes the value is
        // fine (single eval); the smell is the same expensive call
        // appearing in BOTH a filter and a projection — report all hits
        // and eyeball
        if (hits.nonEmpty)
          println(s"${q.name}\n  " + hits.distinct.mkString("\n  "))
      } catch { case e: Throwable =>
        System.err.println(s"[sweep] ${q.name} failed: ${e.getMessage}")
      }
    }
    s.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession

/** Sweep every registered query's physical plan for EXPENSIVE
  * expressions that predicate pushdown has copied into a data-source
  * Filter (the p02/p73 round-18 finding: `isnotnull(minhash_sigs(...))`
  * / `size(bpe_encode_array(...)) > 0` re-ran a full encode per row
  * inside the scan). Round-19: the sweep is part of the TEST GATE
  * (PlanHygieneSpec — the round-18 repo-wide result was zero hits, so
  * any new hit is a regression to investigate), and stays runnable as
  * a dev tool for eyeballing (`runMain graft.tools.FilterSweep
  * [sfDir]`).
  */
object FilterSweep {
  private val Expensive = Seq("minhash_sigs", "bpe_encode", "wordpiece",
    "shingle_array", "shingle_rows", "sign_projections", "simhash",
    "array_int_dot", "cosine_similarity", "bloom_might_contain",
    "zorder_key", "fnv1a32", "rolling_hash31", "sq_dist")

  /** (query, filter fragments) for every registered query whose
    * executed plan carries an expensive expression inside a FilterExec
    * condition or a scan's data filters. Queries whose plan fails to
    * build are reported under "[failed] <name>" so a sweep can never
    * silently skip.
    */
  def sweep(s: SparkSession, dir: String): Seq[(String, Seq[String])] =
    graft.api.Registry.all.flatMap { q =>
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
        if (hits.nonEmpty) Some(q.name -> hits.distinct) else None
      } catch { case e: Throwable =>
        Some(s"[failed] ${q.name}" -> Seq(String.valueOf(e.getMessage)))
      }
    }

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
    sweep(s, dir).foreach { case (name, hits) =>
      println(s"$name\n  " + hits.mkString("\n  "))
    }
    s.stop()
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame

/** The engine's ONE way to eagerly materialize a shared intermediate
  * frame (round-19, verdict ask #9). The hot paths — the minhash
  * shingle frame, the connected-components edge/label frames, the e2e
  * chain's fan-out frames, p84's audio fingerprints — cut lineage with
  * an EAGER `localCheckpoint`, which is the right §5 tool locally but
  * is executor-block-backed and NOT fault-tolerant: on a cluster, a
  * lost executor loses its blocks and fails the job instead of
  * recomputing lineage.
  *
  * [[cut]] is the escape hatch: with
  * `spark.graft.checkpoint.reliable=true` (plus a configured
  * `SparkContext.setCheckpointDir`, e.g. an HDFS/S3 path) every such
  * site becomes a storage-backed `Dataset.checkpoint` — same eager
  * semantics, same plan truncation, survives executor loss at the cost
  * of a write to reliable storage. The default stays `localCheckpoint`
  * so single-box runs (and the bench) pay no storage round-trip.
  *
  * Both forms execute the frame's jobs EAGERLY at construction time —
  * callers composing plans without running them should build the plan
  * before reaching these operators (the documented
  * minhashNearDupPairs / Chain contract).
  */
object Materialize {

  /** Config knob: storage-backed (reliable) checkpoints instead of
    * executor-local ones. Cluster deployments set this true.
    */
  val ReliableKey = "spark.graft.checkpoint.reliable"

  /** Eagerly materialize `df`, truncating lineage: `localCheckpoint`
    * by default, `checkpoint` (reliable, requires a checkpoint dir)
    * when [[ReliableKey]] is true.
    */
  def cut(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    if (spark.conf.get(ReliableKey, "false").toBoolean) {
      require(spark.sparkContext.getCheckpointDir.isDefined,
        s"$ReliableKey=true needs SparkContext.setCheckpointDir " +
          "(a reliable-storage path) — reliable checkpoints write there")
      df.checkpoint(eager = true)
    } else df.localCheckpoint(eager = true)
  }
}

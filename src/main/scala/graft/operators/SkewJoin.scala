package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the manual fallback when AQE's
  * skew-join splitting isn't available (e.g. bucketed tables, or
  * deliberately pinned partitioning).
  *
  * Mechanics: the skewed (large, hot-keyed) side gets a random salt in
  * [0, salts); the small side is replicated `salts` times via explode;
  * the join key becomes (key, salt), spreading each hot key over `salts`
  * reducers. Correctness is unchanged — every (row, match) pair still
  * meets exactly once, because each large-side row carries one salt and
  * the small side covers all salts.
  *
  * Scale: at 1000 executors a single hot key (power-law user, null-ish
  * default value) otherwise serializes the whole stage on one task; with
  * salts=32 the hot key's work spreads 32 ways at the cost of a 32×
  * replication of the SMALL side only.
  */
object SkewJoin {

  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      salts: Int = 16): DataFrame = {
    val salted = large.withColumn("__salt",
      (rand(seed = 42) * salts).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Distributed heavy hitters (frequent items): per-partition Misra-Gries
  * summaries followed by an exact recount of the surviving candidates —
  * the standard two-pass shape (Misra-Gries 1982; the "MG + rescan"
  * variant of Cormode-Hadjieleftheriou, VLDB 2008).
  *
  * Scale design: pass 1 streams every partition through a bounded
  * `capacity`-entry counter map (mapPartitions — genuine per-partition
  * imperative logic, the brief's carve-out for RDD-style code) and emits
  * at most `capacity` candidate keys per partition; nothing resembling
  * the raw rows is ever shuffled. Pass 2 broadcast-semi-joins the corpus
  * down to candidate rows and exactly counts only those. At 100 TB the
  * shuffle volume is O(partitions x capacity), independent of row count.
  *
  * Exactness contract: a key whose partition-local count exceeds
  * N_partition / capacity always survives Misra-Gries, so the result is
  * the EXACT top-k whenever each true top-k key is that frequent in at
  * least one partition — trivially true when a partition's distinct-key
  * count is <= capacity (the oracle fixture's regime), and true for any
  * genuinely heavy key at any scale. Below that threshold the output
  * degrades gracefully to approximate top-k (MG error N_p / capacity).
  */
object HeavyHitters {

  /** Top-k most frequent values of `keyCol` (ties broken by key value
    * ascending), computed with bounded per-partition state.
    */
  def topK(df: DataFrame, keyCol: String, k: Int, capacity: Int = 4096): DataFrame = {
    require(k >= 1 && capacity >= k,
      s"need capacity >= k >= 1, got k=$k capacity=$capacity")
    val spark = df.sparkSession
    val keys = df.select(col(keyCol))
    val keyType = keys.schema.head.dataType
    // pass 1: Misra-Gries per partition -> candidate keys (Row-encoded so
    // the operator stays generic over the key type)
    val candidateRows = keys.rdd.mapPartitions { it =>
      val counts = new java.util.HashMap[Any, Long](capacity * 2)
      it.foreach { row =>
        val key = row.get(0)
        if (key != null) {
          val c = counts.getOrDefault(key, 0L)
          if (c > 0L) counts.put(key, c + 1)
          else if (counts.size < capacity) counts.put(key, 1L)
          else { // decrement-all: drop zeroed entries
            val e = counts.entrySet().iterator()
            while (e.hasNext) {
              val en = e.next()
              if (en.getValue == 1L) e.remove() else en.setValue(en.getValue - 1)
            }
          }
        }
      }
      val ks = counts.keySet().iterator()
      new Iterator[Row] {
        def hasNext = ks.hasNext
        def next() = Row(ks.next())
      }
    }
    val candidates = spark.createDataFrame(candidateRows,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(keyCol, keyType))))
      .distinct()
    // pass 2: exact recount of candidate rows only
    keys.join(broadcast(candidates), Seq(keyCol), "left_semi")
      .groupBy(keyCol)
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col(keyCol))
      .limit(k)
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Contiguous global row ids (0..n-1) in key order — the "assign stable
  * doc ids to the corpus" primitive. Spark's own
  * `row_number() OVER (ORDER BY key)` is correct but collapses the whole
  * dataset onto ONE reducer (Exchange SinglePartition — the canonical
  * 100 TB plan failure); `monotonically_increasing_id` scales but is
  * neither contiguous nor order-aligned.
  *
  * Scale design: range-repartition + local sort by key (Spark's ordinary
  * distributed sort — the same machinery as orderBy), then
  * `RDD.zipWithIndex` — a per-partition count job (one long per
  * partition) whose cumulative offsets are added while streaming.
  *
  * The count pass and the data pass MUST run on one RDD lineage (as
  * zipWithIndex does), not on two executions of the DataFrame:
  * repartitionByRange samples its boundaries with an rdd.id-seeded
  * sampler, so two separate executions of the same plan can draw
  * DIFFERENT boundaries, and offsets computed against one layout applied
  * to the other scatter duplicate/missing ids (IdAssignSpec's seeded
  * property test catches exactly this). Sharing the lineage also reuses
  * the sort's shuffle files across the two jobs.
  *
  * Ids equal the global rank in key order, so they are independent of
  * the (execution-specific) boundary draw whenever `key` is unique —
  * pass a unique key for a total order.
  */
object IdAssign {

  /** Append `idColName` with contiguous longs 0..n-1 ordered by `key`. */
  def contiguousIds(df: DataFrame, key: Column, idColName: String): DataFrame = {
    val spark = df.sparkSession
    require(!df.columns.contains(idColName), s"column $idColName already exists")
    val numParts = spark.sessionState.conf.numShufflePartitions
    val sorted = df.repartitionByRange(numParts, key).sortWithinPartitions(key)
    val outSchema = StructType(sorted.schema.fields :+
      StructField(idColName, LongType, nullable = false))
    val withIds = sorted.rdd.zipWithIndex.map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ i)
    }
    spark.createDataFrame(withIds, outSchema)
  }

  /** The naive single-reducer formulation — kept as the plan
    * counter-example (IdAssignSpec asserts it carries an Exchange
    * SinglePartition that [[contiguousIds]] does not).
    */
  def contiguousIdsNaive(df: DataFrame, key: Column, idColName: String): DataFrame =
    df.withColumn(idColName,
      row_number().over(Window.orderBy(key)).cast("long") - 1L)
}

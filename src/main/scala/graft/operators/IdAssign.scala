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
  * distributed sort — the same machinery as orderBy), then a
  * zipWithIndex-style two-phase pass: a per-partition count job (tiny:
  * one long per partition, the exact scheme RDD.zipWithIndex uses), the
  * cumulative offsets broadcast back as a plan literal, and a
  * mapPartitions that adds `offset(pid) + local index` while streaming.
  * Per-partition counts are the ONLY driver-side materialization —
  * bounded by partition count, like AQE's own stage statistics.
  */
object IdAssign {

  /** Append `idColName` with contiguous longs 0..n-1 ordered by `key`
    * (ties broken arbitrarily but deterministically for a fixed layout;
    * pass a unique key for a total order).
    */
  def contiguousIds(df: DataFrame, key: Column, idColName: String): DataFrame = {
    val spark = df.sparkSession
    require(!df.columns.contains(idColName), s"column $idColName already exists")
    val sorted = df.repartitionByRange(key).sortWithinPartitions(key)
    // tiny job: one count per partition (same scheme as RDD.zipWithIndex)
    val counts = sorted.groupBy(spark_partition_id().as("pid"))
      .agg(count(lit(1)).as("n"))
      .orderBy("pid")
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    val offsets = new Array[Long](counts.map(_._1).foldLeft(0)(math.max) + 2)
    var acc = 0L
    counts.foreach { case (pid, n) => offsets(pid) = acc; acc += n }
    val bcast = spark.sparkContext.broadcast(offsets)
    val outSchema = StructType(sorted.schema.fields :+
      StructField(idColName, LongType, nullable = false))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    sorted.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      var i = bcast.value(pid)
      it.map { r =>
        val out = Row.fromSeq(r.toSeq :+ i)
        i += 1
        out
      }
    }(enc)
  }

  /** The naive single-reducer formulation — kept as the plan
    * counter-example (IdAssignSpec asserts it carries an Exchange
    * SinglePartition that [[contiguousIds]] does not).
    */
  def contiguousIdsNaive(df: DataFrame, key: Column, idColName: String): DataFrame =
    df.withColumn(idColName,
      row_number().over(Window.orderBy(key)).cast("long") - 1L)
}

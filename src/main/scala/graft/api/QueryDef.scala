package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine query: a Spark implementation plus, when SQL-expressible, a
  * DuckDB oracle over the same parquet tables (registered as views named
  * `lineitem`, `orders`, ... by the driver).
  *
  * Conventions that keep the driver's hash-compare stable:
  *   - every query ends in a total-order `orderBy` and the oracle carries
  *     the same `ORDER BY`;
  *   - computed columns are aliased identically on both sides;
  *   - floating aggregates are rounded on both sides.
  *
  * `bench = true` marks headline queries timed by [[graft.Bench]] at sf0.1
  * (the LEGACY group, unchanged since round 1 for round-over-round
  * comparability); `benchExt = true` marks the EXTENDED bench group
  * covering the newer surface (reported as a separate total).
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    bench: Boolean = false,
    benchExt: Boolean = false)

package graft.queries

import org.apache.spark.sql.functions._
import graft.api.{QueryDef, Tables}
import graft.operators.RangeJoin

/** Scale-path relational operators added in round 4: joins and layout
  * primitives whose naive plans stop working around the 100 TB mark, each
  * re-planned into a shuffle-linear form.
  */
object RelationalScale {

  val defs: Seq[QueryDef] = Seq(

    // --- binned range join: lineitems shipped inside each urgent order's
    //     7-day fulfilment window — NO equi key, so Spark's native plan is
    //     a BroadcastNestedLoopJoin scanning every (point, interval) pair.
    //     RangeJoin.binnedIntervalJoin turns it into an equi-join on an
    //     8-day bin id (each interval covers at most 2 bins), shuffled and
    //     linear. RangeJoinSpec pins the no-BNLJ plan shape; the oracle is
    //     the plain quadratic range join in DuckDB (its IEJoin handles the
    //     sf0.01 pair count fine). ---
    QueryDef(
      "q47_binned_range_join",
      (s, dir) => {
        val day0 = to_date(lit("1970-01-01"))
        val orders = Tables.t(s, dir, "orders")
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_orderkey"),
            datediff(to_date(col("o_orderdate")), day0).cast("long").as("lo"))
          .withColumn("hi", col("lo") + 7L)
        val ships = Tables.t(s, dir, "lineitem")
          .filter(col("l_returnflag") === "R")
          .select(datediff(to_date(col("l_shipdate")), day0)
            .cast("long").as("ship_day"))
        RangeJoin.binnedIntervalJoin(ships, orders, "ship_day", "lo", "hi",
            binWidth = 8L)
          .groupBy("o_orderkey")
          .agg(count(lit(1)).as("n_shipped"))
          .orderBy("o_orderkey")
      },
      Some(
        """SELECT o.o_orderkey, count(*) AS n_shipped
          |FROM orders o JOIN lineitem l
          |  ON datediff('day', DATE '1970-01-01', l.l_shipdate)
          |       BETWEEN datediff('day', DATE '1970-01-01', o.o_orderdate)
          |           AND datediff('day', DATE '1970-01-01', o.o_orderdate) + 7
          |WHERE o.o_orderpriority = '1-URGENT' AND l.l_returnflag = 'R'
          |GROUP BY o.o_orderkey ORDER BY o.o_orderkey""".stripMargin))
  )
}

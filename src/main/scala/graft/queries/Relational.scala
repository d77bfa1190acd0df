package graft.queries

import org.apache.spark.sql.functions._
import graft.api.{QueryDef, Tables}

/** Relational operator inventory (SURVEY.md §2.4): scans, projection,
  * filters, every join shape, aggregation, windows, sort/limit. All ABSENT
  * in the reference (which has exactly one query shape,
  * /root/reference/mr/worker.go:79-155); expressed Spark-first so Catalyst
  * does pushdown/pruning/join-selection and AQE handles runtime re-planning.
  *
  * Scale notes (100 TB design): dimension joins (`region`,`nation`,
  * `customer`,`supplier`,`part`) are explicitly `broadcast()` — no shuffle
  * of the fact table; fact-fact joins (`lineitem`⋈`orders`) shuffle on the
  * join key once and aggregate partially before the exchange.
  */
object Relational {

  val defs: Seq[QueryDef] = Seq(

    // --- aggregation: hash agg with partial/final split (TPC-H Q1 shape) ---
    QueryDef(
      "q01_pricing_summary",
      (s, dir) => Tables.t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
          round(round(sum("l_quantity"), 2) / count(lit(1)), 6).as("avg_qty"),
          round(round(sum("l_extendedprice"), 2) / count(lit(1)), 6).as("avg_price"),
          round(round(sum("l_discount"), 4) / count(lit(1)), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some(
        """SELECT l_returnflag, l_linestatus,
          |  round(sum(l_quantity), 2) AS sum_qty,
          |  round(sum(l_extendedprice), 2) AS sum_base_price,
          |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
          |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
          |  round(round(sum(l_quantity), 2) / count(*), 6) AS avg_qty,
          |  round(round(sum(l_extendedprice), 2) / count(*), 6) AS avg_price,
          |  round(round(sum(l_discount), 4) / count(*), 6) AS avg_disc,
          |  count(*) AS count_order
          |FROM lineitem
          |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
          |GROUP BY l_returnflag, l_linestatus
          |ORDER BY l_returnflag, l_linestatus""".stripMargin),
      bench = true),

    // --- projection + predicate pushdown (filters reach the parquet scan) ---
    QueryDef(
      "q02_filter_project",
      (s, dir) => Tables.t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1998-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1999-01-01").cast("timestamp") &&
          col("l_quantity") >= 45)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber"),
      Some(
        """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
          |FROM lineitem
          |WHERE l_shipdate >= TIMESTAMP '1998-01-01'
          |  AND l_shipdate <  TIMESTAMP '1999-01-01'
          |  AND l_quantity >= 45
          |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // --- broadcast (map-side) join: small dim × big fact, no fact shuffle ---
    QueryDef(
      "q03_segment_revenue",
      (s, dir) => {
        val c = Tables.t(s, dir, "customer")
        val o = Tables.t(s, dir, "orders")
        o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .groupBy("c_mktsegment")
          .agg(round(sum("o_totalprice"), 2).as("revenue"),
            count(lit(1)).as("n_orders"))
          .orderBy("c_mktsegment")
      },
      Some(
        """SELECT c_mktsegment,
          |  round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
          |FROM orders JOIN customer ON o_custkey = c_custkey
          |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin),
      bench = true),

    // --- fact-fact shuffle join (SMJ/shuffled-hash; Catalyst+AQE decide) ---
    QueryDef(
      "q04_priority_revenue",
      (s, dir) => {
        val li = Tables.t(s, dir, "lineitem")
        val o = Tables.t(s, dir, "orders")
        li.join(o, li("l_orderkey") === o("o_orderkey"))
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n_lines"),
            round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
          .orderBy("o_orderpriority")
      },
      Some(
        """SELECT o_orderpriority, count(*) AS n_lines,
          |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
          |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),
      bench = true),

    // --- 6-table star join (TPC-H Q5 shape): local-supplier revenue/nation ---
    QueryDef(
      "q05_region_revenue",
      (s, dir) => {
        val c = Tables.t(s, dir, "customer")
        val o = Tables.t(s, dir, "orders")
        val li = Tables.t(s, dir, "lineitem")
        val su = Tables.t(s, dir, "supplier")
        val n = Tables.t(s, dir, "nation")
        val r = Tables.t(s, dir, "region")
        li.join(o, li("l_orderkey") === o("o_orderkey"))
          .join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .join(broadcast(su), li("l_suppkey") === su("s_suppkey") &&
            c("c_nationkey") === su("s_nationkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .filter(r("r_name") === "ASIA" &&
            o("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            o("o_orderdate") < lit("1998-01-01").cast("timestamp"))
          .groupBy("n_name")
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
          .orderBy("n_name")
      },
      Some(
        """SELECT n_name,
          |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
          |FROM lineitem
          |JOIN orders   ON l_orderkey = o_orderkey
          |JOIN customer ON o_custkey = c_custkey
          |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          |JOIN nation   ON c_nationkey = n_nationkey
          |JOIN region   ON n_regionkey = r_regionkey
          |WHERE r_name = 'ASIA'
          |  AND o_orderdate >= TIMESTAMP '1996-01-01'
          |  AND o_orderdate <  TIMESTAMP '1998-01-01'
          |GROUP BY n_name ORDER BY n_name""".stripMargin),
      bench = true),

    // --- left-semi join (EXISTS) ---
    QueryDef(
      "q06_semi_join",
      (s, dir) => {
        val c = Tables.t(s, dir, "customer")
        val o = Tables.t(s, dir, "orders")
          .filter(col("o_totalprice") > 400000)
        c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
          .select("c_custkey", "c_name")
          .orderBy("c_custkey")
      },
      Some(
        """SELECT c_custkey, c_name FROM customer
          |WHERE EXISTS (SELECT 1 FROM orders
          |              WHERE o_custkey = c_custkey AND o_totalprice > 400000)
          |ORDER BY c_custkey""".stripMargin)),

    // --- left-anti join (NOT EXISTS) ---
    QueryDef(
      "q07_anti_join",
      (s, dir) => {
        val c = Tables.t(s, dir, "customer")
        val o = Tables.t(s, dir, "orders")
          .filter(col("o_totalprice") > 300000)
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .select("c_custkey", "c_name", "c_acctbal")
          .orderBy("c_custkey")
      },
      Some(
        """SELECT c_custkey, c_name, c_acctbal FROM customer
          |WHERE NOT EXISTS (SELECT 1 FROM orders
          |                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
          |ORDER BY c_custkey""".stripMargin)),

    // --- global sort + limit (top-k; Spark uses TakeOrderedAndProject) ---
    QueryDef(
      "q08_top10_orders",
      (s, dir) => Tables.t(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10),
      Some(
        """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
          |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin)),

    // --- ranking window: top-3 orders per customer ---
    QueryDef(
      "q09_topk_per_customer",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        Tables.t(s, dir, "orders")
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3)
          .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
          .orderBy("o_custkey", "rk")
      },
      Some(
        """SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
          |  SELECT o_custkey, o_orderkey, o_totalprice,
          |    CAST(row_number() OVER (PARTITION BY o_custkey
          |         ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rk
          |  FROM orders) t
          |WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin),
      bench = true),

    // --- analytic window: running sum + lag/lead over order history ---
    QueryDef(
      "q10_running_totals",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        val wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.t(s, dir, "orders")
          .filter(col("o_custkey") < 100)
          .select(col("o_custkey"), col("o_orderkey"),
            round(sum("o_totalprice").over(wf), 2).as("running_spend"),
            round(lag("o_totalprice", 1).over(w), 2).as("prev_price"),
            round(lead("o_totalprice", 1).over(w), 2).as("next_price"),
            row_number().over(w).as("order_seq"))
          .orderBy("o_custkey", "order_seq")
      },
      Some(
        """SELECT o_custkey, o_orderkey,
          |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
          |    ORDER BY o_orderdate, o_orderkey
          |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend,
          |  round(lag(o_totalprice, 1) OVER (PARTITION BY o_custkey
          |    ORDER BY o_orderdate, o_orderkey), 2) AS prev_price,
          |  round(lead(o_totalprice, 1) OVER (PARTITION BY o_custkey
          |    ORDER BY o_orderdate, o_orderkey), 2) AS next_price,
          |  CAST(row_number() OVER (PARTITION BY o_custkey
          |    ORDER BY o_orderdate, o_orderkey) AS INT) AS order_seq
          |FROM orders WHERE o_custkey < 100
          |ORDER BY o_custkey, order_seq""".stripMargin))
  )
}

package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.api.{QueryDef, Tables}

/** Round-5 analytics additions: warehouse temporal modeling (SCD2),
  * Spark's LATERAL correlated-subquery surface, regression aggregates,
  * the Spark 4 DataSketches HLL family, and sequence analytics over the
  * events stream. Same conventions as the other registries (total-order
  * output, identical aliases both engines, floats rounded both sides).
  */
object RelationalAnalytics {

  // One SQL text, two engines: WITH RECURSIVE (Spark 4's recursive CTE)
  // walking the implicit binary tree parent(s) = floor(s/2) over
  // suppliers — every node's chain to the root, reduced to its depth.
  // Arithmetic recursion terminates structurally (cur strictly halves),
  // so no cycle guard is needed; only engine-portable constructs
  // (CAST(floor(x/2)), UNION ALL) appear in the text.
  private val recursiveSql =
    """WITH RECURSIVE chain(node, cur, steps) AS (
      |  SELECT s_suppkey, s_suppkey, 0 FROM supplier
      |  UNION ALL
      |  SELECT node, CAST(floor(cur / 2) AS BIGINT), steps + 1
      |  FROM chain WHERE cur > 1)
      |SELECT node, max(steps) AS depth
      |FROM chain GROUP BY node ORDER BY node""".stripMargin

  // One SQL text, two engines (q26 pattern): LATERAL correlated subquery
  // with per-row ORDER BY + LIMIT — Catalyst decorrelates it into a
  // ranked window join rather than executing the subquery per row.
  private val lateralSql =
    """SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
      |FROM customer c,
      |  LATERAL (SELECT o_orderkey, o_totalprice FROM orders
      |           WHERE o_custkey = c.c_custkey
      |           ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) o
      |ORDER BY c.c_custkey""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // --- SCD Type-2 dimension build: turn an append-only changelog
    //     (orders as status observations per customer) into validity
    //     intervals [eff_from, eff_to) + is_current — the warehouse
    //     temporal-modeling primitive. One window shuffle on the key;
    //     at 100 TB this is the same single-exchange shape as q53. ---
    QueryDef(
      "q62_scd2_build",
      (s, dir) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        Tables.t(s, dir, "orders")
          .select(col("o_custkey"), col("o_orderkey"), col("o_orderstatus"),
            col("o_orderdate").as("eff_from"))
          .withColumn("eff_to",
            lead(col("eff_from"), 1).over(
              Window.partitionBy("o_custkey")
                .orderBy(col("eff_from"), col("o_orderkey"))))
          .withColumn("is_current", col("eff_to").isNull)
          .orderBy("o_custkey", "eff_from", "o_orderkey")
      },
      Some(
        """WITH v AS (
          |  SELECT o_custkey, o_orderkey, o_orderstatus,
          |    o_orderdate AS eff_from,
          |    lead(o_orderdate) OVER (PARTITION BY o_custkey
          |      ORDER BY o_orderdate, o_orderkey) AS eff_to
          |  FROM orders)
          |SELECT o_custkey, o_orderkey, o_orderstatus, eff_from, eff_to,
          |  (eff_to IS NULL) AS is_current
          |FROM v ORDER BY o_custkey, eff_from, o_orderkey""".stripMargin)),

    // --- LATERAL correlated subquery (SQL:1999 lateral join): top order
    //     per customer expressed as a per-row subquery. Spark
    //     decorrelates to a window + join — no nested-loop execution —
    //     and DuckDB runs the IDENTICAL text. ---
    QueryDef(
      "q63_lateral_join",
      (s, dir) => {
        Tables.register(s, dir, "customer", "orders")
        s.sql(lateralSql)
      },
      Some(lateralSql)),

    // --- regression aggregates per group: slope/intercept/r2 of
    //     extendedprice on quantity. VALUES come from the closed-form
    //     sums (identical expression both engines — engine-internal
    //     accumulation orders differ only past 6dp); Spark's regr_*
    //     builtins are additionally pinned to the formula by a 1e-6
    //     envelope boolean (q42's accuracy-contract pattern). ---
    QueryDef(
      "q64_regression",
      (s, dir) => {
        val x = col("l_quantity"); val y = col("l_extendedprice")
        val agg = Tables.t(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(count(lit(1)).cast("double").as("n"),
            sum(x).as("sx"), sum(y).as("sy"),
            sum(x * y).as("sxy"), sum(x * x).as("sxx"),
            regr_slope(y, x).as("b_slope"))
        agg.select(col("l_returnflag"),
            col("n").cast("long").as("n_rows"),
            round((col("n") * col("sxy") - col("sx") * col("sy")) /
              (col("n") * col("sxx") - col("sx") * col("sx")), 6).as("slope"),
            round((col("sy") - ((col("n") * col("sxy") - col("sx") * col("sy")) /
              (col("n") * col("sxx") - col("sx") * col("sx"))) * col("sx")) /
              col("n"), 6).as("intercept"),
            (abs(col("b_slope") -
              (col("n") * col("sxy") - col("sx") * col("sy")) /
              (col("n") * col("sxx") - col("sx") * col("sx"))) < 1e-6)
              .as("builtin_ok"))
          .orderBy("l_returnflag")
      },
      Some(
        """WITH m AS (
          |  SELECT l_returnflag, count(*)::DOUBLE AS n,
          |    sum(l_quantity) AS sx, sum(l_extendedprice) AS sy,
          |    sum(l_quantity * l_extendedprice) AS sxy,
          |    sum(l_quantity * l_quantity) AS sxx
          |  FROM lineitem GROUP BY l_returnflag)
          |SELECT l_returnflag, n::BIGINT AS n_rows,
          |  round((n*sxy - sx*sy) / (n*sxx - sx*sx), 6) AS slope,
          |  round((sy - ((n*sxy - sx*sy) / (n*sxx - sx*sx)) * sx) / n, 6)
          |    AS intercept,
          |  TRUE AS builtin_ok
          |FROM m ORDER BY l_returnflag""".stripMargin)),

    // --- Spark 4 DataSketches HLL: hll_sketch_agg builds a mergeable
    //     sketch (the cross-system interchange format — the same binary
    //     merges in Druid/Hive/DataSketches-java), hll_sketch_estimate
    //     reads it. Oracle is q15's accuracy contract: the estimate must
    //     land within 5% of DuckDB's exact distinct count. ---
    QueryDef(
      "q65_hll_sketch",
      (s, dir) => Tables.t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(hll_sketch_estimate(
            hll_sketch_agg(col("l_partkey"), lit(12))).as("est"),
          countDistinct(col("l_partkey")).as("exact_parts"))
        .select(col("l_returnflag"), col("exact_parts"),
          (abs(col("est") - col("exact_parts")) <=
            col("exact_parts") * 0.05).as("sketch_ok"))
        .orderBy("l_returnflag"),
      Some(
        """SELECT l_returnflag,
          |  count(DISTINCT l_partkey) AS exact_parts,
          |  TRUE AS sketch_ok
          |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // --- event-sequence transition matrix: count of (event_type -> next
    //     event_type) transitions per user timeline — the Markov-chain /
    //     clickstream primitive. One window shuffle on user_id; the
    //     count agg reuses nothing wider than (type, type) pairs. ---
    QueryDef(
      "q66_event_transitions",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        Tables.t(s, dir, "events")
          .select(col("user_id"), col("event_type"),
            lead(col("event_type"), 1).over(w).as("next_type"))
          .filter(col("next_type").isNotNull)
          .groupBy("event_type", "next_type")
          .agg(count(lit(1)).as("n_transitions"))
          .orderBy("event_type", "next_type")
      },
      Some(
        """WITH t AS (
          |  SELECT event_type,
          |    lead(event_type) OVER (PARTITION BY user_id
          |      ORDER BY ts, event_id) AS next_type
          |  FROM events)
          |SELECT event_type, next_type, count(*) AS n_transitions
          |FROM t WHERE next_type IS NOT NULL
          |GROUP BY event_type, next_type
          |ORDER BY event_type, next_type""".stripMargin)),

    // --- Spark 4 COLLATION surface: grouping under UTF8_LCASE merges
    //     case variants at the COMPARATOR level (hash/sort/equals all
    //     collation-aware) — no normalizing projection in the plan. The
    //     fixture case-mangles c_mktsegment deterministically; the
    //     oracle groups by lower() — same groups, so equal counts prove
    //     the collated comparator semantics. Output key is lowercased
    //     and cast back to a plain string on both sides. ---
    QueryDef(
      "q67_collated_group",
      (s, dir) => {
        val mangled = Tables.t(s, dir, "customer").select(
          when(col("c_custkey") % 2 === 0, lower(col("c_mktsegment")))
            .otherwise(col("c_mktsegment")).as("seg"))
        mangled
          .groupBy(collate(col("seg"), "UTF8_LCASE").as("k"))
          .agg(count(lit(1)).as("n_customers"))
          .select(lower(col("k")).cast("string").as("segment"),
            col("n_customers"))
          .orderBy("segment")
      },
      Some(
        """WITH m AS (SELECT CASE WHEN c_custkey % 2 = 0
          |    THEN lower(c_mktsegment) ELSE c_mktsegment END AS seg
          |  FROM customer)
          |SELECT lower(seg) AS segment, count(*) AS n_customers
          |FROM m GROUP BY 1 ORDER BY 1""".stripMargin)),

    // --- ordered funnel (view -> click -> purchase per user), SINGLE
    //     SHUFFLE: the naive formulation is one self-join per stage;
    //     here each stage is a running min over the SAME window spec
    //     (t1r = earliest view so far; a click qualifies if strictly
    //     after t1r; t2r = earliest qualifying click so far; ...), so
    //     Catalyst stacks the window nodes on one user_id exchange and
    //     the per-user groupBy reuses the same key. RANGE (default)
    //     frames make same-timestamp ties engine-invariant. ---
    QueryDef(
      "q68_funnel",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts")
        val marked = Tables.t(s, dir, "events")
          .select(col("user_id"), col("ts"), col("event_type"))
          .withColumn("t1r",
            min(when(col("event_type") === "view", col("ts"))).over(w))
          .withColumn("t2c",
            when(col("event_type") === "click" && col("ts") > col("t1r"),
              col("ts")))
          .withColumn("t2r", min(col("t2c")).over(w))
          .withColumn("t3c",
            when(col("event_type") === "purchase" && col("ts") > col("t2r"),
              col("ts")))
        marked.groupBy("user_id")
          .agg(min(when(col("event_type") === "view", col("ts"))).as("t1"),
            min("t2c").as("t2"), min("t3c").as("t3"))
          .agg(count("t1").as("n_view"), count("t2").as("n_click"),
            count("t3").as("n_purchase"))
          .orderBy("n_view")
      },
      Some(
        """WITH m AS (
          |  SELECT user_id, ts, event_type,
          |    min(CASE WHEN event_type = 'view' THEN ts END) OVER
          |      (PARTITION BY user_id ORDER BY ts) AS t1r
          |  FROM events),
          |m2 AS (SELECT *, CASE WHEN event_type = 'click' AND ts > t1r
          |         THEN ts END AS t2c FROM m),
          |m3 AS (SELECT *, min(t2c) OVER
          |         (PARTITION BY user_id ORDER BY ts) AS t2r FROM m2),
          |m4 AS (SELECT *, CASE WHEN event_type = 'purchase' AND ts > t2r
          |         THEN ts END AS t3c FROM m3),
          |u AS (SELECT user_id,
          |        min(CASE WHEN event_type = 'view' THEN ts END) AS t1,
          |        min(t2c) AS t2, min(t3c) AS t3
          |      FROM m4 GROUP BY user_id)
          |SELECT count(t1) AS n_view, count(t2) AS n_click,
          |  count(t3) AS n_purchase
          |FROM u ORDER BY n_view""".stripMargin),
      benchExt = true),

    // --- time-weighted average (TWAP): each observation weighted by its
    //     holding duration (epoch seconds to the key's next event); the
    //     final open-ended observation is excluded. One window lead on
    //     the key + a partial/final agg — q57's single-exchange shape. ---
    QueryDef(
      "q69_time_weighted_avg",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        Tables.t(s, dir, "events")
          .select(col("user_id"), col("event_id"), col("ts"), col("value"))
          .withColumn("dur",
            unix_timestamp(lead(col("ts"), 1).over(w)) -
              unix_timestamp(col("ts")))
          .filter(col("dur").isNotNull)
          .groupBy("user_id")
          .agg(round(sum(col("value") * col("dur")) / sum(col("dur")), 6)
              .as("twap"),
            count(lit(1)).as("n_intervals"))
          .orderBy("user_id")
      },
      Some(
        """WITH d AS (
          |  SELECT user_id, value,
          |    CAST(floor(epoch(lead(ts) OVER (PARTITION BY user_id
          |      ORDER BY ts, event_id))) AS BIGINT)
          |    - CAST(floor(epoch(ts)) AS BIGINT) AS dur
          |  FROM events)
          |SELECT user_id,
          |  round(sum(value * dur) / sum(dur), 6) AS twap,
          |  count(*) AS n_intervals
          |FROM d WHERE dur IS NOT NULL
          |GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // --- retention cohort matrix: users grouped by first-active week,
    //     counted per weeks-since-cohort — the product-analytics
    //     staple. (user, week) is made distinct first, so each user
    //     lands at most once per cell and count(*) == count distinct
    //     with no expensive distinct aggregate. Both engines truncate
    //     weeks to ISO Monday. ---
    QueryDef(
      "q70_retention_cohorts",
      (s, dir) => {
        val weeks = Tables.t(s, dir, "events")
          .select(col("user_id"),
            date_trunc("week", col("ts")).cast("date").as("wk"))
          .distinct()
        val cohort = weeks.groupBy("user_id").agg(min("wk").as("cohort_wk"))
        weeks.join(cohort, "user_id")
          .groupBy(col("cohort_wk"),
            floor(datediff(col("wk"), col("cohort_wk")) / 7)
              .cast("int").as("week_n"))
          .agg(count(lit(1)).as("n_active"))
          .orderBy("cohort_wk", "week_n")
      },
      Some(
        """WITH weeks AS (
          |  SELECT DISTINCT user_id, date_trunc('week', ts)::DATE AS wk
          |  FROM events),
          |cohort AS (SELECT user_id, min(wk) AS cohort_wk
          |           FROM weeks GROUP BY user_id)
          |SELECT cohort_wk,
          |  CAST(date_diff('day', cohort_wk, wk) // 7 AS INT) AS week_n,
          |  count(*) AS n_active
          |FROM weeks JOIN cohort USING (user_id)
          |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
      benchExt = true),

    // --- HLL sketch MERGEABILITY (the property that matters at 100 TB):
    //     per-nation customer sketches are built once, then re-aggregated
    //     to region level with hll_union_agg — NO rescan of the base
    //     table, the pre-aggregated-cube / per-day-sketch re-merge path.
    //     A nation's customers are disjoint from other nations', but the
    //     union estimate must hold regardless; q15/q65's accuracy
    //     contract (5% of exact) is the oracle. ---
    QueryDef(
      "q71_hll_merge",
      (s, dir) => {
        val perNation = Tables.t(s, dir, "customer")
          .groupBy("c_nationkey")
          .agg(hll_sketch_agg(col("c_custkey"), lit(12)).as("sk"))
        val nations = Tables.t(s, dir, "nation")
          .select(col("n_nationkey").as("c_nationkey"), col("n_regionkey"))
        perNation.join(broadcast(nations), "c_nationkey")
          .groupBy("n_regionkey")
          .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
          .join(
            Tables.t(s, dir, "customer")
              .join(broadcast(nations), "c_nationkey")
              .groupBy("n_regionkey")
              .agg(countDistinct(col("c_custkey")).as("exact_customers")),
            "n_regionkey")
          .select(col("n_regionkey"), col("exact_customers"),
            (abs(col("est") - col("exact_customers")) <=
              col("exact_customers") * 0.05).as("merge_ok"))
          .orderBy("n_regionkey")
      },
      Some(
        """SELECT n.n_regionkey,
          |  count(DISTINCT c.c_custkey) AS exact_customers,
          |  TRUE AS merge_ok
          |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
          |GROUP BY n.n_regionkey ORDER BY n.n_regionkey""".stripMargin)),

    // --- WITH RECURSIVE (Spark 4 recursive CTE — Catalyst's UnionLoop):
    //     iterative computation declared in SQL instead of a driver-side
    //     loop; DuckDB runs the IDENTICAL text. The graph-iterate
    //     operator family (p14's connected components) uses the Spark
    //     pointer-jumping operator at scale; this pins the SQL surface
    //     itself. ---
    QueryDef(
      "q72_recursive_cte",
      (s, dir) => {
        Tables.register(s, dir, "supplier")
        s.sql(recursiveSql)
      },
      Some(recursiveSql))
  )
}

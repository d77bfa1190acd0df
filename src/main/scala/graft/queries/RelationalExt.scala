package graft.queries

import org.apache.spark.sql.functions._
import graft.api.{QueryDef, Tables}
import graft.operators.{AsOfJoin, Sessionize}

/** Extended relational inventory: multi-dim grouping, set ops, scalar/JSON
  * function surface, theta/range/as-of joins, event-time windows and
  * sessionization (all ABSENT in the reference, SURVEY.md §2.4).
  */
object RelationalExt {

  /** TPC-H Q3 shape in fully-portable SQL: executed verbatim by Spark SQL
    * (temp views) and by the DuckDB oracle — one text, two engines.
    */
  val q26Sql: String =
    """SELECT o_orderkey,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM customer
      |JOIN orders   ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |  AND l_shipdate  > TIMESTAMP '1997-01-01'
      |GROUP BY o_orderkey
      |ORDER BY revenue DESC, o_orderkey
      |LIMIT 10""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // --- rollup (hierarchical grouping). Nulls from the rollup are
    //     coalesced to 'ALL' on both sides to dodge null-ordering skew. ---
    QueryDef(
      "q11_rollup",
      (s, dir) => Tables.t(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(round(sum("l_quantity"), 2).as("sum_qty"),
          count(lit(1)).as("n"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("lstatus"),
          col("sum_qty"), col("n"))
        .orderBy("rflag", "lstatus"),
      Some(
        """SELECT coalesce(l_returnflag, 'ALL') AS rflag,
          |       coalesce(l_linestatus, 'ALL') AS lstatus,
          |       round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
          |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
          |ORDER BY rflag, lstatus""".stripMargin)),

    // --- cube (all grouping combinations) ---
    QueryDef(
      "q12_cube",
      (s, dir) => Tables.t(s, dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(round(sum("o_totalprice"), 2).as("revenue"),
          count(lit(1)).as("n"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("revenue"), col("n"))
        .orderBy("status", "priority"),
      Some(
        """SELECT coalesce(o_orderstatus, 'ALL') AS status,
          |       coalesce(o_orderpriority, 'ALL') AS priority,
          |       round(sum(o_totalprice), 2) AS revenue, count(*) AS n
          |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
          |ORDER BY status, priority""".stripMargin)),

    // --- explicit grouping sets ---
    QueryDef(
      "q13_grouping_sets",
      (s, dir) => {
        val o = Tables.t(s, dir, "orders")
        o.groupingSets(
          Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq()),
          col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n"), round(round(sum("o_totalprice"), 2) / count(lit(1)), 6).as("avg_price"))
          .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
            coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
            col("n"), col("avg_price"))
          .orderBy("status", "priority")
      },
      Some(
        """SELECT coalesce(o_orderstatus, 'ALL') AS status,
          |       coalesce(o_orderpriority, 'ALL') AS priority,
          |       count(*) AS n, round(round(sum(o_totalprice), 2) / count(*), 6) AS avg_price
          |FROM orders
          |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
          |ORDER BY status, priority""".stripMargin)),

    // --- distinct aggregation (exact) ---
    QueryDef(
      "q14_distinct_agg",
      (s, dir) => Tables.t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          round(sum_distinct(col("l_quantity")), 2).as("sum_dist_qty"))
        .orderBy("l_returnflag"),
      Some(
        """SELECT l_returnflag,
          |  count(DISTINCT l_partkey) AS n_parts,
          |  count(DISTINCT l_suppkey) AS n_supps,
          |  round(sum(DISTINCT l_quantity), 2) AS sum_dist_qty
          |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // --- approximate distinct (HLL++). The sketch VALUE can't be
    //     mirrored (engine sketch internals differ), but its accuracy
    //     CONTRACT can: emit the exact count plus a boolean "within the
    //     2%-rsd sketch's 5% envelope" check, which the oracle asserts
    //     as TRUE. HLL++ is deterministic for fixed data, so this is
    //     driver-hashable; the raw sketch value stays covered in
    //     OperatorSpec. ---
    QueryDef(
      "q15_approx_distinct",
      (s, dir) => Tables.t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
          countDistinct(col("l_partkey")).as("exact_parts"))
        .select(col("l_returnflag"), col("exact_parts"),
          (abs(col("approx_parts") - col("exact_parts")) <=
            col("exact_parts") * 0.05).as("approx_ok"))
        .orderBy("l_returnflag"),
      Some(
        """SELECT l_returnflag,
          |  count(DISTINCT l_partkey) AS exact_parts,
          |  TRUE AS approx_ok
          |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // --- set operations: INTERSECT / EXCEPT both directions, tagged ---
    QueryDef(
      "q16_set_ops",
      (s, dir) => {
        val c = Tables.t(s, dir, "customer")
        val o = Tables.t(s, dir, "orders")
        val a = c.filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey").as("custkey"))
        val b = o.filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey").as("custkey")).distinct()
        a.intersect(b).withColumn("op", lit("both"))
          .unionByName(a.except(b).withColumn("op", lit("only_building")))
          .unionByName(b.except(a).withColumn("op", lit("only_urgent")))
          .orderBy("op", "custkey")
      },
      Some(
        """WITH a AS (SELECT c_custkey AS custkey FROM customer
          |           WHERE c_mktsegment = 'BUILDING'),
          |     b AS (SELECT DISTINCT o_custkey AS custkey FROM orders
          |           WHERE o_orderpriority = '1-URGENT')
          |SELECT custkey, 'both' AS op FROM (SELECT * FROM a INTERSECT SELECT * FROM b)
          |UNION ALL
          |SELECT custkey, 'only_building' AS op FROM (SELECT * FROM a EXCEPT SELECT * FROM b)
          |UNION ALL
          |SELECT custkey, 'only_urgent' AS op FROM (SELECT * FROM b EXCEPT SELECT * FROM a)
          |ORDER BY op, custkey""".stripMargin)),

    // --- scalar function surface: string + math ---
    QueryDef(
      "q17_scalar_string_math",
      (s, dir) => Tables.t(s, dir, "customer")
        .filter(col("c_custkey") < 200)
        .select(col("c_custkey"),
          upper(col("c_name")).as("up"),
          substring(col("c_name"), 1, 8).as("sub"),
          length(col("c_name")).as("len"),
          concat_ws("|", col("c_name"), col("c_mktsegment")).as("cat"),
          regexp_extract(col("c_name"), "([0-9]+)", 1).as("digits"),
          instr(col("c_name"), "1").as("pos1"),
          round(abs(col("c_acctbal")), 2).as("ab"),
          round(sqrt(abs(col("c_acctbal"))), 6).as("sq"),
          round(log(abs(col("c_acctbal")) + 1), 6).as("lg"),
          ceil(col("c_acctbal")).as("cl"),
          floor(col("c_acctbal")).as("fl"),
          (col("c_custkey") % 7).as("m7"))
        .orderBy("c_custkey"),
      Some(
        """SELECT c_custkey,
          |  upper(c_name) AS up,
          |  substring(c_name, 1, 8) AS sub,
          |  CAST(length(c_name) AS INT) AS len,
          |  concat_ws('|', c_name, c_mktsegment) AS cat,
          |  regexp_extract(c_name, '([0-9]+)', 1) AS digits,
          |  CAST(strpos(c_name, '1') AS INT) AS pos1,
          |  round(abs(c_acctbal), 2) AS ab,
          |  round(sqrt(abs(c_acctbal)), 6) AS sq,
          |  round(ln(abs(c_acctbal) + 1), 6) AS lg,
          |  CAST(ceil(c_acctbal) AS BIGINT) AS cl,
          |  CAST(floor(c_acctbal) AS BIGINT) AS fl,
          |  c_custkey % 7 AS m7
          |FROM customer WHERE c_custkey < 200 ORDER BY c_custkey""".stripMargin)),

    // --- scalar function surface: dates ---
    QueryDef(
      "q18_scalar_dates",
      (s, dir) => Tables.t(s, dir, "orders")
        .filter(col("o_custkey") < 50)
        .select(col("o_orderkey"),
          year(col("o_orderdate")).as("yr"),
          quarter(col("o_orderdate")).as("qtr"),
          month(col("o_orderdate")).as("mo"),
          dayofmonth(col("o_orderdate")).as("dy"),
          date_trunc("month", col("o_orderdate")).as("mstart"),
          datediff(col("o_orderdate"), lit("1995-01-01").cast("timestamp")).as("days_since"))
        .orderBy("o_orderkey"),
      Some(
        """SELECT o_orderkey,
          |  CAST(date_part('year', o_orderdate) AS INT) AS yr,
          |  CAST(date_part('quarter', o_orderdate) AS INT) AS qtr,
          |  CAST(date_part('month', o_orderdate) AS INT) AS mo,
          |  CAST(date_part('day', o_orderdate) AS INT) AS dy,
          |  date_trunc('month', o_orderdate) AS mstart,
          |  CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INT) AS days_since
          |FROM orders WHERE o_custkey < 50 ORDER BY o_orderkey""".stripMargin)),

    // --- semi-structured: JSON extraction from events.props ---
    QueryDef(
      "q19_json_extract",
      (s, dir) => Tables.t(s, dir, "events")
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k_val"))
        .groupBy((col("k_val") % 10).as("k_mod"))
        .agg(count(lit(1)).as("n"), sum("k_val").as("sum_k"))
        // explicit null position: Spark defaults NULLS FIRST, DuckDB
        // NULLS LAST — a fixture row with no $.k would silently reorder
        .orderBy(col("k_mod").asc_nulls_first),
      Some(
        """SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_mod,
          |       count(*) AS n,
          |       CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k
          |FROM events GROUP BY k_mod ORDER BY k_mod NULLS FIRST""".stripMargin)),

    // --- pure theta join (broadcast nested loop) ---
    QueryDef(
      "q20_theta_join",
      (s, dir) => {
        val su = Tables.t(s, dir, "supplier")
        val n = Tables.t(s, dir, "nation")
        su.join(broadcast(n), su("s_acctbal") > n("n_nationkey") * 1000)
          .groupBy("s_suppkey")
          .agg(count(lit(1)).as("n_below"),
            max("n_nationkey").as("max_nation"))
          .orderBy("s_suppkey")
      },
      Some(
        """SELECT s_suppkey, count(*) AS n_below, max(n_nationkey) AS max_nation
          |FROM supplier JOIN nation ON s_acctbal > n_nationkey * 1000
          |GROUP BY s_suppkey ORDER BY s_suppkey""".stripMargin)),

    // --- range join: error→click funnel within 10 minutes, same user ---
    QueryDef(
      "q21_range_join_funnel",
      (s, dir) => {
        val e = Tables.t(s, dir, "events")
        val errs = e.filter(col("event_type") === "error")
          .select(col("user_id"), col("event_id").as("err_id"), col("ts").as("err_ts"))
        val clicks = e.filter(col("event_type") === "click")
          .select(col("user_id").as("c_user"), col("event_id").as("click_id"), col("ts").as("click_ts"))
        errs.join(clicks,
          col("user_id") === col("c_user") &&
            col("click_ts") > col("err_ts") &&
            col("click_ts") <= col("err_ts") + expr("INTERVAL 10 MINUTES"))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_pairs"), min("err_id").as("first_err"))
          .orderBy("user_id")
      },
      Some(
        """SELECT e.user_id, count(*) AS n_pairs, min(e.event_id) AS first_err
          |FROM events e JOIN events c
          |  ON e.user_id = c.user_id
          | AND c.ts > e.ts AND c.ts <= e.ts + INTERVAL 10 MINUTE
          |WHERE e.event_type = 'error' AND c.event_type = 'click'
          |GROUP BY e.user_id ORDER BY e.user_id""".stripMargin)),

    // --- as-of join: each click joined to latest prior purchase (per user) ---
    QueryDef(
      "q22_asof_join",
      (s, dir) => {
        val e = Tables.t(s, dir, "events")
        val clicks = e.filter(col("event_type") === "click")
          .select("user_id", "ts", "event_id")
        val purchases = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"),
            col("event_id").as("purchase_id"), col("value").as("purchase_value"))
        AsOfJoin.backward(clicks, purchases,
          keys = Seq("user_id"), timeCol = "ts", rightTieBreak = "purchase_id")
          .select(col("event_id"), col("user_id"),
            unix_timestamp(col("ts")).as("ts_epoch"),
            col("purchase_id"), round(col("purchase_value"), 2).as("purchase_value"))
          .orderBy("event_id")
      },
      Some(
        """WITH u AS (
          |  SELECT user_id, ts, event_id, NULL::BIGINT AS purchase_id,
          |         NULL::DOUBLE AS purchase_value, 1 AS side
          |  FROM events WHERE event_type = 'click'
          |  UNION ALL
          |  SELECT user_id, ts, event_id, event_id AS purchase_id,
          |         value AS purchase_value, 0 AS side
          |  FROM events WHERE event_type = 'purchase'),
          |m AS (
          |  SELECT *,
          |    last_value(purchase_id IGNORE NULLS) OVER w AS pid,
          |    last_value(purchase_value IGNORE NULLS) OVER w AS pval
          |  FROM u
          |  WINDOW w AS (PARTITION BY user_id
          |               ORDER BY ts, side, purchase_id NULLS FIRST
          |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
          |SELECT event_id, user_id,
          |       CAST(floor(epoch(ts)) AS BIGINT) AS ts_epoch,
          |       pid AS purchase_id, round(pval, 2) AS purchase_value
          |FROM m WHERE side = 1 ORDER BY event_id""".stripMargin),
      bench = true),

    // --- event-time tumbling window (batch twin of streaming window agg) ---
    QueryDef(
      "q23_tumbling_window",
      (s, dir) => Tables.t(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
        .select(unix_timestamp(col("w.start")).as("win_start"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy("win_start", "event_type"),
      Some(
        """SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS win_start,
          |       event_type, count(*) AS n, round(sum(value), 2) AS sum_value
          |FROM events GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin)),

    // --- sliding window (1h window, 30m slide): each event lands in 2 windows ---
    QueryDef(
      "q24_sliding_window",
      (s, dir) => Tables.t(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
        .agg(count(lit(1)).as("n"), round(round(sum("value"), 2) / count(lit(1)), 6).as("avg_value"))
        .select(unix_timestamp(col("w.start")).as("win_start"),
          col("n"), col("avg_value"))
        .orderBy("win_start"),
      Some(
        """WITH x AS (
          |  SELECT unnest([
          |    CAST(floor(epoch(ts) / 1800) * 1800 AS BIGINT),
          |    CAST(floor(epoch(ts) / 1800) * 1800 - 1800 AS BIGINT)]) AS win_start,
          |    value
          |  FROM events)
          |SELECT win_start, count(*) AS n, round(round(sum(value), 2) / count(*), 6) AS avg_value
          |FROM x GROUP BY win_start ORDER BY win_start""".stripMargin)),

    // --- exact interpolated percentiles ---
    QueryDef(
      "q27_percentiles",
      (s, dir) => Tables.t(s, dir, "orders")
        .groupBy("o_orderstatus")
        .agg(round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
          round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"),
          round(min("o_totalprice"), 2).as("lo"),
          round(max("o_totalprice"), 2).as("hi"))
        .orderBy("o_orderstatus"),
      Some(
        """SELECT o_orderstatus,
          |  round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
          |  round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
          |  round(min(o_totalprice), 2) AS lo,
          |  round(max(o_totalprice), 2) AS hi
          |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // --- approximate percentiles (Greenwald-Khanna / approx_percentile).
    //     Same contract-oracle pattern as q15: the sketch value is
    //     engine-specific but deterministic for fixed data, so emit the
    //     exact percentile plus a boolean "approx within 2%" the oracle
    //     asserts TRUE. ---
    QueryDef(
      "q39_approx_percentiles",
      (s, dir) => Tables.t(s, dir, "orders")
        .groupBy("o_orderstatus")
        .agg(round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50_exact"),
          expr("approx_percentile(o_totalprice, 0.5, 10000)").as("p50_approx"),
          round(expr("percentile(o_totalprice, 0.95)"), 4).as("p95_exact"),
          expr("approx_percentile(o_totalprice, 0.95, 10000)").as("p95_approx"))
        .select(col("o_orderstatus"), col("p50_exact"), col("p95_exact"),
          (abs(col("p50_approx") - col("p50_exact")) <= col("p50_exact") * 0.02 &&
            abs(col("p95_approx") - col("p95_exact")) <= col("p95_exact") * 0.02)
            .as("approx_ok"))
        .orderBy("o_orderstatus"),
      Some(
        """SELECT o_orderstatus,
          |  round(quantile_cont(o_totalprice, 0.5), 4) AS p50_exact,
          |  round(quantile_cont(o_totalprice, 0.95), 4) AS p95_exact,
          |  TRUE AS approx_ok
          |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // --- array functions: collect_set/sort_array/array_contains ---
    QueryDef(
      "q28_array_funcs",
      (s, dir) => Tables.t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(concat_ws(",", sort_array(collect_set("l_linestatus"))).as("statuses"),
          array_contains(collect_set("l_linestatus"), "F").as("has_f"),
          size(collect_set("l_linestatus")).as("n_statuses"))
        .orderBy("l_returnflag"),
      Some(
        """WITH d AS (SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem)
          |SELECT l_returnflag,
          |  string_agg(l_linestatus, ',' ORDER BY l_linestatus) AS statuses,
          |  bool_or(l_linestatus = 'F') AS has_f,
          |  CAST(count(*) AS INT) AS n_statuses
          |FROM d GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // --- map functions: per-user event-type histogram as a map column,
    //     looked up per type (oracle computes the same lookups directly) ---
    QueryDef(
      "q29_map_funcs",
      (s, dir) => Tables.t(s, dir, "events")
        .groupBy("user_id", "event_type").count()
        .groupBy("user_id")
        .agg(map_from_entries(collect_list(struct(col("event_type"), col("count"))))
          .as("hist"))
        .select(col("user_id"),
          coalesce(element_at(col("hist"), "click"), lit(0L)).as("clicks"),
          coalesce(element_at(col("hist"), "purchase"), lit(0L)).as("purchases"),
          size(col("hist")).as("n_types"))
        .orderBy("user_id"),
      Some(
        """SELECT user_id,
          |  count(*) FILTER (event_type = 'click') AS clicks,
          |  count(*) FILTER (event_type = 'purchase') AS purchases,
          |  CAST(count(DISTINCT event_type) AS INT) AS n_types
          |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // --- full outer join with null-producing sides ---
    QueryDef(
      "q30_outer_join",
      (s, dir) => {
        val hv = Tables.t(s, dir, "orders")
          .filter(col("o_totalprice") > 400000)
          .groupBy("o_custkey")
          .agg(count(lit(1)).as("n_hv"),
            round(sum("o_totalprice"), 2).as("hv_rev"))
        val poor = Tables.t(s, dir, "customer")
          .filter(col("c_acctbal") < 0)
          .select("c_custkey", "c_name")
        hv.join(poor, hv("o_custkey") === poor("c_custkey"), "full_outer")
          .select(coalesce(col("o_custkey"), col("c_custkey")).as("custkey"),
            coalesce(col("n_hv"), lit(0L)).as("n_hv"),
            coalesce(col("hv_rev"), lit(0.0)).as("hv_rev"),
            coalesce(col("c_name"), lit("<none>")).as("name"))
          .orderBy("custkey")
      },
      Some(
        """WITH hv AS (SELECT o_custkey, count(*) AS n_hv,
          |              round(sum(o_totalprice), 2) AS hv_rev
          |            FROM orders WHERE o_totalprice > 400000
          |            GROUP BY o_custkey),
          |poor AS (SELECT c_custkey, c_name FROM customer WHERE c_acctbal < 0)
          |SELECT coalesce(o_custkey, c_custkey) AS custkey,
          |       coalesce(n_hv, 0) AS n_hv,
          |       coalesce(hv_rev, 0.0) AS hv_rev,
          |       coalesce(c_name, '<none>') AS name
          |FROM hv FULL OUTER JOIN poor ON o_custkey = c_custkey
          |ORDER BY custkey""".stripMargin)),

    // --- pivot: event-type histogram as columns ---
    QueryDef(
      "q31_pivot",
      (s, dir) => Tables.t(s, dir, "events")
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "purchase", "error", "signup", "view"))
        .count()
        .na.fill(0L)
        .orderBy("user_id"),
      Some(
        """SELECT user_id,
          |  count(*) FILTER (event_type = 'click') AS click,
          |  count(*) FILTER (event_type = 'purchase') AS purchase,
          |  count(*) FILTER (event_type = 'error') AS error,
          |  count(*) FILTER (event_type = 'signup') AS signup,
          |  count(*) FILTER (event_type = 'view') AS view
          |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // --- deterministic sampling: a 10% hash-split on fnv1a32(orderkey),
    //     the reproducible-across-engines (and across-reruns) form a
    //     training pipeline wants for holdout splits — Bernoulli RNG
    //     sampling can't be oracled (engine RNGs differ; `.sample(seed)`
    //     stays covered in RegistrySpec/OperatorSpec), but the hash split
    //     mirrors exactly via the DuckDB FNV-1a fold. ---
    QueryDef(
      "q32_sample",
      (s, dir) => Tables.t(s, dir, "orders")
        .filter(pmod(graft.functions.Fns.fnv1a32(col("o_orderkey").cast("string")),
          lit(10)) === 0)
        .agg(count(lit(1)).as("n_sampled"),
          round(sum("o_totalprice"), 2).as("rev_sampled")),
      Some(
        """SELECT count(*) AS n_sampled,
          |  round(sum(o_totalprice), 2) AS rev_sampled
          |FROM orders
          |WHERE (list_reduce(list_prepend(2166136261::BIGINT,
          |    list_transform(string_split(CAST(o_orderkey AS VARCHAR), ''),
          |      c -> unicode(c)::BIGINT)),
          |    (h, c) -> (xor(h, c) * 16777619) % 4294967296)) % 2147483648
          |    % 10 = 0
          |ORDER BY n_sampled""".stripMargin)),

    // --- SQL surface: the same portable SQL text runs on Spark (over
    //     registered temp views) AND as its own DuckDB oracle ---
    QueryDef(
      "q26_sql_surface",
      (s, dir) => {
        graft.api.Tables.register(s, dir, "customer", "orders", "lineitem")
        s.sql(RelationalExt.q26Sql)
      },
      Some(q26Sql),
      bench = true),

    // --- gap-based sessionization (batch twin of session_window) ---
    QueryDef(
      "q25_sessionize",
      (s, dir) => Sessionize.sessions(
        Tables.t(s, dir, "events"), "user_id", "ts", gapSeconds = 1800)
        .orderBy("user_id", "session_start"),
      Some(
        """WITH e AS (
          |  SELECT user_id, ts, CAST(floor(epoch(ts)) AS BIGINT) AS sec,
          |    CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
          |           - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER
          |             (PARTITION BY user_id ORDER BY ts) > 1800
          |         THEN 1 ELSE 0 END AS gap
          |  FROM events),
          |s AS (
          |  SELECT user_id, sec,
          |    sum(gap) OVER (PARTITION BY user_id ORDER BY ts
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session
          |  FROM e)
          |SELECT user_id, min(sec) AS session_start, max(sec) AS session_end,
          |       count(*) AS n_events
          |FROM s GROUP BY user_id, session
          |ORDER BY user_id, session_start""".stripMargin),
      bench = true),

    // --- built-in session_window operator (the native sessionization
    //     Spark ships; q25's custom Sessionize is the library twin).
    //     Boundary semantics: session_window MERGES an event exactly
    //     gap-apart (UpdatingSessionsIterator merges while sessionStart
    //     <= currentSessionEnd), i.e. a new session starts only when
    //     diff > gap — same boundary as q25, but mirrored here at µs
    //     precision instead of whole seconds. ---
    QueryDef(
      "q40_session_window",
      (s, dir) => Tables.t(s, dir, "events")
        .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          unix_micros(col("w.start")).as("session_start_us"),
          col("n_events"))
        .orderBy("user_id", "session_start_us"),
      Some(
        """WITH e AS (
          |  SELECT user_id, ts, epoch_us(ts) AS us,
          |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
          |           (PARTITION BY user_id ORDER BY ts) > 1800000000
          |         THEN 1 ELSE 0 END AS gap
          |  FROM events),
          |s AS (
          |  SELECT user_id, us,
          |    sum(gap) OVER (PARTITION BY user_id ORDER BY ts
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session
          |  FROM e)
          |SELECT user_id, min(us) AS session_start_us, count(*) AS n_events
          |FROM s GROUP BY user_id, session
          |ORDER BY user_id, session_start_us""".stripMargin))
  )
}

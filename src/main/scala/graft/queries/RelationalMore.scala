package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.api.{QueryDef, Tables}

/** Third relational batch: extended scalar surface (string distance,
  * padding, bitwise), advanced window functions (dense_rank /
  * percent_rank / cume_dist / ntile / nth_value), and correlated scalar
  * subqueries.
  */
object RelationalMore {

  /** Correlated scalar subquery in portable SQL — one text, two engines
    * (Spark over temp views; DuckDB as its own oracle).
    */
  val q35Sql: String =
    """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price
      |FROM orders o
      |WHERE o_totalprice >
      |  (SELECT round(round(sum(o2.o_totalprice), 2) * 2 / count(*), 6)
      |   FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
      |ORDER BY o_orderkey""".stripMargin
  // threshold built sum-first (2-decimal grid) so both engines compare
  // against bit-identical doubles — raw `2 * avg(...)` differs in the last
  // ULP between engines and can flip boundary rows

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "q33_scalar_extras",
      (s, dir) => Tables.t(s, dir, "customer")
        .filter(col("c_custkey") < 150)
        .select(col("c_custkey"),
          reverse(col("c_name")).as("rev"),
          levenshtein(col("c_mktsegment"), lit("MACHINERY")).as("lev"),
          repeat(substring(col("c_name"), 1, 2), 3).as("rep"),
          lpad(col("c_nationkey").cast("string"), 4, "0").as("lp"),
          rpad(col("c_nationkey").cast("string"), 4, "x").as("rp"),
          trim(concat(lit(" "), col("c_mktsegment"), lit(" "))).as("tr"),
          greatest(col("c_acctbal"), lit(1000.0)).as("gr"),
          least(col("c_acctbal"), lit(1000.0)).as("le"),
          col("c_custkey").bitwiseAND(lit(255L)).as("band"),
          col("c_custkey").bitwiseXOR(lit(255L)).as("bxor"),
          shiftleft(col("c_custkey") % 16, 2).as("shl"))
        .orderBy("c_custkey"),
      Some(
        """SELECT c_custkey,
          |  reverse(c_name) AS rev,
          |  CAST(levenshtein(c_mktsegment, 'MACHINERY') AS INT) AS lev,
          |  repeat(substring(c_name, 1, 2), 3) AS rep,
          |  lpad(CAST(c_nationkey AS VARCHAR), 4, '0') AS lp,
          |  rpad(CAST(c_nationkey AS VARCHAR), 4, 'x') AS rp,
          |  trim(concat(' ', c_mktsegment, ' ')) AS tr,
          |  greatest(c_acctbal, 1000.0) AS gr,
          |  least(c_acctbal, 1000.0) AS le,
          |  c_custkey & 255 AS band,
          |  xor(c_custkey, 255) AS bxor,
          |  (c_custkey % 16) << 2 AS shl
          |FROM customer WHERE c_custkey < 150 ORDER BY c_custkey""".stripMargin)),

    QueryDef(
      "q34_window_extras",
      (s, dir) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice"), col("o_orderkey"))
        val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        Tables.t(s, dir, "orders")
          .filter(col("o_custkey") < 100)
          .select(col("o_custkey"), col("o_orderkey"),
            dense_rank().over(w).as("drk"),
            round(percent_rank().over(w), 6).as("prk"),
            round(cume_dist().over(w), 6).as("cd"),
            ntile(4).over(w).as("nt"),
            nth_value(col("o_orderkey"), 2).over(full).as("second_cheapest"),
            first(col("o_orderkey")).over(full).as("cheapest"),
            last(col("o_orderkey")).over(full).as("priciest"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some(
        """SELECT o_custkey, o_orderkey,
          |  CAST(dense_rank() OVER w AS INT) AS drk,
          |  round(percent_rank() OVER w, 6) AS prk,
          |  round(cume_dist() OVER w, 6) AS cd,
          |  CAST(ntile(4) OVER w AS INT) AS nt,
          |  nth_value(o_orderkey, 2) OVER
          |    (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
          |    AS second_cheapest,
          |  first_value(o_orderkey) OVER
          |    (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
          |    AS cheapest,
          |  last_value(o_orderkey) OVER
          |    (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
          |    AS priciest
          |FROM orders WHERE o_custkey < 100
          |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
          |ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // --- exact decimal aggregation: the SUM itself runs on exact DECIMAL
    //     in both engines (no float drift in the accumulator; the
    //     discount column accumulates at scale 6). The OUTPUT is cast to
    //     DOUBLE on both sides because decimal columns hash differently
    //     in the downstream compare even when values and arrow types are
    //     identical. Every emitted value is first pinned to SCALE 2 so
    //     its unscaled form stays under 2^53 up to sums of 9e13: there
    //     the int->double conversion is exact and /100 is one correctly-
    //     rounded step in both engines — bit-identical doubles. (A direct
    //     scale-6 cast is NOT safe: above 2^53 unscaled, DuckDB's
    //     int128->double->/10^6 double-rounds while Spark's BigDecimal
    //     rounds once, diverging by 1 ulp — measured on 527/2000 random
    //     values; scale 6 crosses 2^53 at sums of only ~9e9.)
    //     The scale-2 pin itself must be round(x, 2) in the oracle, NOT
    //     CAST(x AS DECIMAL(38,2)): DuckDB's decimal downscale cast
    //     rounds half-to-even (.405 -> .40) while Spark's decimal cast
    //     and DuckDB's round() both round half away from zero (.405 ->
    //     .41) — a sf0.001 sum landed exactly on the half point. ---
    QueryDef(
      "q36_decimal_agg",
      (s, dir) => Tables.t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          sum(col("l_extendedprice").cast("decimal(18,2)"))
            .cast("decimal(38,2)").cast("double").as("dec_revenue"),
          sum(col("l_quantity").cast("decimal(12,2)"))
            .cast("decimal(38,2)").cast("double").as("dec_qty"),
          sum((col("l_extendedprice").cast("decimal(18,2)") *
            col("l_discount").cast("decimal(8,4)")).cast("decimal(24,6)"))
            .cast("decimal(38,2)").cast("double").as("dec_discount_amt"))
        .orderBy("l_returnflag"),
      Some(
        """SELECT l_returnflag,
          |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2)
          |       AS DOUBLE) AS dec_revenue,
          |  CAST(round(sum(CAST(l_quantity AS DECIMAL(12,2))), 2)
          |       AS DOUBLE) AS dec_qty,
          |  CAST(round(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
          |           * CAST(l_discount AS DECIMAL(8,4)) AS DECIMAL(24,6))), 2)
          |       AS DOUBLE) AS dec_discount_amt
          |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // --- calendar interval arithmetic (month-end clamping semantics) ---
    QueryDef(
      "q37_interval_arith",
      (s, dir) => Tables.t(s, dir, "orders")
        .filter(col("o_custkey") < 50)
        .select(col("o_orderkey"),
          add_months(col("o_orderdate"), 3).cast("timestamp").as("plus3m"),
          (col("o_orderdate") + expr("INTERVAL 10 DAYS")).as("plus10d"),
          add_months(col("o_orderdate"), -12).cast("timestamp").as("minus1y"),
          date_trunc("quarter", col("o_orderdate")).as("qtr_start"))
        .orderBy("o_orderkey"),
      Some(
        """SELECT o_orderkey,
          |  o_orderdate + INTERVAL 3 MONTH AS plus3m,
          |  o_orderdate + INTERVAL 10 DAY AS plus10d,
          |  o_orderdate - INTERVAL 1 YEAR AS minus1y,
          |  date_trunc('quarter', o_orderdate) AS qtr_start
          |FROM orders WHERE o_custkey < 50 ORDER BY o_orderkey""".stripMargin)),

    QueryDef(
      "q35_correlated_subquery",
      (s, dir) => {
        graft.api.Tables.register(s, dir, "orders")
        s.sql(RelationalMore.q35Sql)
      },
      Some(q35Sql)),

    // --- RANGE window frames (value-based, vs q10's ROWS frames): the
    //     trailing-30-day spend per order. Both engines get an integer
    //     epoch-day ordering so the frame bound is engine-neutral. ---
    QueryDef(
      "q41_range_frame",
      (s, dir) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_day"))
          .rangeBetween(-30, Window.currentRow)
        Tables.t(s, dir, "orders")
          .filter(col("o_custkey") < 200)
          .withColumn("o_day", datediff(col("o_orderdate"), lit("1970-01-01")))
          .select(col("o_custkey"), col("o_orderkey"), col("o_day"),
            round(sum("o_totalprice").over(w), 2).as("spend_30d"),
            count(lit(1)).over(w).as("n_orders_30d"))
          .orderBy("o_custkey", "o_day", "o_orderkey")
      },
      Some(
        """SELECT o_custkey, o_orderkey,
          |  CAST(datediff('day', DATE '1970-01-01', o_orderdate) AS INT) AS o_day,
          |  round(sum(o_totalprice) OVER w, 2) AS spend_30d,
          |  count(*) OVER w AS n_orders_30d
          |FROM orders WHERE o_custkey < 200
          |WINDOW w AS (PARTITION BY o_custkey
          |  ORDER BY datediff('day', DATE '1970-01-01', o_orderdate)
          |  RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
          |ORDER BY o_custkey, o_day, o_orderkey""".stripMargin)),

    // --- statistical aggregates (stddev/covar/corr). The builtins use
    //     different accumulation orders across engines (last-ulp float
    //     drift), so the oracle-stable values are computed from rounded
    //     moments with one identical formula on both sides, and Spark's
    //     builtins (stddev_samp, covar_samp, corr) are additionally
    //     checked against those formulas with a 1e-6 envelope boolean
    //     (q15 contract pattern). ---
    QueryDef(
      "q42_stats_agg",
      (s, dir) => {
        // each formula bound ONCE so the emitted value and the builtin
        // contract check are bit-identical by construction
        val n = col("n"); val sq = col("sq"); val sqq = col("sqq")
        val sd = col("sd"); val sdd = col("sdd"); val sqd = col("sqd")
        val stddevQty = sqrt((sqq - sq * sq / n) / (n - 1))
        val covarQtyDisc = (sqd - sq * sd / n) / (n - 1)
        val corrQtyDisc = (sqd - sq * sd / n) /
          (sqrt(sqq - sq * sq / n) * sqrt(sdd - sd * sd / n))
        Tables.t(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            count(lit(1)).cast("double").as("n"),
            round(sum("l_quantity"), 2).as("sq"),
            round(sum(col("l_quantity") * col("l_quantity")), 4).as("sqq"),
            round(sum("l_discount"), 4).as("sd"),
            round(sum(col("l_discount") * col("l_discount")), 6).as("sdd"),
            round(sum(col("l_quantity") * col("l_discount")), 4).as("sqd"),
            stddev_samp(col("l_quantity")).as("sd_builtin"),
            covar_samp(col("l_quantity"), col("l_discount")).as("cov_builtin"),
            corr(col("l_quantity"), col("l_discount")).as("corr_builtin"))
          .select(col("l_returnflag"),
            round(stddevQty, 6).as("stddev_qty"),
            round(covarQtyDisc, 6).as("covar_qty_disc"),
            round(corrQtyDisc, 6).as("corr_qty_disc"),
            (abs(col("sd_builtin") - stddevQty) < 1e-6 &&
              abs(col("cov_builtin") - covarQtyDisc) < 1e-6 &&
              abs(col("corr_builtin") - corrQtyDisc) < 1e-6).as("builtin_ok"))
          .orderBy("l_returnflag")
      },
      Some(
        """WITH m AS (
          |  SELECT l_returnflag,
          |    CAST(count(*) AS DOUBLE) AS n,
          |    round(sum(l_quantity), 2) AS sq,
          |    round(sum(l_quantity * l_quantity), 4) AS sqq,
          |    round(sum(l_discount), 4) AS sd,
          |    round(sum(l_discount * l_discount), 6) AS sdd,
          |    round(sum(l_quantity * l_discount), 4) AS sqd
          |  FROM lineitem GROUP BY l_returnflag)
          |SELECT l_returnflag,
          |  round(sqrt((sqq - sq * sq / n) / (n - 1)), 6) AS stddev_qty,
          |  round((sqd - sq * sd / n) / (n - 1), 6) AS covar_qty_disc,
          |  round((sqd - sq * sd / n) /
          |    (sqrt(sqq - sq * sq / n) * sqrt(sdd - sd * sd / n)), 6)
          |    AS corr_qty_disc,
          |  TRUE AS builtin_ok
          |FROM m ORDER BY l_returnflag""".stripMargin)),

    // --- custom physical operator: top-3 orders per customer through the
    //     TopKPerGroup LogicalPlan + SparkStrategy + SparkPlan pipeline
    //     (q09's semantics minus the rank column; the window formulation
    //     is the oracle's subquery). The plan carries TopKPerGroupPartial/
    //     FinalExec nodes — asserted in PhysicalTopKSpec. ---
    QueryDef(
      "q38_topk_physical",
      (s, dir) => graft.plans.TopKPerGroup.topK(
        Tables.t(s, dir, "orders")
          .select("o_custkey", "o_orderkey", "o_totalprice"),
        groupCols = Seq("o_custkey"),
        orderCols = Seq(col("o_totalprice").desc, col("o_orderkey").asc),
        k = 3)
        .orderBy(col("o_custkey"), col("o_totalprice").desc, col("o_orderkey")),
      Some(
        """SELECT o_custkey, o_orderkey, o_totalprice FROM (
          |  SELECT o_custkey, o_orderkey, o_totalprice,
          |    row_number() OVER (PARTITION BY o_custkey
          |      ORDER BY o_totalprice DESC, o_orderkey) AS rk
          |  FROM orders) t
          |WHERE rk <= 3
          |ORDER BY o_custkey, o_totalprice DESC, o_orderkey""".stripMargin)),

    // --- custom DataSource V2 scan (sources.GenSource): the id filter
    //     reaches the connector as a pushed range (no rows outside
    //     [1000, 9000) are ever generated — GenSourceSpec pins the plan),
    //     and the oracle recomputes the same deterministic table from
    //     range() in DuckDB, so the whole TableProvider -> ScanBuilder ->
    //     PartitionReader pipeline is driver-hash-checked. ---
    QueryDef(
      "q43_gen_source",
      (s, _) => s.read.format("graft.sources.GenSource")
        .option("rows", 20000).option("slices", 8).load()
        .filter(col("id") >= 1000 && col("id") < 9000)
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"),
          round(sum("val"), 4).as("sum_val"),
          countDistinct("tag").as("n_tags"),
          min("id").as("min_id"), max("id").as("max_id"))
        .orderBy("bucket"),
      Some(
        """WITH g AS (
          |  SELECT i AS id, (i * 2654435761) % 4294967296 AS h
          |  FROM range(1000, 9000) t(i))
          |SELECT CAST(h % 100 AS INT) AS bucket, count(*) AS n,
          |  round(sum(h / 4294967296.0), 4) AS sum_val,
          |  count(DISTINCT 't' || CAST(h % 7 AS VARCHAR)) AS n_tags,
          |  min(id) AS min_id, max(id) AS max_id
          |FROM g GROUP BY 1
          |ORDER BY bucket""".stripMargin)),

    // --- DSv2 COMPLETE aggregate pushdown (SupportsPushDownAggregates):
    //     ungrouped count/min/max over the virtual table answer from the
    //     pushed id-range arithmetic — the executed plan contains NO
    //     aggregate node and generates ZERO rows (GenSourceSpec asserts
    //     both); the oracle recomputes the semantics from range(). ---
    QueryDef(
      "q77_source_agg_pushdown",
      (s, _) => s.read.format("graft.sources.GenSource")
        .option("rows", 500000).option("slices", 8).load()
        .filter(col("id") >= 100000 && col("id") < 400000)
        .agg(count(lit(1)).as("n"),
          min("id").as("min_id"), max("id").as("max_id")),
      Some(
        """SELECT count(*) AS n, min(id) AS min_id, max(id) AS max_id
          |FROM range(100000, 400000) t(id) ORDER BY n""".stripMargin)),

    // --- DSv2 PARTIAL grouped aggregate pushdown (q77's grouped twin):
    //     GROUP BY bucket cannot be answered in closed form (the key is
    //     a hash of the id), so the source folds each slice into
    //     per-group PARTIALS and Spark plans only the final merge —
    //     groups × partitions rows cross the source boundary instead of
    //     n (GenSourceSpec asserts the scan node and the row
    //     reduction). The oracle recomputes the same hash arithmetic
    //     from range(). ---
    QueryDef(
      "q84_source_group_pushdown",
      (s, _) => s.read.format("graft.sources.GenSource")
        .option("rows", 500000).option("slices", 8).load()
        .filter(col("id") >= 100000 && col("id") < 400000)
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"),
          min("id").as("min_id"), max("id").as("max_id"))
        .orderBy("bucket"),
      Some(
        """SELECT CAST((id * 2654435761 % 4294967296) % 100 AS INT)
          |    AS bucket,
          |  count(*) AS n, min(id) AS min_id, max(id) AS max_id
          |FROM range(100000, 400000) t(id)
          |GROUP BY 1 ORDER BY bucket""".stripMargin)),

    // --- storage-partitioned join (the Iceberg bucket-join mechanism):
    //     two GenKeyedSource tables report KeyGroupedPartitioning on
    //     `bucket`, so the join AND the grouped aggregate plan with
    //     ZERO shuffle exchanges — Spark aligns the co-partitioned
    //     scans directly (KeyedSourceSpec pins the exchange-free plan
    //     and the mismatched-layout fallback). The oracle recomputes
    //     the join from range() hash arithmetic. ---
    QueryDef(
      "q85_storage_partitioned_join",
      (s, _) => {
        // spark.sql.sources.v2.bucketing.enabled is a SESSION conf, set
        // once in every harness builder (Verify/Bench/TestSpark) rather
        // than mutated here: an in-body set would silently change the
        // planner for every query that runs after q85 in the same
        // session, and an in-body restore would undo it before this
        // lazy plan is even compiled. Without the flag the join still
        // answers correctly — it just degrades to the shuffle plan
        // (the spec-pinned fallback).
        def t(rows: Long) = s.read.format("graft.sources.GenKeyedSource")
          .option("rows", rows).option("buckets", 16).load()
        t(2000).as("a").join(t(1000).as("b"), "bucket")
          .groupBy("bucket")
          .agg(count(lit(1)).as("n"),
            sum(col("a.id") + col("b.id")).as("sid"))
          .orderBy("bucket")
      },
      Some(
        """WITH a AS (SELECT id, (id * 2654435761 % 4294967296) % 16
          |             AS bucket FROM range(0, 2000) t(id)),
          |b AS (SELECT id, (id * 2654435761 % 4294967296) % 16
          |        AS bucket FROM range(0, 1000) t(id))
          |SELECT CAST(a.bucket AS INT) AS bucket,
          |  CAST(count(*) AS BIGINT) AS n,
          |  CAST(sum(a.id + b.id) AS BIGINT) AS sid
          |FROM a JOIN b USING (bucket)
          |GROUP BY 1 ORDER BY bucket""".stripMargin)),

    // --- DSv2 WRITE path (sources.ManifestTable): per-nation customer
    //     rollup written through the manifest-committed connector (4
    //     executor-written data files, one atomic manifest publish —
    //     the V2-layer heir of the reference's tmp→rename commit,
    //     mr/coordinator.go:37-53), then read BACK through the same
    //     connector's manifest-listed scan. The driver hash thus checks
    //     the full write→commit→scan→parse loop; abort/CRC/vacuum
    //     hygiene is pinned in ManifestTableSpec. Aggregates are chosen
    //     order-independent-exact (counts, integer sums, min of a
    //     double) so the round-trip is bit-identical to the direct
    //     computation the oracle runs. ---
    QueryDef(
      "q78_dsv2_write_roundtrip",
      (s, dir) => {
        // per-dataset sink path (p46's convention): sf0.01 verify and
        // sf0.1 bench runs must not read each other's table
        val path = "/tmp/graft_q78_sink/" +
          java.lang.Integer.toHexString(dir.hashCode)
        Tables.t(s, dir, "customer")
          .join(Tables.t(s, dir, "nation"),
            col("c_nationkey") === col("n_nationkey"))
          .groupBy("n_name")
          .agg(count(lit(1)).as("n_cust"),
            sum("c_custkey").as("sum_key"),
            min("c_acctbal").as("min_bal"))
          .repartition(4)
          .write.format("graft.sources.ManifestTable")
          .option("path", path).mode("overwrite").save()
        s.read.format("graft.sources.ManifestTable")
          .option("path", path).load()
          .orderBy("n_name")
      },
      Some(
        """SELECT n_name, count(*) AS n_cust,
          |  CAST(sum(c_custkey) AS BIGINT) AS sum_key,
          |  min(c_acctbal) AS min_bal
          |FROM customer JOIN nation ON c_nationkey = n_nationkey
          |GROUP BY n_name ORDER BY n_name""".stripMargin)),

    // --- manifest zone maps (per-file min/max collected at write, file
    //     skipping at read — the Delta/Iceberg data-skipping shape, and
    //     the layout ZOrderKey/repartitionByRange exists to feed): a
    //     range-clustered write through ManifestTable, then a selective
    //     range read that touches only the overlapping files
    //     (files=k/8 with k<=2, spec-asserted; every filter stays
    //     residual so exactness never depends on the maps). The driver
    //     hash checks the skipped read equals the direct computation. ---
    QueryDef(
      "q80_sink_zone_skipping",
      (s, dir) => {
        val path = "/tmp/graft_q80_sink/" +
          java.lang.Integer.toHexString(dir.hashCode)
        Tables.t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"),
            col("l_extendedprice"))
          .repartitionByRange(8, col("l_orderkey"))
          .write.format("graft.sources.ManifestTable")
          .option("path", path).mode("overwrite").save()
        s.read.format("graft.sources.ManifestTable")
          .option("path", path).load()
          .filter(col("l_orderkey") >= 1000L && col("l_orderkey") < 2000L)
          .groupBy("l_orderkey")
          .agg(count(lit(1)).as("n_lines"),
            sum("l_linenumber").as("sum_line"),
            min("l_extendedprice").as("min_price"),
            max("l_extendedprice").as("max_price"))
          .orderBy("l_orderkey")
      },
      Some(
        """SELECT l_orderkey, count(*) AS n_lines,
          |  CAST(sum(l_linenumber) AS BIGINT) AS sum_line,
          |  min(l_extendedprice) AS min_price,
          |  max(l_extendedprice) AS max_price
          |FROM lineitem WHERE l_orderkey >= 1000 AND l_orderkey < 2000
          |GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin)),

    // --- optimizer-rule extension (RankLimitRewrite): the DECLARATIVE
    //     row_number-filter formulation, planned through the custom
    //     TopKPerGroup operator by the injected rule — the oracle is the
    //     same declarative SQL, so the driver hash-checks that the
    //     rewrite is semantics-preserving. The flag is scoped by forcing
    //     optimization eagerly, then resetting (the rewrite must not
    //     leak into other queries' plans). ---
    QueryDef(
      "q44_rank_rewrite",
      (s, dir) => {
        graft.plans.RankLimitRewrite.enable(s)
        try {
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy(col("p_brand"))
            .orderBy(col("p_retailprice").desc, col("p_partkey").asc)
          val df = Tables.t(s, dir, "part")
            .select("p_brand", "p_partkey", "p_retailprice")
            .withColumn("rk", row_number().over(w))
            .filter(col("rk") <= 2).drop("rk")
            .orderBy(col("p_brand"), col("p_retailprice").desc, col("p_partkey"))
          df.queryExecution.optimizedPlan // rewrite fires here, under the flag
          df
        } finally s.conf.set(graft.plans.RankLimitRewrite.flag, "false")
      },
      Some(
        """SELECT p_brand, p_partkey, p_retailprice FROM (
          |  SELECT p_brand, p_partkey, p_retailprice,
          |    row_number() OVER (PARTITION BY p_brand
          |      ORDER BY p_retailprice DESC, p_partkey) AS rk
          |  FROM part) t
          |WHERE rk <= 2
          |ORDER BY p_brand, p_retailprice DESC, p_partkey""".stripMargin)),

    // --- MERGE / upsert (operators.MergeUpsert): updates bump matched
    //     keys (whole-row replace), inserts land guaranteed-new keys,
    //     everything else carries forward — one full-outer join, same
    //     formulation the oracle runs. ---
    QueryDef(
      "q45_merge_upsert",
      (s, dir) => {
        val target = Tables.t(s, dir, "orders")
          .select("o_orderkey", "o_totalprice", "o_orderstatus")
        // +1000.0 is a single IEEE add — bit-identical in both engines
        // (round(x*1.1, 2) is NOT: Spark rounds the exact BigDecimal of
        // the double, DuckDB rounds in float — they disagreed on ~0.01%
        // of rows at sf0.01)
        val updates = target.filter(col("o_orderkey") % 7 === 0)
          .select(col("o_orderkey"),
            (col("o_totalprice") + 1000.0).as("o_totalprice"),
            lit("U").as("o_orderstatus"))
        val inserts = target.filter(col("o_orderkey") % 11 === 0)
          .select((col("o_orderkey") + 100000000L).as("o_orderkey"),
            col("o_totalprice"), lit("N").as("o_orderstatus"))
        graft.operators.MergeUpsert
          .merge(target, updates.unionAll(inserts), Seq("o_orderkey"))
          .orderBy("o_orderkey")
      },
      Some(
        """WITH target AS (
          |  SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders),
          |source AS (
          |  SELECT o_orderkey, o_totalprice + 1000.0 AS o_totalprice,
          |         'U' AS o_orderstatus
          |  FROM target WHERE o_orderkey % 7 = 0
          |  UNION ALL
          |  SELECT o_orderkey + 100000000, o_totalprice, 'N'
          |  FROM target WHERE o_orderkey % 11 = 0)
          |SELECT
          |  COALESCE(s.o_orderkey, t.o_orderkey) AS o_orderkey,
          |  CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_totalprice
          |       ELSE t.o_totalprice END AS o_totalprice,
          |  CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_orderstatus
          |       ELSE t.o_orderstatus END AS o_orderstatus
          |FROM target t FULL OUTER JOIN source s
          |  ON t.o_orderkey = s.o_orderkey
          |ORDER BY o_orderkey""".stripMargin)),

    // --- string/array aggregation (LISTAGG-family): collect_list is
    //     order-nondeterministic after a shuffle, so both engines pin a
    //     total order inside the aggregate (array_sort / ORDER BY).
    //     Output columns are all scalar: the sorted key list is emitted
    //     as a CSV string (numeric sort, THEN cast to string) because
    //     the driver's comparator cannot hash list-typed cells. ---
    QueryDef(
      "q46_string_agg",
      (s, dir) => Tables.t(s, dir, "nation")
        .join(Tables.t(s, dir, "region"),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(
          array_join(array_sort(collect_list("n_name")), ",").as("nations_csv"),
          array_join(array_sort(collect_list("n_nationkey"))
            .cast("array<string>"), ",").as("nation_keys_csv"),
          count(lit(1)).as("n_nations"))
        .orderBy("r_name"),
      Some(
        """SELECT r_name,
          |  string_agg(n_name, ',' ORDER BY n_name) AS nations_csv,
          |  string_agg(CAST(n_nationkey AS VARCHAR), ','
          |             ORDER BY n_nationkey) AS nation_keys_csv,
          |  count(*) AS n_nations
          |FROM nation JOIN region ON n_regionkey = r_regionkey
          |GROUP BY r_name ORDER BY r_name""".stripMargin))
  )
}

package graft.queries

import org.apache.spark.sql.functions._
import graft.api.{QueryDef, Tables}
import graft.functions.Fns
import graft.operators.{BloomPrune, GapFill, HeavyHitters, IncrementalAgg, RangeJoin, SkewJoin, SkewRank, SnapshotDiff}

/** Round-4 relational additions: scale-path joins/layout/maintenance
  * primitives whose naive plans stop working around the 100 TB mark
  * (each re-planned into a shuffle-linear form), plus modern engine
  * surface (VARIANT).
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
          |GROUP BY o.o_orderkey ORDER BY o.o_orderkey""".stripMargin)),

    // --- Z-order layout key (native ZOrderKey expression): the
    //     multi-dimensional clustering primitive — sort by this key before
    //     writing and min/max file stats prune on BOTH dimensions.
    //     ZOrderSpec asserts the actual layout win (chunk bounding boxes);
    //     this query pins the key values against a pure-SQL bit-interleave
    //     mirror. ---
    QueryDef(
      "q48_zorder_key",
      (s, dir) => {
        val px = col("l_partkey") % 65536
        val sx = col("l_suppkey") % 65536
        Tables.t(s, dir, "lineitem")
          .filter(col("l_orderkey") % 61 === 0)
          .select(col("l_orderkey"), col("l_linenumber"),
            px.as("px"), sx.as("sx"),
            Fns.zorderKey(px, sx).as("zkey"))
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some(
        """SELECT l_orderkey, l_linenumber,
          |  l_partkey % 65536 AS px,
          |  l_suppkey % 65536 AS sx,
          |  CAST(list_sum(
          |    [(((l_partkey % 65536) >> i) & 1) * (1::BIGINT << (2 * i))
          |     + (((l_suppkey % 65536) >> i) & 1) * (1::BIGINT << (2 * i + 1))
          |     FOR i IN range(0, 16)]) AS BIGINT) AS zkey
          |FROM lineitem WHERE l_orderkey % 61 = 0
          |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // --- snapshot diff (CDC extraction, the inverse of q45's MERGE):
    //     synthesize a next-day snapshot from orders (delete %13, update
    //     %7's price and status, insert %11 under shifted keys), then
    //     recover exactly the I/U/D changeset. +1000.0 is a single IEEE
    //     add — bit-identical in both engines (q45's precedent). ---
    QueryDef(
      "q49_snapshot_diff",
      (s, dir) => {
        val base = Tables.t(s, dir, "orders")
          .select("o_orderkey", "o_totalprice", "o_orderstatus")
        val k = col("o_orderkey")
        val survivors = base.filter(k % 13 =!= 0)
          .select(k,
            when(k % 7 === 0, col("o_totalprice") + 1000.0)
              .otherwise(col("o_totalprice")).as("o_totalprice"),
            when(k % 7 === 0, lit("U")).otherwise(col("o_orderstatus"))
              .as("o_orderstatus"))
        val inserts = base.filter(k % 11 === 0)
          .select((k + 100000000L).as("o_orderkey"),
            col("o_totalprice"), lit("N").as("o_orderstatus"))
        SnapshotDiff.diff(base, survivors.unionAll(inserts), Seq("o_orderkey"))
          .orderBy("o_orderkey")
      },
      Some(
        """WITH base AS (
          |  SELECT o_orderkey AS k, o_totalprice AS p, o_orderstatus AS st
          |  FROM orders),
          |nxt AS (
          |  SELECT k,
          |    CASE WHEN k % 7 = 0 THEN p + 1000.0 ELSE p END AS p,
          |    CASE WHEN k % 7 = 0 THEN 'U' ELSE st END AS st
          |  FROM base WHERE k % 13 <> 0
          |  UNION ALL
          |  SELECT k + 100000000, p, 'N' FROM base WHERE k % 11 = 0)
          |SELECT COALESCE(b.k, n.k) AS o_orderkey,
          |  CASE WHEN b.k IS NULL THEN 'I'
          |       WHEN n.k IS NULL THEN 'D' ELSE 'U' END AS change_type,
          |  b.p AS old_o_totalprice, n.p AS new_o_totalprice,
          |  b.st AS old_o_orderstatus, n.st AS new_o_orderstatus
          |FROM base b FULL OUTER JOIN nxt n ON b.k = n.k
          |WHERE b.k IS NULL OR n.k IS NULL
          |   OR b.p IS DISTINCT FROM n.p OR b.st IS DISTINCT FROM n.st
          |ORDER BY o_orderkey""".stripMargin)),

    // --- heavy hitters: Misra-Gries per partition + exact recount. The
    //     oracle demands exactness, so the query keys on a BOUNDED domain
    //     (l_quantity, 50 distinct values): every partition's distinct
    //     count sits below capacity at ANY scale factor, which is the
    //     operator's exactness condition. A near-uniform unbounded key
    //     (l_partkey) leaves the exact regime as sf grows — no bounded-
    //     memory sketch can rank keys that aren't actually heavy — and
    //     that approximate regime is covered in HeavyHittersSpec with a
    //     skewed fixture and a deliberately tiny capacity. ---
    QueryDef(
      "q50_heavy_hitters",
      (s, dir) => HeavyHitters
        .topK(Tables.t(s, dir, "lineitem"), "l_quantity", k = 20)
        .orderBy(col("cnt").desc, col("l_quantity")),
      Some(
        """SELECT l_quantity, count(*) AS cnt
          |FROM lineitem GROUP BY l_quantity
          |ORDER BY cnt DESC, l_quantity LIMIT 20""".stripMargin)),

    // --- incremental materialized-view maintenance: materialize a
    //     count+sum aggregate over the OLD orders snapshot, extract the
    //     I/U/D changeset to a synthetic NEW snapshot with SnapshotDiff
    //     (updates MOVE rows between groups — orderstatus flips to 'U'),
    //     then apply only the deltas. The oracle recomputes the aggregate
    //     over the new snapshot from scratch — the driver hash-check IS
    //     the "incremental == recompute" proof. Keyed on o_orderkey
    //     (unique — lineitem's (orderkey, linenumber) is NOT, see
    //     SnapshotDiff's scaladoc); the measure floor(o_totalprice) is
    //     integral, so sums are bit-exact in double regardless of
    //     accumulation order. ---
    QueryDef(
      "q51_incremental_agg",
      (s, dir) => {
        val base = Tables.t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderstatus"),
            floor(col("o_totalprice")).cast("double").as("dollars"))
        val k = col("o_orderkey")
        val survivors = base.filter(k % 13 =!= 0)
          .select(k,
            when(k % 7 === 0, lit("U")).otherwise(col("o_orderstatus"))
              .as("o_orderstatus"),
            when(k % 7 === 0, col("dollars") + 1000.0)
              .otherwise(col("dollars")).as("dollars"))
        val inserts = base.filter(k % 11 === 0)
          .select((k + 100000000L).as("o_orderkey"),
            lit("N").as("o_orderstatus"), col("dollars"))
        val matAgg = base.groupBy("o_orderstatus")
          .agg(count(lit(1)).as("cnt"), sum("dollars").as("total_dollars"))
        val changes = SnapshotDiff.diff(base, survivors.unionAll(inserts),
          Seq("o_orderkey"))
        IncrementalAgg
          .applyDelta(matAgg, changes, "o_orderstatus", "dollars",
            "cnt", "total_dollars")
          .orderBy("o_orderstatus")
      },
      Some(
        """WITH base AS (
          |  SELECT o_orderkey k, o_orderstatus g, floor(o_totalprice) q
          |  FROM orders),
          |nxt AS (
          |  SELECT k,
          |    CASE WHEN k % 7 = 0 THEN 'U' ELSE g END AS g,
          |    CASE WHEN k % 7 = 0 THEN q + 1000.0 ELSE q END AS q
          |  FROM base WHERE k % 13 <> 0
          |  UNION ALL
          |  SELECT k + 100000000, 'N', q FROM base WHERE k % 11 = 0)
          |SELECT g AS o_orderstatus, count(*) AS cnt,
          |  sum(q) AS total_dollars
          |FROM nxt GROUP BY g ORDER BY g""".stripMargin)),

    // --- VARIANT (Spark 4 semi-structured type): parse the JSON blob
    //     ONCE into a binary variant, then typed-path access — the
    //     engine-native alternative to q19's per-call string extraction
    //     (get_json_object re-parses the text for every path). At 100 TB
    //     the parse-once representation is the difference between one
    //     JSON parse per row and one per (row × extracted field).
    //     try_variant_get on a missing path yields NULL, not an error —
    //     counted to pin that semantic. ---
    QueryDef(
      "q52_variant_json",
      (s, dir) => Tables.t(s, dir, "events")
        .select(
          expr("variant_get(parse_json(props), '$.k', 'long')").as("k"),
          expr("try_variant_get(parse_json(props), '$.missing', 'long')")
            .as("miss"))
        .groupBy((col("k") % 7).as("k_mod"))
        .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
          min("k").as("min_k"), max("k").as("max_k"),
          count(col("miss")).as("n_missing_hits"))
        .orderBy(col("k_mod").asc_nulls_first),
      Some(
        """WITH v AS (
          |  SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
          |  FROM events)
          |SELECT k % 7 AS k_mod, count(*) AS n,
          |  CAST(sum(k) AS BIGINT) AS sum_k,
          |  min(k) AS min_k, max(k) AS max_k,
          |  0::BIGINT AS n_missing_hits
          |FROM v GROUP BY k_mod ORDER BY k_mod NULLS FIRST""".stripMargin)),

    // --- changelog compaction: latest row per key — the standard CDC-log
    //     -> current-state step. Planned through TopKPerGroup with k=1:
    //     the map-side partial keeps ONE row per (key x partition), so
    //     the exchange carries |keys|x|partitions| rows instead of the
    //     whole log — at 100 TB of append history that is the entire
    //     game. Tie on ts broken by event_id (deterministic). ---
    QueryDef(
      "q53_compact_latest",
      (s, dir) => graft.plans.TopKPerGroup
        .topK(Tables.t(s, dir, "events")
            .select("user_id", "ts", "event_id", "event_type"),
          Seq("user_id"), Seq(col("ts").desc, col("event_id").desc), 1)
        .select(col("user_id"), unix_timestamp(col("ts")).as("ts_epoch"),
          col("event_id"), col("event_type"))
        .orderBy("user_id"),
      Some(
        """WITH r AS (
          |  SELECT user_id, ts, event_id, event_type,
          |    row_number() OVER (PARTITION BY user_id
          |                       ORDER BY ts DESC, event_id DESC) rn
          |  FROM events)
          |SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_epoch,
          |       event_id, event_type
          |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin)),

    // --- explicit bloom-filter join pruning (the runtime-filter pattern
    //     as a composable operator): build a ~10-bits/key bitmap over
    //     urgent orders' keys (typed Aggregator, merged by OR), broadcast
    //     it, shed non-matching lineitems at scan speed with a codegen'd
    //     probe, THEN run the real semi join — false positives die there,
    //     false negatives are impossible (build and probe share
    //     BloomUtil's bit positions), so the result is exactly the plain
    //     semi join the oracle runs. ---
    QueryDef(
      "q54_bloom_prune",
      (s, dir) => {
        val urgent = Tables.t(s, dir, "orders")
          .filter(col("o_orderpriority") === "1-URGENT")
          .select("o_orderkey")
        val bloom = BloomPrune.build(urgent, "o_orderkey", numBits = 1 << 15)
        val pruned = BloomPrune.prune(
          Tables.t(s, dir, "lineitem")
            .select(col("l_orderkey"), col("l_extendedprice")),
          "l_orderkey", bloom)
        pruned.join(urgent,
            pruned("l_orderkey") === urgent("o_orderkey"), "left_semi")
          .agg(count(lit(1)).as("n_items"),
            round(sum("l_extendedprice"), 2).as("revenue"))
      },
      Some(
        """SELECT count(*) AS n_items,
          |  round(sum(l_extendedprice), 2) AS revenue
          |FROM lineitem
          |WHERE l_orderkey IN (SELECT o_orderkey FROM orders
          |                     WHERE o_orderpriority = '1-URGENT')
          |ORDER BY n_items""".stripMargin)),

    // --- salted skew join, oracle-checked: the salt spreads each hot key
    //     over `salts` reducers; the aggregation collapses the salt away,
    //     so the result is identical to the plain join no matter what the
    //     rand(seed) stream produced on any partition layout — which is
    //     exactly what the driver's hash-compare against the unsalted
    //     DuckDB join proves. (Previously test-only equality.) ---
    QueryDef(
      "q55_salted_join",
      (s, dir) => SkewJoin
        .saltedJoin(
          Tables.t(s, dir, "events")
            .select(col("user_id").as("c_custkey"), col("value")),
          Tables.t(s, dir, "customer").select("c_custkey", "c_mktsegment"),
          key = "c_custkey", salts = 8)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_events"),
          round(sum("value"), 2).as("sum_value"))
        .orderBy("c_mktsegment"),
      Some(
        """SELECT c_mktsegment, count(*) AS n_events,
          |  round(sum(value), 2) AS sum_value
          |FROM events e JOIN customer c ON e.user_id = c.c_custkey
          |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // --- corrupt-record quarantine (resilient ingest): a deterministic
    //     11th of the JSON blobs is truncated to simulate upstream
    //     corruption; from_json's PERMISSIVE null marks them, good rows
    //     parse on, quarantined rows are counted — a malformed record
    //     must never kill a 100 TB ingest job OR silently vanish. The
    //     oracle mirrors with json_valid + json_extract. ---
    QueryDef(
      "q56_corrupt_quarantine",
      (s, dir) => {
        val mangled = Tables.t(s, dir, "events")
          .select(col("event_id"),
            when(col("event_id") % 11 === 0,
              expr("substring(props, 1, length(props) - 1)"))
              .otherwise(col("props")).as("raw"))
        val parsed = mangled.withColumn("k",
          from_json(col("raw"), lit("k BIGINT")).getField("k"))
        parsed.agg(
          count(lit(1)).as("n_total"),
          count(col("k")).as("n_good"),
          sum(when(col("k").isNull, 1L).otherwise(0L)).as("n_quarantined"),
          sum("k").as("sum_k_good"))
      },
      Some(
        """WITH m AS (
          |  SELECT event_id,
          |    CASE WHEN event_id % 11 = 0
          |         THEN substring(props, 1, length(props) - 1)
          |         ELSE props END AS raw
          |  FROM events),
          |p AS (SELECT CASE WHEN json_valid(raw)
          |               THEN CAST(json_extract_string(raw, '$.k') AS BIGINT)
          |             END AS k
          |      FROM m)
          |SELECT count(*) AS n_total, count(k) AS n_good,
          |  CAST(sum(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          |    AS n_quarantined,
          |  CAST(sum(k) AS BIGINT) AS sum_k_good
          |FROM p ORDER BY n_total""".stripMargin)),

    // --- time-series gap fill + last-observation-carried-forward over
    //     each user's daily value series (operators.GapFill): every
    //     observed row GENERATES its own gap days up to the next
    //     observation, so the carried value needs no second pass — one
    //     per-key window shuffle plus an output-sized explode, vs the
    //     spine-join formulation's three shuffles. ---
    QueryDef(
      "q57_gap_fill",
      (s, dir) => {
        val daily = Tables.t(s, dir, "events")
          .groupBy(col("user_id"), to_date(col("ts")).as("day"))
          .agg(round(sum("value"), 6).as("day_value"))
        GapFill.dailyLocf(daily, "user_id", "day", "day_value")
          .orderBy("user_id", "day")
      },
      Some(
        """WITH daily AS (SELECT user_id, CAST(ts AS DATE) AS day,
          |    round(sum(value), 6) AS day_value
          |  FROM events GROUP BY 1, 2),
          |x AS (SELECT user_id, day, day_value,
          |        lead(day) OVER (PARTITION BY user_id ORDER BY day) AS nxt
          |      FROM daily),
          |g AS (SELECT user_id, day AS src_day, day_value,
          |        unnest(generate_series(day::TIMESTAMP,
          |          coalesce((nxt - INTERVAL 1 DAY)::TIMESTAMP, day::TIMESTAMP),
          |          INTERVAL 1 DAY))::DATE AS day
          |      FROM x)
          |SELECT user_id, day, day_value, day <> src_day AS is_gap
          |FROM g ORDER BY user_id, day""".stripMargin)),

    // --- schema evolution: two generations of the orders feed (v1
    //     carries totalprice, v2 replaced it with orderpriority) unioned
    //     by COLUMN NAME with missing columns null-filled
    //     (unionByName(allowMissingColumns)) — the mixed-vintage read
    //     every long-lived 100 TB dataset eventually needs. Position-based
    //     union would silently mis-align; the oracle is DuckDB's
    //     UNION ALL BY NAME. ---
    QueryDef(
      "q58_schema_union",
      (s, dir) => {
        val o = Tables.t(s, dir, "orders")
        val v1 = o.filter(col("o_orderkey") % 2 === 0)
          .select("o_orderkey", "o_custkey", "o_totalprice")
        val v2 = o.filter(col("o_orderkey") % 2 === 1)
          .select("o_orderkey", "o_custkey", "o_orderpriority")
        v1.unionByName(v2, allowMissingColumns = true)
          .orderBy("o_orderkey")
      },
      Some(
        """SELECT o_orderkey, o_custkey, o_totalprice
          |FROM orders WHERE o_orderkey % 2 = 0
          |UNION ALL BY NAME
          |SELECT o_orderkey, o_custkey, o_orderpriority
          |FROM orders WHERE o_orderkey % 2 = 1
          |ORDER BY o_orderkey""".stripMargin)),

    // --- SQL-registered UDAF (untyped plugin ABI): the custom GeoMean
    //     Aggregator runs inside a SQL text through spark.udf.register —
    //     partial (sumLog, n) buffers merge map-side exactly like
    //     built-in avg, so the shuffle stays one row per (group,
    //     partition). Oracle identity: geomean(x) = exp(avg(ln(x))). ---
    QueryDef(
      "q59_sql_udaf",
      (s, dir) => {
        Tables.register(s, dir, "lineitem")
        s.udf.register("geomean", udaf(graft.functions.GeoMean))
        s.sql(
          """SELECT l_returnflag,
            |  round(geomean(CAST(l_quantity AS DOUBLE)), 6) AS geo_qty,
            |  count(*) AS n_rows
            |FROM lineitem GROUP BY l_returnflag
            |ORDER BY l_returnflag""".stripMargin)
      },
      Some(
        """SELECT l_returnflag,
          |  round(exp(avg(ln(CAST(l_quantity AS DOUBLE)))), 6) AS geo_qty,
          |  count(*) AS n_rows
          |FROM lineitem GROUP BY l_returnflag
          |ORDER BY l_returnflag""".stripMargin)),

    // --- UNPIVOT (wide -> long, the inverse of q31's pivot): built-in
    //     Dataset.unpivot == DuckDB UNPIVOT. count(CASE...) on both
    //     sides so the measure is BIGINT on both engines (DuckDB's
    //     sum(int) widens to HUGEINT). Pure per-row generator after the
    //     agg — no extra shuffle. ---
    QueryDef(
      "q60_unpivot",
      (s, dir) => {
        val wide = Tables.t(s, dir, "orders")
          .groupBy("o_orderstatus")
          .agg(
            count(when(col("o_orderpriority") === "1-URGENT", 1)).as("urgent"),
            count(when(col("o_orderpriority") === "2-HIGH", 1)).as("high"),
            count(when(col("o_orderpriority") === "3-MEDIUM", 1)).as("medium"))
        wide.unpivot(
            Array(col("o_orderstatus")),
            Array(col("urgent"), col("high"), col("medium")),
            "priority", "n")
          .orderBy("o_orderstatus", "priority")
      },
      Some(
        """WITH wide AS (SELECT o_orderstatus,
          |    count(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS urgent,
          |    count(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END) AS high,
          |    count(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END) AS medium
          |  FROM orders GROUP BY o_orderstatus)
          |SELECT o_orderstatus, priority, n FROM wide
          |UNPIVOT (n FOR priority IN (urgent, high, medium))
          |ORDER BY o_orderstatus, priority""".stripMargin)),

    // --- null-safe equality join (<=> / IS NOT DISTINCT FROM): the six
    //     per-priority aggregates join to themselves with '1-URGENT'
    //     mapped to NULL — plain = drops the NULL row, <=> keeps it, and
    //     the driver hash pins exactly that difference. ---
    QueryDef(
      "q61_nullsafe_join",
      (s, dir) => {
        def agg(nm: String) = Tables.t(s, dir, "orders")
          .groupBy(when(col("o_orderpriority") =!= "1-URGENT",
            col("o_orderpriority")).as("k"))
          .agg(count(lit(1)).as(nm))
        val a = agg("n_a"); val b = agg("n_b")
        a.join(b, a("k") <=> b("k"))
          .select(a("k").as("k"), col("n_a"), col("n_b"))
          .orderBy(col("k").asc_nulls_first)
      },
      Some(
        """WITH g AS (SELECT CASE WHEN o_orderpriority <> '1-URGENT'
          |         THEN o_orderpriority END AS k, count(*) AS n
          |  FROM orders GROUP BY 1)
          |SELECT a.k AS k, a.n AS n_a, b.n AS n_b
          |FROM g a JOIN g b ON a.k IS NOT DISTINCT FROM b.k
          |ORDER BY k NULLS FIRST""".stripMargin)),

    // --- skew-safe salted two-phase top-k (SkewRank): top-5 events per
    //     user in two exact phases — per-(user, salt) top-5, then an
    //     exact merge of the ≤ salts·5 survivors — so no single reducer
    //     ever holds more than salt-bounded state for a hot user. The
    //     salt provably cancels (any salt assignment yields the unsalted
    //     answer), which the plain-window DuckDB oracle pins — q55's
    //     salt-invariance pattern, lifted from joins to ranking. ---
    QueryDef(
      "q75_salted_topk",
      (s, dir) => SkewRank.topKSalted(
          Tables.t(s, dir, "events")
            .select(col("user_id"), col("event_id"), col("value")),
          groupCols = Seq("user_id"),
          orderCols = Seq(col("value").desc, col("event_id")),
          k = 5, salts = 8, saltCols = Seq(col("event_id")))
        .orderBy(col("user_id"), col("value").desc, col("event_id")),
      Some(
        """WITH r AS (SELECT user_id, event_id, value,
          |    row_number() OVER (PARTITION BY user_id
          |                       ORDER BY value DESC, event_id) AS rk
          |  FROM events)
          |SELECT user_id, event_id, value FROM r WHERE rk <= 5
          |ORDER BY user_id, value DESC, event_id""".stripMargin)),

    // --- per-group heavy hitters via the TopKFreq Misra-Gries UDAF (the
    //     typed, constructor-parameterized plugin-ABI instance beside
    //     q59's registered GeoMean): top-5 quantities per returnflag,
    //     capacity 256 >> the 50-value quantity domain, so every partial
    //     stays in the exact regime (q50's contract, per group) and the
    //     oracle is a plain exact count window. Keys are strings by the
    //     ABI, so the tie-break is STRING order — mirrored verbatim. ---
    QueryDef(
      "q76_group_heavy_hitters",
      (s, dir) => {
        val tf = udaf(new graft.functions.TopKFreq(5, 256),
          org.apache.spark.sql.Encoders.STRING)
        Tables.t(s, dir, "lineitem")
          .select(col("l_returnflag"),
            floor(col("l_quantity")).cast("int").cast("string").as("qkey"))
          .groupBy("l_returnflag")
          .agg(tf(col("qkey")).as("tk"))
          .select(col("l_returnflag"),
            posexplode(col("tk.items")).as(Seq("pos", "kc")))
          .select(col("l_returnflag"), (col("pos") + 1).cast("int").as("rank"),
            col("kc.key").as("qkey"), col("kc.cnt").as("cnt"))
          .orderBy("l_returnflag", "rank")
      },
      Some(
        """WITH k AS (SELECT l_returnflag,
          |    CAST(CAST(floor(l_quantity) AS INT) AS VARCHAR) AS qkey
          |  FROM lineitem),
          |c AS (SELECT l_returnflag, qkey, count(*) AS cnt
          |      FROM k GROUP BY 1, 2),
          |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY l_returnflag
          |        ORDER BY cnt DESC, qkey) AS INT) AS rank
          |      FROM c)
          |SELECT l_returnflag, rank, qkey, cnt FROM r WHERE rank <= 5
          |ORDER BY l_returnflag, rank""".stripMargin))
  )
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming slice (reference status: streaming ABSENT,
  * SURVEY.md §2.4). The `events` parquet directory doubles as a file
  * source; each transform here has a batch twin registered as an
  * oracle-checked query (q23 tumbling, q24 sliding, q25 sessionize), so
  * streaming correctness is established by batch equivalence — the
  * StreamingSpec runs these to a memory sink via processAllAvailable()
  * and compares against the batch results.
  *
  * Scale notes: watermarks bound all state; the windowed aggregations
  * shuffle on (window, key) exactly like their batch twins; file-source
  * backpressure comes from maxFilesPerTrigger in production.
  */
object EventStreams {

  /** The fixture generator has shipped events.ts as parquet
    * TIMESTAMP(NANOS) (readable only as raw long nanos) and as µs
    * timestamps without isAdjustedToUTC (NTZ under Spark's inference) —
    * so the stream source PROBES the file's actual ts type with a batch
    * footer read and adapts, mirroring Tables.t's source-boundary
    * normalization: either way the stream carries the classic µs
    * TIMESTAMP the batch twins (and watermarks/timers) expect.
    */
  def readEventStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // pre-3.4 semantics: µs-NTZ parquet reads directly as TIMESTAMP (the
    // stored micros are the same instants Tables.t's NTZ cast produces
    // under the UTC-pinned sessions)
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    val probed = spark.read.parquet(s"$dir/events.parquet").schema
    val tsIsNanosLong = probed("ts").dataType == LongType
    val schema = StructType(probed.map(f =>
      if (f.name == "ts" && !tsIsNanosLong) f.copy(dataType = TimestampType)
      else f))
    val raw = spark.readStream.schema(schema)
      .parquet(streamableDir(s"$dir/events.parquet"))
    if (tsIsNanosLong) // integer div: see Tables.t
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }

  /** The file stream source requires a directory; the fixtures ship
    * events as a single parquet file. Stage a symlink inside a temp dir
    * (fixtures are read-only) when handed a plain file.
    */
  private def streamableDir(path: String): String = {
    import java.nio.file.{Files, Paths}
    val p = Paths.get(path)
    if (Files.isDirectory(p)) path
    else {
      // key the staging dir on a SHA-256 of the FULL path (a 32-bit
      // String.hashCode collision between two fixture paths would
      // silently stream the wrong file), and verify a pre-existing
      // symlink actually points at this path before reusing it
      val digest = java.security.MessageDigest.getInstance("SHA-256")
        .digest(path.getBytes("UTF-8")).take(16)
        .map(b => f"$b%02x").mkString
      val d = Paths.get("/tmp/graft-stream", digest)
      Files.createDirectories(d)
      val link = d.resolve(p.getFileName)
      if (Files.isSymbolicLink(link)) {
        require(Files.readSymbolicLink(link) == p,
          s"staging collision: $link -> ${Files.readSymbolicLink(link)}, expected $p")
      } else if (Files.isRegularFile(link)) {
        // stale regular file from an interrupted run: we own /tmp/graft-
        // stream, so replace it (createSymbolicLink alone would throw
        // FileAlreadyExistsException)
        Files.delete(link)
        Files.createSymbolicLink(link, p)
      } else {
        require(!Files.exists(link),
          s"staging path $link is occupied by a directory; remove it manually")
        Files.createSymbolicLink(link, p)
      }
      d.toString
    }
  }

  /** Tumbling 1h window counts with a 1h watermark (batch twin: q23). */
  def tumblingCounts(events: DataFrame): DataFrame =
    events.withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(unix_timestamp(col("w.start")).as("win_start"),
        col("event_type"), col("n"), col("sum_value"))

  /** Sliding 1h/30m windows (batch twin: q24). */
  def slidingStats(events: DataFrame): DataFrame =
    events.withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
      .agg(count(lit(1)).as("n"),
        round(round(sum("value"), 2) / count(lit(1)), 6).as("avg_value"))
      .select(unix_timestamp(col("w.start")).as("win_start"),
        col("n"), col("avg_value"))

  /** Gap-based sessions via the built-in `session_window` (batch twin:
    * q40). Session state merges adjacent windows as events arrive; the
    * window's `end` is last-event + gap, so in append mode a session
    * emits exactly when the watermark passes its end (no later event can
    * extend it). State is bounded: one open session per (user, chain) at
    * most `gap` behind the watermark.
    */
  def sessionCounts(events: DataFrame): DataFrame =
    events.withWatermark("ts", "30 minutes")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("w.start")).as("session_start_us"),
        unix_micros(col("w.end")).as("session_end_us"),
        col("n_events"))

  /** Watermarked stream dedup on (user_id, event_type) —
    * dropDuplicatesWithinWatermark exercises streaming state eviction.
    */
  def dedupedEvents(events: DataFrame): DataFrame =
    events.withWatermark("ts", "30 minutes")
      .dropDuplicatesWithinWatermark("user_id", "event_type")

  /** Stream-stream interval join (batch twin: q21's error→click range
    * join): error events joined to the same user's click events within
    * 10 minutes. Both sides are watermarked and the join carries an
    * explicit event-time range, so Spark bounds BOTH state stores —
    * an error row is evictable once the click-side watermark passes
    * err_ts + 10 min, a click row once the error-side watermark passes
    * click_ts. Inner join ⇒ rows emit as they match (append mode).
    */
  def errorClickJoinStream(events: DataFrame): DataFrame = {
    val wm = events.withWatermark("ts", "1 hour")
    val errs = wm.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id").as("err_id"),
        col("ts").as("err_ts"))
    val clicks = wm.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    errs.join(clicks,
      col("user_id") === col("c_user") &&
        col("click_ts") > col("err_ts") &&
        col("click_ts") <= col("err_ts") + expr("INTERVAL 10 MINUTES"))
      .select(col("user_id"), col("err_id"), col("click_id"))
  }

  /** Stream-stream LEFT OUTER interval join: every error, with its
    * follow-up click when one exists, or nulls once the watermark proves
    * no click can arrive anymore. The outer side is what makes this a
    * genuinely stateful problem — the engine must HOLD each unmatched
    * error until `err_ts + 10 min` falls behind the watermark, then emit
    * the null-extended row and evict; without the event-time range
    * bounds on BOTH inputs the state store would grow forever. Batch
    * twin: a plain left join (MultimodalStreamingSpec proves equality on
    * watermark-closed rows).
    */
  def errorClickLeftJoinStream(events: DataFrame): DataFrame = {
    val wm = events.withWatermark("ts", "1 hour")
    val errs = wm.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id").as("err_id"),
        col("ts").as("err_ts"))
    val clicks = wm.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    errs.join(clicks,
      col("user_id") === col("c_user") &&
        col("click_ts") > col("err_ts") &&
        col("click_ts") <= col("err_ts") + expr("INTERVAL 10 MINUTES"),
      "left_outer")
      .select(col("user_id"), col("err_id"), col("click_id"))
  }

  /** Stream-static enrichment: the stream joins a STATIC dimension —
    * no watermark, no join state; the static side is (re)broadcast per
    * micro-batch. The 100 TB shape for dimension attachment: the stream
    * never shuffles, the dim is structurally small. (Static-side
    * updates are picked up on re-read for file-backed dims; a slowly
    * changing dim at scale is q62's SCD2 table joined the same way.)
    */
  def enrichWithSegment(events: DataFrame, customers: DataFrame): DataFrame =
    events.join(
      broadcast(customers.select(col("c_custkey").as("user_id"),
        col("c_mktsegment").as("segment"))),
      Seq("user_id"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("segment"))

  /** Run a streaming transform of the events source to completion against
    * the (static) fixture directory and return the result as a batch
    * DataFrame — used by tests to prove batch equivalence.
    */
  def runToMemory(spark: SparkSession, dir: String, name: String,
      mode: String = "complete")(
      transform: DataFrame => DataFrame): DataFrame = {
    val q = transform(readEventStream(spark, dir))
      .writeStream.outputMode(mode)
      .format("memory").queryName(name).start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
  }
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftext.CappedCheckpoint._
import graft.Scratch

/** Structured-Streaming ingestion for the engine: the same DataFrame
  * transforms run over `readStream` sources (incremental, watermarked) or
  * batch frames (backfill / verification) — write the plan once, execute in
  * either mode. This is how edge/event ingestion works at 100 TB: a
  * continuous stream maintains the aggregates; batch jobs recompute them for
  * audits with identical code.
  */
object EventStream {

  /** Normalize the event-time column: testdata parquet stores TIMESTAMP in
    * nanos, which Spark (with spark.sql.legacy.parquet.nanosAsLong=true)
    * surfaces as LongType — convert to a proper timestamp via exact integer
    * division (DIV, not double division: 2024-epoch nanos exceed double's
    * 53-bit mantissa).
    */
  def normalizeTs(events: DataFrame): DataFrame =
    events.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        events.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // watermarks require TIMESTAMP; exact under the UTC session tz
        events.withColumn("ts", col("ts").cast("timestamp"))
      case _ => events
    }

  /** Tumbling-window counts + value sums per event type. On a streaming
    * input compose with `withEventWatermark` first; on a batch input it is a
    * plain group-agg. `window_start` is the aligned window open time.
    */
  def windowedTypeCounts(events: DataFrame, windowLen: String = "1 hour"): DataFrame =
    normalizeTs(events)
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(20,6)")).as("sum_value_dec"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value_dec").cast("double").as("sum_value"))

  def withEventWatermark(events: DataFrame, delay: String = "10 minutes"): DataFrame =
    normalizeTs(events).withWatermark("ts", delay)

  /** Top-k event types per window by count (deterministic tie-break on
    * type) over a `windowedTypeCounts`-shaped frame — the per-window
    * leaderboard view a monitoring pipeline derives from the streamed
    * aggregate. The rank filter plans as WindowGroupLimit, so each
    * partition forwards at most k rows per window before the exchange;
    * state stays (windows-in-flight x k) regardless of type cardinality.
    */
  def topKPerWindow(windowed: DataFrame, k: Int = 3): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("window_start").orderBy(desc("n_events"), asc("event_type"))
    // filter the raw rank (cast only afterward): an intermediate cast
    // between row_number and its filter defeats the WindowGroupLimit match
    windowed
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("window_start"), col("rk").cast("long").as("rk"),
        col("event_type"), col("n_events"))
  }

  /** Sliding (hopping) window counts per event type: each event lands in
    * duration/slide overlapping windows (Spark materializes the expansion
    * then aggregates — the same plan streaming uses, state bounded by
    * windows-in-flight x types). Epoch-aligned window starts, so a DuckDB
    * oracle reproduces them with time_bucket arithmetic exactly.
    */
  def slidingTypeCounts(events: DataFrame, duration: String = "1 hour",
                        slide: String = "30 minutes"): DataFrame =
    normalizeTs(events)
      .groupBy(window(col("ts"), duration, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(20,6)")).as("sum_value_dec"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value_dec").cast("double").as("sum_value"))

  /** MERGE/upsert semantics over a changelog: keep each key's latest row
    * (by the deterministic `orderCols` tuple, descending) and drop keys
    * whose final operation is a delete — the changelog -> table-state
    * compaction a lakehouse MERGE INTO performs, as one per-key window
    * top-1 (WindowGroupLimit: partitions forward one row per key before
    * the exchange) plus a filter. No global sort, no driver state; at
    * 100 TB this is the standard incremental-compaction shape, run per
    * partition of the log.
    */
  def applyChangelog(log: DataFrame, keyCol: String, opCol: String,
                     orderCols: Seq[String], deleteOp: String = "D"): DataFrame = {
    require(orderCols.nonEmpty, "need at least one ordering column")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCol).orderBy(orderCols.map(c => col(c).desc): _*)
    log.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
      .filter(col(opCol) =!= deleteOp)
  }

  /** Per-key time-weighted average (TWAP): each observation holds until the
    * next one, so the average is sum(value_i * dt_i) / (t_last - t_first)
    * over consecutive gaps — the step-function integral, in exact integer
    * arithmetic (cent values x exact-microsecond gaps accumulate in
    * DECIMAL(38,0); the final integral division is engine-portable, and the
    * time unit cancels exactly in the quotient). The gap MUST be computed on
    * integer epoch micros, not `ts - ts`: a timestamp difference is a
    * DayTimeInterval whose cast to DECIMAL(38,0) rounds each gap to whole
    * seconds, silently re-weighting the average. One window pass for the
    * lead + one per-key aggregation; keys with fewer than two events have
    * no time span and are omitted.
    */
  def timeWeightedAverage(events: DataFrame, keyCol: String = "user_id"):
      DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCol).orderBy("tn", "event_id")
    val tn = events.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => col("ts") // integer nanos
      case _ => unix_micros(col("ts").cast("timestamp")) // NTZ→TZ exact under UTC session tz
    }
    events
      .select(col(keyCol), col("event_id"), tn.as("tn"),
        floor(col("value") * 100).cast("long").as("cents"))
      .withColumn("nts", lead("tn", 1).over(w))
      .filter(col("nts").isNotNull)
      .groupBy(keyCol)
      .agg(sum(((col("nts") - col("tn")).cast("decimal(38,0)") * col("cents")))
          .as("num"),
        sum((col("nts") - col("tn")).cast("decimal(38,0)")).as("den"),
        count(lit(1)).as("n_gaps"))
      .selectExpr(keyCol, "n_gaps", "CAST(num DIV den AS BIGINT) AS twap_cents")
  }

  /** CDC compaction: the latest row per key (event time desc, then the
    * tie-break column desc — deterministic on replayed logs). This is the
    * changelog -> current-state view: one shuffle on the key, a per-key
    * window top-1, no global sort. The streaming analogue keeps one row of
    * state per live key via max-ts upsert; the batch plan here is what a
    * backfill/compaction job runs over the full log.
    */
  def latestByKey(events: DataFrame, keyCol: String, tsCol: String = "ts",
                  tieCol: String = "event_id"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCol).orderBy(desc(tsCol), desc(tieCol))
    normalizeTs(events).withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
  }

  /** Per-type hourly anomaly z-scores from integer-exact moments: hourly
    * counts n are BIGINT, per-type sum(n), sum(n*n), hours are BIGINT, and
    * mean/variance/z are derived by a FIXED sequence of IEEE double ops on
    * those exact integers — identical in any engine, so the quantized score
    * floor(z*1e4) is replayable bit-for-bit (never stddev_samp, whose
    * streaming accumulation is order-dependent). Hours with zero events of
    * a type don't exist in the series (absence semantics). Output: flagged
    * hours with |z_q| >= thresholdQ. Two aggregations + one broadcast-sized
    * join of per-type moments back onto hourly rows — no window over the
    * raw events.
    */
  def hourlyAnomalies(events: DataFrame, thresholdQ: Long = 20000): DataFrame = {
    val hourly = normalizeTs(events)
      .groupBy(date_trunc("hour", col("ts")).as("window_start"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
    val moments = hourly.groupBy("event_type").agg(
      count(lit(1)).as("n_hours"),
      sum("n_events").as("sum_n"),
      sum(expr("n_events * n_events")).as("sum_n2"))
      .filter(col("n_hours") >= 2)
    hourly.join(broadcast(moments), Seq("event_type"))
      .withColumn("mean", expr("CAST(sum_n AS DOUBLE) / CAST(n_hours AS DOUBLE)"))
      .withColumn("varr", expr(
        """(CAST(sum_n2 AS DOUBLE) - CAST(sum_n AS DOUBLE) * mean)
           / CAST(n_hours - 1 AS DOUBLE)"""))
      .withColumn("z_q", expr(
        """if(varr <= 0, CAST(0 AS BIGINT),
           CAST(floor((CAST(n_events AS DOUBLE) - mean) / sqrt(varr) * 10000)
             AS BIGINT))"""))
      .filter(abs(col("z_q")) >= thresholdQ)
      .select("window_start", "event_type", "n_events", "z_q")
  }

  /** Per-key rate limiting: keep at most `k` events per (key, hour), in
    * event order (ts, then the tie column) — the deterministic
    * abuse/flood-control filter of an ingestion pipeline. One shuffle on
    * (key, hour); the per-group top-k window plans as a partial
    * WindowGroupLimit, so at most k rows per (key, hour) leave each map
    * task. The streaming analogue keeps one counter per live (key, hour)
    * of state, evicted by watermark.
    */
  def rateLimit(events: DataFrame, keyCol: String, k: Int,
                tsCol: String = "ts", tieCol: String = "event_id"): DataFrame = {
    require(k >= 1, "keep at least one event per key-hour")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol), col("hr")).orderBy(asc(tsCol), asc(tieCol))
    normalizeTs(events)
      .withColumn("hr", date_trunc("hour", col(tsCol)))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k).drop("rn")
  }

  /** Rolling N-day per-key features: for every (key, active day), the
    * event count and exact cent total over the trailing `days`-day window
    * — classic behavioral feature generation. The daily rollup happens
    * FIRST (one shuffle over (key, day) — never a window over raw events),
    * then a RANGE-framed window over integer day numbers computes the
    * trailing sums; per-key state in the window is bounded by `days` rows.
    */
  def rollingDailyCounts(events: DataFrame, keyCol: String = "user_id",
                         days: Int = 7): DataFrame = {
    require(days >= 1, "window of at least one day")
    val daily = normalizeTs(events)
      .groupBy(col(keyCol), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(floor(value * 100) AS BIGINT)")).as("cents"))
      .withColumn("dnum", datediff(col("day"), lit("1970-01-01")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCol).orderBy("dnum")
      .rangeBetween(-(days - 1).toLong, 0)
    daily
      .select(col(keyCol), col("day"),
        sum("n").over(w).as("roll_n"),
        sum("cents").over(w).as("roll_cents"))
  }

  /** SCD type-2 history from a changelog: each (key, event) row becomes a
    * validity interval [effective_from, effective_to) with the NEXT change
    * closing it (open-ended NULL for the current row) plus an is_current
    * flag — the warehouse dimension-history layout, derived with one
    * shuffle on the key and a per-key lead() window (no self-join).
    */
  def scd2History(events: DataFrame, keyCol: String, tsCol: String = "ts",
                  tieCol: String = "event_id"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCol).orderBy(asc(tsCol), asc(tieCol))
    normalizeTs(events)
      .withColumn("effective_from", col(tsCol))
      .withColumn("effective_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("effective_to").isNull)
  }

  /** Cohort retention: users grouped by the calendar day of their FIRST
    * event (the cohort), counted by how many are active again `day_offset`
    * days later. Two aggregations (per-user first day; distinct
    * (cohort, offset, user) counts) — the classic growth-analytics rollup,
    * exact integers throughout.
    */
  def cohortRetention(events: DataFrame): DataFrame = {
    val ev = normalizeTs(events)
      .select(col("user_id"), to_date(col("ts")).as("day"))
    val cohort = ev.groupBy("user_id").agg(min("day").as("cohort_day"))
    ev.join(cohort, Seq("user_id"))
      .select(col("cohort_day"), datediff(col("day"), col("cohort_day")).as("day_offset"),
        col("user_id"))
      .distinct()
      .groupBy("cohort_day", "day_offset").agg(count(lit(1)).as("n_users"))
  }

  /** Gap-based sessionization with Spark's native `session_window`: events
    * of one user belong to one session while consecutive gaps stay under
    * `gap`; a gap >= `gap` closes the session. Works identically over batch
    * and `readStream` input (with a watermark, session state is evicted once
    * the watermark passes the session end — bounded state). One shuffle on
    * (user, session); output is one summary row per session. The session
    * window's `end` is last event time + gap by definition.
    */
  def sessionize(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    normalizeTs(events)
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(20,6)")).as("sum_value_dec"))
      .select(col("user_id"), col("w.start").as("t_start"), col("w.end").as("t_end"),
        col("n_events"), col("sum_value_dec").cast("double").as("sum_value"))

  /** Streaming exact dedup: keep the first row per key, dropping duplicates
    * that arrive within the watermark delay of each other — the streaming
    * analogue of `Dedup.exactDedup` with state bounded by the watermark
    * (keys older than the watermark are evicted, so state size tracks the
    * key arrival rate x delay, not stream length). Use a fingerprint column
    * (e.g. `TextAnalysis.fingerprint`) as the key for content dedup.
    */
  def streamingDedup(events: DataFrame, keys: Seq[String],
                     delay: String = "10 minutes"): DataFrame =
    withEventWatermark(events, delay).dropDuplicatesWithinWatermark(keys)

  /** Incremental edge ingestion: events become (user -> event_type) edges;
    * streaming-side dedup of parallel edges per window = the effective-edges
    * op maintained continuously.
    */
  def eventsAsEdges(events: DataFrame): DataFrame =
    events.select(col("user_id").as("source"), col("event_type").as("target"),
      col("value").as("weight"), col("ts"))

  /** Streaming graph maintenance (SURVEY §2.9 phase 3): `eventsAsEdges`
    * composed with the effective-edges aggregation as one watermarked
    * windowed agg — parallel edges within each tumbling window collapse to a
    * single weighted edge, continuously. Batch-or-stream like every other
    * transform here; on a stream in append mode each (window, edge) row is
    * final when emitted, so the sink can upsert the live edge table without
    * reconciliation. One shuffle on (window, source, target); state bounded
    * by windows in flight x live edge keys.
    */
  def effectiveEdgesWindowed(events: DataFrame,
                             windowLen: String = "1 hour"): DataFrame =
    eventsAsEdges(normalizeTs(events))
      .groupBy(window(col("ts"), windowLen).as("w"),
        col("source"), col("target"))
      .agg(count(lit(1)).as("n_parallel"),
        sum(col("weight").cast("decimal(20,6)")).as("w_dec"))
      .select(col("w.start").as("window_start"), col("source"), col("target"),
        col("n_parallel"), col("w_dec").cast("double").as("weight"))

  /** Stream-stream interval self-join: each `leftType` event picks up every
    * `rightType` event of the same user from the preceding `within` interval
    * (attribution: views leading to a click, errors preceding a purchase).
    * Batch input -> an ordinary range join; streaming input -> Spark's
    * watermarked stream-stream join, where the time-range predicate bounds
    * each side's buffered state to (watermark delay + within) — the state
    * eviction contract that makes this run forever at ingest scale. Inner
    * join, so rows emit as soon as both sides arrive (no finalization wait).
    */
  def intervalJoin(events: DataFrame, leftType: String, rightType: String,
                   within: String): DataFrame = {
    val ev = normalizeTs(events)
    val l = ev.filter(col("event_type") === leftType)
      .select(col("event_id").as("l_id"), col("user_id"), col("ts").as("l_ts"))
    val r = ev.filter(col("event_type") === rightType)
      .select(col("event_id").as("r_id"), col("user_id").as("r_user"),
        col("ts").as("r_ts"))
    l.join(r, col("user_id") === col("r_user") &&
        col("r_ts") >= col("l_ts") - expr(s"INTERVAL $within") &&
        col("r_ts") <= col("l_ts"))
      .select(col("l_id"), col("r_id"), col("user_id"),
        col("l_ts"), col("r_ts"))
  }

  /** Left-outer stream-stream interval self-join: like `intervalJoin`, but
    * every `leftType` event emits — matched rows as soon as both sides
    * arrive, UNMATCHED rows with a null right side only once the watermark
    * passes the point where a match is provably impossible (r_ts <= l_ts,
    * so once the watermark clears l_ts the right side can never again
    * produce a partner, the left row's state is evicted, and the null row
    * emits). Left rows still open when the input drains are NOT emitted —
    * the same watermark-finalization contract as `runStreamingAppend`.
    * This is the attribution shape "every click, with its preceding view
    * if any": the outer semantics are what state eviction makes possible
    * at unbounded-stream scale.
    */
  def intervalJoinLeftOuter(events: DataFrame, leftType: String,
                            rightType: String, within: String): DataFrame = {
    val ev = normalizeTs(events)
    val l = ev.filter(col("event_type") === leftType)
      .select(col("event_id").as("l_id"), col("user_id"), col("ts").as("l_ts"))
    val r = ev.filter(col("event_type") === rightType)
      .select(col("event_id").as("r_id"), col("user_id").as("r_user"),
        col("ts").as("r_ts"))
    l.join(r, col("user_id") === col("r_user") &&
        col("r_ts") >= col("l_ts") - expr(s"INTERVAL $within") &&
        col("r_ts") <= col("l_ts"), "left_outer")
      .select(col("l_id"), col("r_id"), col("user_id"),
        col("l_ts"), col("r_ts"))
  }

  /** Drive `intervalJoinLeftOuter` through the real outer stream-stream
    * join machinery (watermarked branches, state eviction emitting the
    * null rows, memory sink).
    */
  def runIntervalJoinLeftStream(spark: SparkSession, parquetPath: String,
                                leftType: String = "click",
                                rightType: String = "view",
                                within: String = "4 hours",
                                delay: String = "10 minutes",
                                queryName: String = "interval_join_left"): DataFrame = {
    val schema = spark.read.parquet(parquetPath).schema
    val src = spark.readStream.schema(schema).parquet(stageDir(parquetPath))
    val joined = intervalJoinLeftOuter(withEventWatermark(src, delay),
      leftType, rightType, within)
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName(queryName).start()
    drainAndDetach(spark, q, queryName)
  }

  /** Drive `intervalJoin` through the real stream-stream join machinery
    * (two watermarked branches of one file source, memory sink).
    */
  def runIntervalJoinStream(spark: SparkSession, parquetPath: String,
                            leftType: String = "click",
                            rightType: String = "view",
                            within: String = "10 minutes",
                            delay: String = "10 minutes",
                            queryName: String = "interval_join"): DataFrame = {
    val schema = spark.read.parquet(parquetPath).schema
    val src = spark.readStream.schema(schema).parquet(stageDir(parquetPath))
    val joined = intervalJoin(withEventWatermark(src, delay), leftType,
      rightType, within)
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName(queryName).start()
    drainAndDetach(spark, q, queryName)
  }

  /** Custom streaming state via `flatMapGroupsWithState` — the escape hatch
    * for per-key logic no built-in stateful operator expresses. Here: exact
    * running totals per user in event order, accumulated in cent-quantized
    * longs so the trajectory is engine-exact. State = (last total) per user,
    * carried across microbatches; each batch's group iterator is sorted
    * in-memory on (ts, event_id) before folding — per-GROUP batch data must
    * fit an executor (true for any real per-user stream; the watermark keys
    * this to live users only in production).
    */
  def runningTotals(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val typed = normalizeTs(events)
      .select(col("event_id").cast("long"), col("user_id").cast("long"),
        col("ts").cast("timestamp"),
        floor(col("value").cast("double") * 100).cast("long").as("cents"))
      .as[(Long, Long, java.sql.Timestamp, Long)]
    def fold(user: Long,
             rows: Iterator[(Long, Long, java.sql.Timestamp, Long)],
             state: GroupState[Long]): Iterator[(Long, Long, Long)] = {
      var total = state.getOption.getOrElse(0L)
      // full-precision order: getTime is millis only; getNanos carries the
      // sub-millisecond part, matching the oracle's ORDER BY ts, event_id
      val out = rows.toArray.sortBy(r => (r._3.getTime, r._3.getNanos, r._1)).map { r =>
        total += r._4
        (r._1, user, total)
      }
      state.update(total)
      out.iterator
    }
    typed.groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(fold)
      .toDF("event_id", "user_id", "running_cents")
  }

  /** Drive `runningTotals` through the streaming engine (file source ->
    * stateful flatMapGroupsWithState -> memory sink). Event-order exactness
    * holds per microbatch (one parquet file = one batch here); a production
    * stream wanting cross-batch order exactness buffers per key until the
    * watermark — the state plumbing is identical.
    */
  def runRunningTotalsStream(spark: SparkSession, parquetPath: String,
                             queryName: String = "running_totals"): DataFrame = {
    val schema = spark.read.parquet(parquetPath).schema
    val src = spark.readStream.schema(schema).parquet(stageDir(parquetPath))
    val q = runningTotals(src).writeStream.outputMode("append")
      .format("memory").queryName(queryName).start()
    drainAndDetach(spark, q, queryName)
  }

  /** Drive `effectiveEdgesWindowed` through the real streaming machinery in
    * append mode (watermark-finalized windows only) — the continuous
    * edge-table maintenance job, memory-sinked for verification.
    */
  def runEdgesStream(spark: SparkSession, parquetPath: String,
                     windowLen: String = "1 hour",
                     delay: String = "10 minutes",
                     queryName: String = "edges_stream"): DataFrame = {
    val schema = spark.read.parquet(parquetPath).schema
    val srcPath = stageDir(parquetPath)
    val src = spark.readStream.schema(schema).parquet(srcPath)
    val agg = effectiveEdgesWindowed(withEventWatermark(src, delay), windowLen)
    val q = agg.writeStream.outputMode("append").format("memory")
      .queryName(queryName).start()
    drainAndDetach(spark, q, queryName)
  }

  /** Ordered conversion funnel over event types: per user, the first
    * stage-1 event, the first stage-2 event strictly after it, the first
    * stage-3 event after that, and so on — emitted as one row of per-stage
    * user counts (n_<stage>). Each stage is one filtered user-keyed min
    * aggregation + one join against the previous stage's first-timestamp
    * table, so per-stage state is one timestamp per surviving user — never
    * a window over the full event history.
    */
  def funnelCounts(events: DataFrame, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "at least one stage")
    val ev = normalizeTs(events)
    var prev = ev.filter(col("event_type") === stages.head)
      .groupBy("user_id").agg(min("ts").as("t"))
      .localCheckpointCapped()
    var result = prev.agg(count(lit(1)).as(s"n_${stages.head}"))
    for (st <- stages.tail) {
      val next = ev.filter(col("event_type") === st)
        .join(prev.select(col("user_id"), col("t").as("pt")), Seq("user_id"))
        .filter(col("ts") > col("pt"))
        .groupBy("user_id").agg(min("ts").as("t"))
        .localCheckpointCapped()
      result = result.crossJoin(next.agg(count(lit(1)).as(s"n_$st")))
      prev = next
    }
    result
  }

  /** Drive `slidingTypeCounts` through the streaming engine in APPEND mode:
    * each overlapping window emits exactly once, after the watermark passes
    * its end, then drops its state — so sliding-window state is bounded by
    * (duration/slide) concurrent windows x live types, regardless of stream
    * length. Windows still open when the input drains are withheld (the
    * production finalization contract, same as `runStreamingAppend`).
    */
  def runSlidingStream(spark: SparkSession, parquetPath: String,
                       duration: String = "1 hour",
                       slide: String = "30 minutes",
                       delay: String = "10 minutes",
                       queryName: String = "sliding_stream"): DataFrame = {
    val schema = spark.read.parquet(parquetPath).schema
    val src = spark.readStream.schema(schema).parquet(stageDir(parquetPath))
    val agg = slidingTypeCounts(withEventWatermark(src, delay), duration, slide)
    val q = agg.writeStream.outputMode("append").format("memory")
      .queryName(queryName).start()
    drainAndDetach(spark, q, queryName)
  }

  /** Drive `streamingDedup` over a parquet directory through the real
    * microbatch machinery, projecting only the dedup keys — key-only output
    * keeps the result independent of which duplicate arrives first inside a
    * batch, so the streamed result equals the batch DISTINCT regardless of
    * partition processing order.
    */
  def runDedupStream(spark: SparkSession, parquetPath: String,
                     keys: Seq[String], delay: String = "10 minutes",
                     queryName: String = "dedup_stream"): DataFrame = {
    val schema = spark.read.parquet(parquetPath).schema
    val src = spark.readStream.schema(schema).parquet(stageDir(parquetPath))
    val d = streamingDedup(src, keys, delay)
      .select(keys.map(col): _*)
    val q = d.writeStream.outputMode("append").format("memory")
      .queryName(queryName).start()
    drainAndDetach(spark, q, queryName)
  }

  /** Stream-static broadcast enrichment: a streaming fact source joined to a
    * static dimension table — the canonical streaming feature-enrichment
    * shape. The static side is broadcast, so the join is stateless (no
    * watermark, no streaming state beyond the running aggregate); counts and
    * exact cent totals roll up by (dimension attribute, event type). At
    * 100 TB the same plan runs continuously with the dimension refreshed per
    * microbatch; only the memory sink is test-harness-specific.
    */
  def runEnrichedStream(spark: SparkSession, parquetPath: String,
                        dim: DataFrame, dimKey: String, attrCol: String,
                        queryName: String = "enriched_stream"): DataFrame = {
    val schema = spark.read.parquet(parquetPath).schema
    val src = spark.readStream.schema(schema).parquet(stageDir(parquetPath))
    val agg = src.join(broadcast(dim), src("user_id") === dim(dimKey))
      .groupBy(col(attrCol), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(floor(value * 100) AS BIGINT)")).as("cents"))
    val q = agg.writeStream.outputMode("complete").format("memory")
      .queryName(queryName).start()
    drainAndDetach(spark, q, queryName)
  }

  /** Drain a memory-sink streaming query, then DETACH its result from the
    * session. A memory sink buffers its whole output on the JVM heap for
    * as long as its temp view stays registered, and every runner here
    * names its view uniquely per invocation — so a long-lived session (a
    * REPL running streaming passes all day, a 313-query bench JVM, a test
    * suite) would otherwise accumulate every finished stream's buffer and
    * catalog entry forever. The outputs the GATED queries produce are
    * small by design (watermark-finalized aggregates), but the runner API
    * is generic over any corpus — detaching is the behavior a long-lived
    * service needs. One eager localCheckpoint moves the rows to
    * block-manager storage (freed by normal unpersist hygiene or session
    * stop), then the view is dropped and the sink becomes garbage.
    * Row-identical to reading the sink table directly.
    */
  private def drainAndDetach(spark: SparkSession,
      q: org.apache.spark.sql.streaming.StreamingQuery,
      queryName: String): DataFrame = {
    try q.processAllAvailable()
    finally q.stop()
    val out = spark.table(queryName).localCheckpointCapped()
    spark.catalog.dropTempView(queryName)
    out
  }

  // the file-stream source requires a DIRECTORY; stage single files into a
  // scratch dir via symlink
  private[streaming] def stageDir(parquetPath: String): String = {
    val f = new java.io.File(parquetPath)
    if (f.isDirectory) parquetPath
    else {
      val d = java.nio.file.Files.createTempDirectory("graft_stream_")
      java.nio.file.Files.createSymbolicLink(
        d.resolve(f.getName), f.toPath.toAbsolutePath)
      d.toString
    }
  }

  /** Run a batch-equivalent streaming pass over a parquet directory using the
    * memory sink — drives the exact streaming machinery (source -> watermark
    * -> stateful window agg -> sink) synchronously for tests/smoke.
    */
  def runStreamingOnce(spark: SparkSession, parquetPath: String,
                       windowLen: String = "1 hour",
                       queryName: String = "event_stream_out"): DataFrame = {
    val schema = spark.read.parquet(parquetPath).schema
    val srcPath = stageDir(parquetPath)
    val src = spark.readStream.schema(schema).parquet(srcPath)
    val agg = windowedTypeCounts(withEventWatermark(src), windowLen)
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .start()
    drainAndDetach(spark, q, queryName)
  }

  /** Chained-stateful streaming pass: watermark -> streaming dropDuplicates
    * on (window, user) -> windowed distinct-user count, append mode. Two
    * stateful operators in one query (Spark 3.4+ multi-stateful support):
    * the dedup state holds one entry per (window, user) until the watermark
    * passes the window end, the aggregation state one row per window —
    * exact streaming COUNT(DISTINCT) with bounded state, which a single
    * stateful aggregate cannot express. Only watermark-finalized windows
    * emit (the production contract, same as `runStreamingAppend`).
    */
  def runUniquesStream(spark: SparkSession, parquetPath: String,
                       windowLen: String = "1 hour",
                       delay: String = "10 minutes",
                       queryName: String = "stream_uniques"): DataFrame = {
    val schema = spark.read.parquet(parquetPath).schema
    val srcPath = stageDir(parquetPath)
    val src = spark.readStream.schema(schema).parquet(srcPath)
    val dedup = withEventWatermark(src, delay)
      .select(window(col("ts"), windowLen).as("w"), col("user_id"))
      .dropDuplicates("w", "user_id")
    val agg = dedup
      .groupBy(col("w"))
      .agg(count(lit(1)).as("n_users"))
      .select(col("w.start").as("window_start"), col("n_users"))
    val q = agg.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .start()
    drainAndDetach(spark, q, queryName)
  }

  /** Streaming connected-component maintenance (SURVEY §2.9 phase 3): a
    * foreachBatch runner that keeps a live (id, component) label table over
    * an events-derived edge stream. Each micro-batch contributes delta
    * edges (source = user_id, target = event_id % targetMod — the same
    * synthetic-hub scheme as the customer graph); new endpoints enter as
    * their own singleton components, then
    * `GraphAlgorithms.incrementalComponents` merges only the QUOTIENT
    * graph touched by the batch (label-pairs of the delta, a graph of
    * components, exponentially smaller than the node space) — per batch
    * the cost is the delta, never a full recompute. Labels are min-node-id
    * based and component merging is CONFLUENT: the final table equals the
    * batch weak-CC labels over the union of all edges REGARDLESS of how
    * the stream was micro-batched, which is what makes the result
    * deterministic (and externally verifiable) even though file-source
    * batch boundaries are an implementation detail. The input is staged as
    * `chunks` deterministic parquet files consumed `filesPerTrigger` per
    * micro-batch, so the runner genuinely exercises multi-batch
    * incremental maintenance rather than one big batch. filesPerTrigger
    * defaults to 2 (round 15): a chunk-count profile at sf0.1 measured
    * the per-micro-batch machinery as THE dominant term — ~2.5 s per
    * extra batch over a ~7-9 s floor (6 single-file batches 15.5-20.4 s,
    * 3 batches ~8.6 s, flat below that) — and CONFLUENCE makes trigger
    * width output-invariant (spec-pinned), unlike the drift monitor whose
    * per-batch histograms must stay at 1 file per trigger.
    */
  def runComponentsStream(spark: SparkSession, parquetPath: String,
                          chunks: Int = 6, everyNth: Int = 10,
                          targetMod: Int = 211,
                          queryName: String = "cc_stream",
                          filesPerTrigger: Int = 2): DataFrame = {
    require(chunks >= 1, "need at least one chunk")
    require(filesPerTrigger >= 1, "need at least one file per trigger")
    val edges = spark.read.parquet(parquetPath)
      .filter(col("event_id") % everyNth === 0)
      .select(col("user_id").cast("long").as("source"),
        (col("event_id") % targetMod).cast("long").as("target"),
        col("event_id").cast("long").as("event_id"))
    val stage = stageChunks(spark,
      s"cc|$parquetPath|$chunks|$everyNth|$targetMod",
      edges, expr(s"(event_id DIV $everyNth) % $chunks"), chunks)
    val src = spark.readStream.schema(edges.schema)
      .option("maxFilesPerTrigger", filesPerTrigger.toString).parquet(stage)
    // the label table lives across batches; foreachBatch bodies run
    // serially on the driver, so plain var state is safe
    var labels: DataFrame =
      edges.select(col("source").as("id"), col("source").as("component")).limit(0)
    val q = src.writeStream
      .queryName(queryName)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val e = batch.select(col("source"), col("target"))
        val ends = e.select(col("source").as("id"))
          .union(e.select(col("target").as("id"))).distinct()
        val fresh = ends.join(labels.select("id"), Seq("id"), "left_anti")
          .select(col("id"), col("id").as("component"))
        labels = graft.GraphAlgorithms
          .incrementalComponents(labels.union(fresh), e)
          .localCheckpointCapped()
        ()
      }
      .start()
    try q.processAllAvailable()
    finally q.stop()
    labels
  }

  /** Streaming data-quality drift monitor: each micro-batch's token-length
    * histogram is compared (total-variation distance, integral ppm — the
    * `Curation.lengthDrift` statistic) against the static full-corpus
    * reference histogram, the production "is today's ingest shaped like the
    * corpus" gate. The corpus is staged as `chunks` deterministic parquet
    * files (chunk = doc_id mod chunks) consumed one per trigger, so the
    * runner genuinely exercises batch-at-a-time monitoring; the emitted
    * chunk id derives from batch CONTENT (doc_id mod chunks — constant
    * within a staged file), not the engine's batch counter, so the result
    * is independent of file-listing order.
    *
    * Scale shape: per batch one bin aggregation over the batch (map-side
    * combinable, <= maxBin+1 rows out) + pure driver arithmetic on two
    * histogram arrays (fixed-size artifacts). The reference histogram is
    * computed once per run. State across batches: none — each batch is
    * judged independently, so the monitor runs forever at ingest rate.
    */
  def runDriftStream(spark: SparkSession, parquetPath: String,
                     chunks: Int = 5, binWidth: Int = 32, maxBin: Int = 15,
                     queryName: String = "drift_stream"): DataFrame = {
    require(chunks >= 1 && binWidth >= 1 && maxBin >= 0, "bad parameters")
    val docs = spark.read.parquet(parquetPath)
    val binOf = least(
      expr(s"CAST(size(split(text, ' ')) AS BIGINT) div ${binWidth}L"),
      lit(maxBin.toLong))
    // static reference: full-corpus histogram in ppm (floor division)
    val refRows = docs.select(binOf.as("b")).groupBy("b").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val refTotal = refRows.values.sum
    val refPpm = refRows.map { case (b, c) => b -> c * 1000000L / refTotal }
    val stage = stageChunks(spark, s"drift|$parquetPath|$chunks",
      docs, col("doc_id") % chunks, chunks)
    val src = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(stage)
    val results = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long)]
    val q = src.writeStream
      .queryName(queryName)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val rows = batch.select((col("doc_id") % chunks).cast("int").as("chunk"),
            binOf.as("b"))
          .groupBy("chunk", "b").count().collect()
        // with maxFilesPerTrigger=1 and one staged file per chunk a batch
        // holds a single chunk, but that is an engine detail — group the
        // driver-side TV arithmetic by chunk so a batch spanning two staged
        // files can never silently mix two distributions into one number
        rows.groupBy(_.getInt(0)).toSeq.sortBy(_._1).foreach { case (chunk, rs) =>
          val counts = rs.map(r => r.getLong(1) -> r.getLong(2)).toMap
          val nDocs = counts.values.sum
          // TV over the reference's bin grid — a bin the batch misses
          // contributes |0 - ref share|; a batch length bin outside the
          // reference cannot exist (the reference covers the full corpus)
          val sumAbs = refPpm.map { case (b, rp) =>
            math.abs(counts.getOrElse(b, 0L) * 1000000L / nDocs - rp)
          }.sum
          results += ((chunk, nDocs, sumAbs / 2))
        }
        ()
      }
      .start()
    try q.processAllAvailable()
    finally q.stop()
    import spark.implicits._
    results.toSeq.toDF("chunk", "n_docs", "tv_ppm")
  }

  /** Per-(JVM, source, params) cache of staged chunk directories — bench
    * warmup plus timed runs of q_drift_stream/q_cc_stream reuse one staging
    * pass instead of rewriting the corpus on every execution (the
    * ioDirs/orcDirs discipline from SparkEntry).
    */
  private val chunkStageDirs =
    scala.collection.concurrent.TrieMap.empty[String, String]

  /** Stage `df` as `chunks` deterministic single-file parquet chunks under a
    * cluster-visible [[Scratch]] directory (registered for JVM-exit delete,
    * so repeated runs leak nothing). Rows go to chunk `i` where
    * `chunkIdx === i`; part-file resolution and renames go through the
    * Hadoop FileSystem of the scratch scheme, so staging works identically
    * off local mode (Spark writes and the file-stream source see the same
    * FS). Chunk files are written in index order with maxFilesPerTrigger=1
    * consumption in mind: one staged file per trigger.
    */
  private def stageChunks(spark: SparkSession, key: String, df: DataFrame,
                          chunkIdx: org.apache.spark.sql.Column,
                          chunks: Int): String =
    chunkStageDirs.getOrElseUpdate(key, {
      val out = Scratch.dir(spark, "stream_stage_")
      val outPath = new org.apache.hadoop.fs.Path(out)
      val fs = outPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      (0 until chunks).foreach { i =>
        val build = new org.apache.hadoop.fs.Path(outPath, s"_build_$i")
        df.filter(chunkIdx === i).coalesce(1).write.parquet(build.toString)
        val part = fs.listStatus(build).map(_.getPath)
          .find(_.getName.endsWith(".parquet"))
          .getOrElse(sys.error(s"no parquet part written for chunk $i"))
        fs.rename(part, new org.apache.hadoop.fs.Path(outPath, f"chunk_$i%04d.parquet"))
        fs.delete(build, true)
      }
      out
    })

  /** Production-mode streaming pass: APPEND output with watermark-evicted
    * state. Unlike `runStreamingOnce` (complete mode: unbounded state, fine
    * only for the memory-sink test harness), append mode emits each window
    * exactly once — after the watermark passes its end — and then DROPS its
    * state, so state size is bounded by (windows in flight) regardless of
    * stream length. Late rows older than the watermark are discarded by the
    * stateful operator. This is the mode a 100 TB continuous ingestion job
    * runs in; only the sink differs (kafka/delta instead of memory).
    *
    * Windows still open when the input drains (end > final watermark =
    * max event time - delay) are NOT emitted — exactly the production
    * contract.
    */
  def runStreamingAppend(spark: SparkSession, parquetPath: String,
                         windowLen: String = "1 hour",
                         delay: String = "10 minutes",
                         queryName: String = "event_stream_append"): DataFrame = {
    val schema = spark.read.parquet(parquetPath).schema
    val srcPath = stageDir(parquetPath)
    val src = spark.readStream.schema(schema).parquet(srcPath)
    val agg = windowedTypeCounts(withEventWatermark(src, delay), windowLen)
    val q = agg.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .start()
    // processAllAvailable drains the data; the trailing no-data microbatch
    // (spark.sql.streaming.noDataMicroBatches.enabled, default true) then
    // advances the watermark and flushes every finalized window
    drainAndDetach(spark, q, queryName)
  }
}

package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch event-stream analytics over `events`: gap-based sessionization
  * and ordered funnel conversion — the two queries every behavioral
  * analytics engine ships.
  *
  * Both partition by `user_id` and nothing else: ONE hash shuffle per
  * query no matter the corpus size, with all window/aggregation work
  * pipelined inside each user partition. Users are numerous and small,
  * so the partitioning is even by construction (the streaming
  * sessionizer in [[graft.streaming.StreamingOps]] is the incremental
  * twin of the batch shape here).
  */
object Sessions {

  /** Gap-based sessionization: a new session starts where the gap to
    * the user's previous event exceeds `gapMinutes`. session_seq is the
    * running count of session starts (the standard lag-flag-cumsum
    * idiom); output is one row per session with its bounds and size. */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val wOrd = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val gapSec = col("ts").cast("long") -
      lag(col("ts").cast("long"), 1).over(wOrd)
    events
      .withColumn("ns",
        when(gapSec.isNull || gapSec > gapMinutes * 60L, 1L).otherwise(0L))
      .withColumn("session_seq", sum("ns").over(wOrd))
      .groupBy("user_id", "session_seq")
      .agg(count(lit(1)).as("n_events"),
        min("ts").as("session_start"),
        max("ts").as("session_end"))
      .orderBy("user_id", "session_seq")
  }

  /** Ordered funnel: users who signed up, then clicked AFTER the
    * signup, then purchased AFTER that click (strict event-time order,
    * first qualifying timestamp per stage). Three chained windows over
    * the SAME user partitioning — Catalyst plans one Exchange and
    * pipelines the window evaluations, so the funnel costs a single
    * shuffle. Output: one row per stage with the surviving user count. */
  def funnel(events: DataFrame,
      stages: Seq[String] = Seq("signup", "click", "purchase")): DataFrame = {
    require(stages.length == 3, "funnel expects exactly 3 stages")
    val wU = Window.partitionBy("user_id")
    val staged = events
      .withColumn("t1",
        min(when(col("event_type") === stages(0), col("ts"))).over(wU))
      .withColumn("t2",
        min(when(col("event_type") === stages(1) && col("ts") > col("t1"),
          col("ts"))).over(wU))
      .withColumn("t3",
        min(when(col("event_type") === stages(2) && col("ts") > col("t2"),
          col("ts"))).over(wU))
      .groupBy("user_id")
      .agg(max(col("t1").isNotNull).as("r1"),
        max(col("t2").isNotNull).as("r2"),
        max(col("t3").isNotNull).as("r3"))
    // Stage labels are DATA, not SQL: built with lit()/struct(), never
    // interpolated into a parsed expression string — a quote or SQL
    // fragment in a caller-supplied stage name stays an inert label.
    staged
      .agg(
        sum(when(col("r1"), 1L).otherwise(0L)).as("u1"),
        sum(when(col("r2"), 1L).otherwise(0L)).as("u2"),
        sum(when(col("r3"), 1L).otherwise(0L)).as("u3"))
      .select(explode(array(
        struct(lit(stages(0)).as("stage"),
          lit(1L).as("stage_idx"), col("u1").as("users")),
        struct(lit(s"${stages(1)}_after").as("stage"),
          lit(2L).as("stage_idx"), col("u2").as("users")),
        struct(lit(s"${stages(2)}_after").as("stage"),
          lit(3L).as("stage_idx"), col("u3").as("users")))).as("r"))
      .select(col("r.stage").as("stage"), col("r.stage_idx").as("stage_idx"),
        col("r.users").as("users"))
      .orderBy("stage_idx")
  }

  /** Weekly cohort retention: cohort = week of the user's FIRST event,
    * a user is retained in week-offset w if they have any event in
    * cohort_week + w. The first-event window shares the user_id
    * Exchange with nothing else needed — one user shuffle, then the
    * (cohort, offset) aggregation over the distinct per-user-week rows.
    * Output is the classic retention triangle in long form. */
  def cohortRetention(events: DataFrame): DataFrame = {
    val wU = Window.partitionBy("user_id")
    events
      .withColumn("cohort_week",
        date_trunc("week", min(col("ts")).over(wU)))
      .select(col("user_id"), col("cohort_week"),
        expr("datediff(date_trunc('week', ts), cohort_week) div 7")
          .cast("long").as("week_offset"))
      .distinct()
      .groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("active_users"))
      .orderBy("cohort_week", "week_offset")
  }

  /** Hourly resample with gap filling: the time-series shape model
    * training and monitoring both need — EVERY hour between the corpus
    * bounds appears for every event type, missing hours as explicit
    * zeros (a downstream window/forecast op cannot tell "no data" from
    * "not emitted" otherwise). The grid is `sequence()`-generated from
    * two driver-side bound scalars, so its size is the TIME RANGE ×
    * #types — independent of corpus row count; the counts side is one
    * partial-aggregated shuffle. */
  def resampleHourly(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    val b = events.agg(
      date_trunc("hour", min(col("ts"))).as("lo"),
      date_trunc("hour", max(col("ts"))).as("hi")).head()
    // Empty events → null bounds; lit(null) in sequence() would be an
    // analysis error, so short-circuit to an empty frame with the output
    // schema instead.
    if (b.isNullAt(0) || b.isNullAt(1))
      return events.select(date_trunc("hour", col("ts")).as("bucket"),
        col("event_type"), lit(0L).as("n")).limit(0)
    val (lo, hi) = (b.getTimestamp(0), b.getTimestamp(1))
    val counts = events
      .groupBy(date_trunc("hour", col("ts")).as("bucket"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    events.select("event_type").distinct()
      .withColumn("bucket",
        explode(sequence(lit(lo), lit(hi), expr("INTERVAL 1 HOUR"))))
      .join(counts, Seq("bucket", "event_type"), "left")
      .na.fill(0L, Seq("n"))
      .orderBy("bucket", "event_type")
  }

  /** Rolling metrics over the gap-filled hourly series: 24-bucket
    * moving average + running total per event type. Runs on TOP of
    * [[resampleHourly]] deliberately — a moving average over a series
    * with silent holes is wrong (24 ROWS ≠ 24 hours when hours are
    * missing), which is exactly why the resample emits explicit zeros.
    * Bounded ROWS frame, partitioned by type: state per window is 24
    * values regardless of corpus size. */
  def rollingMetrics(events: DataFrame, windowBuckets: Int = 24): DataFrame = {
    val wMa = Window.partitionBy("event_type").orderBy("bucket")
      .rowsBetween(-(windowBuckets - 1), 0)
    val wCum = Window.partitionBy("event_type").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, 0)
    resampleHourly(events)
      .select(col("bucket"), col("event_type"), col("n"),
        round(avg("n").over(wMa), 4).as("ma24"),
        sum("n").over(wCum).as("cum_n"))
      .orderBy("bucket", "event_type")
  }

  /** Per-type linear trend of `value` over time — closed-form least
    * squares (slope = covar_pop/var_pop, intercept = ȳ − slope·x̄) in
    * ONE conditional-aggregate scan; no window, no join, trivially
    * map-side-combinable at any scale. x is days since epoch from the
    * HOUR-truncated timestamp: truncation makes the epoch value an
    * exact integer-valued double in both engines (sub-second handling
    * differs between Spark's unix_timestamp and DuckDB's epoch), and
    * day units keep slope magnitudes in a range where the driver's 4dp
    * canon rounding is meaningful. Doubles: covariance/variance
    * accumulate in co-moment form on both engines; addend-order drift
    * is absorbed by the 4dp rounding (the q11 convention). */
  def trendByType(events: DataFrame): DataFrame = {
    val x = unix_timestamp(date_trunc("hour", col("ts"))) / lit(86400.0)
    val slope = covar_pop(col("x"), col("value")) / var_pop(col("x"))
    events
      .select(col("event_type"), x.as("x"), col("value"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        round(avg(col("value")), 4).as("avg_value"),
        round(slope, 4).as("slope_per_day"),
        round(avg(col("value")) - slope * avg(col("x")), 4).as("intercept"))
      .orderBy("event_type")
  }

  /** Hourly volume anomaly detection: flag (hour, event_type) buckets
    * whose count deviates from that type's mean by ≥ `zThreshold`
    * population standard deviations — the monitoring query a pipeline
    * runs over its own ingest to catch crawler loops, outages, and
    * replay storms before they poison training data.
    *
    * One corpus scan: the hourly aggregation is the only corpus-sized
    * shuffle, and the per-type mean/stddev come from a window
    * PARTITIONED BY event_type over the post-agg table (re-using the
    * aggregate's rows in place — a separate stats-aggregate branch
    * would re-run the corpus scan or re-shuffle the hourly table).
    * Anomalies are judged over OBSERVED buckets only; compose with
    * [[resampleHourly]] first if silent hours should count as
    * zero-volume anomalies. Types with zero variance (sigma = 0) have
    * no well-defined z-score and are skipped rather than divided by
    * zero. z is rounded to 4dp (the q11 double convention). */
  def hourlyAnomalies(events: DataFrame, zThreshold: Double = 2.0)
      : DataFrame = {
    val wT = Window.partitionBy("event_type")
    events
      .groupBy(date_trunc("hour", col("ts")).as("bucket"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("mu", avg(col("n")).over(wT))
      .withColumn("sigma", stddev_pop(col("n")).over(wT))
      .filter(col("sigma") > 0 &&
        abs((col("n") - col("mu")) / col("sigma")) >= zThreshold)
      .select(col("bucket"), col("event_type"), col("n"),
        round((col("n") - col("mu")) / col("sigma"), 4).as("z_score"))
      .orderBy("event_type", "bucket")
  }

  // --- SparkEntry-facing wrappers ---------------------------------------

  def qSessionize(s: SparkSession, dir: String): DataFrame =
    sessionize(Tables.events(s, dir))

  /** Registered query (`events_anomaly`). */
  def qHourlyAnomalies(s: SparkSession, dir: String): DataFrame =
    hourlyAnomalies(Tables.events(s, dir))

  /** Registered query (`trend_by_type`). */
  def qTrendByType(s: SparkSession, dir: String): DataFrame =
    trendByType(Tables.events(s, dir))

  def qFunnel(s: SparkSession, dir: String): DataFrame =
    funnel(Tables.events(s, dir))

  def qCohortRetention(s: SparkSession, dir: String): DataFrame =
    cohortRetention(Tables.events(s, dir))

  def qResampleHourly(s: SparkSession, dir: String): DataFrame =
    resampleHourly(Tables.events(s, dir))

  def qRollingMetrics(s: SparkSession, dir: String): DataFrame =
    rollingMetrics(Tables.events(s, dir))
}

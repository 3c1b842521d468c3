package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal + statistical analytics beyond the reference's surface:
  * as-of join, sessionization, exact percentiles, histograms, and
  * bivariate statistics — the event-analytics toolkit an incremental
  * event pipeline feeds.
  *
  * The as-of join is deliberately built by *composition* (union +
  * last-non-null running window) rather than a custom SparkPlan —
  * preference (a) of the custom-operator ladder: one shuffle on the
  * key, one in-partition sort, no N×M range explosion, and it inherits
  * AQE/codegen for free. DuckDB's native `ASOF JOIN` provides the
  * oracle.
  */
object Analytics {

  /** Generic as-of join: for each left row, the greatest `rightTs` ≤
    * `leftTs` within the same `key` (nullable when no prior right row).
    * Both inputs need integer timestamp columns (epoch micros here).
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, asofCol: String): DataFrame = {
    val l = left.withColumn("__sig", lit(null).cast("long")).withColumn("__src", lit(0))
    val r = right.select(col(key), col(rightTs).as(leftTs))
      .withColumn("__sig", col(leftTs)).withColumn("__src", lit(1))
    val cols = l.columns.toSeq
    val unioned = l.unionByName(r.select(
      cols.map(c => if (r.columns.contains(c)) col(c) else lit(null).as(c)): _*))
    val w = Window.partitionBy(col(key))
      .orderBy(col(leftTs).asc, col("__src").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn(asofCol, last(col("__sig"), ignoreNulls = true).over(w))
      .filter(col("__src") === 0)
      .drop("__sig", "__src")
  }

  /** Each event joined to the user's most recent signup at-or-before
    * the event (self-as-of: signup events match themselves).
    */
  def asofSignup(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("ts_us"), col("event_type"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts_us").as("signup_us"))
    asofJoin(ev, signups, "user_id", "ts_us", "signup_us", "last_signup_us")
      .select(col("event_id"), col("user_id"), col("ts_us"), col("last_signup_us"))
  }

  /** Same query as [[asofSignup]] through the NATIVE as-of operator
    * (`graft.plans.AsOfJoinExec`): custom logical node planned by the
    * injected strategy into a co-partitioned streaming merge — no union
    * widening, no window buffering. Shares `q_asof_signup`'s oracle, so
    * the custom exec is hash-checked row-for-row against DuckDB's
    * native ASOF JOIN.
    */
  def asofSignupNative(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("ts_us"), col("event_type"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts_us").as("signup_us"))
    graft.plans.AsOfJoin.asof(ev, signups, "user_id", "ts_us", "signup_us", "last_signup_us")
      .select(col("event_id"), col("user_id"), col("ts_us"), col("last_signup_us"))
  }

  /** Epoch micros per week (cohort bucketing unit). */
  val WeekUs: Long = 7L * 24 * 3600 * 1000000

  /** Cohort retention matrix: users grouped by first-activity week,
    * counted in each subsequent week they were active — integer epoch
    * arithmetic end-to-end.
    */
  def cohortRetention(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), expr(s"ts_us div $WeekUs").as("week"))
    val cohorts = ev.groupBy(col("user_id")).agg(min(col("week")).as("cohort_week"))
    ev.distinct()
      .join(cohorts, "user_id")
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("weeks_since"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }

  /** 30-minute inactivity gap. */
  val SessionGapUs: Long = 30L * 60 * 1000000

  /** Sessionization: gap-based session ids per user, then per-session
    * rollup — lag to detect boundaries, running sum to number sessions.
    */
  def sessionize(spark: SparkSession, sfDir: String): DataFrame = {
    val wOrd = Window.partitionBy(col("user_id")).orderBy(col("ts_us").asc)
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts_us"), col("value"))
      .withColumn("new_sess",
        when(col("ts_us") - lag(col("ts_us"), 1).over(wOrd) > SessionGapUs, 1)
          .when(lag(col("ts_us"), 1).over(wOrd).isNull, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("new_sess")).over(wRun).cast("long"))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts_us")).as("start_us"),
        max(col("ts_us")).as("end_us"),
        round(sum(col("value")), 2).as("session_value"))
  }

  /** Conversion funnel: users who signed up, then clicked after the
    * signup, then purchased after that click — ordered-sequence
    * analytics via conditional min-timestamps and two constrained
    * re-aggregations. One summary row.
    */
  def funnel(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("ts_us"))
    val s1 = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("t1"))
    val s2 = ev.filter(col("event_type") === "click")
      .join(s1, "user_id").filter(col("ts_us") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("t2"))
    val s3 = ev.filter(col("event_type") === "purchase")
      .join(s2, "user_id").filter(col("ts_us") > col("t2"))
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("t3"))
    s1.agg(count(lit(1)).as("n_signup"))
      .crossJoin(s2.agg(count(lit(1)).as("n_signup_click")))
      .crossJoin(s3.agg(count(lit(1)).as("n_full_funnel")))
  }

  /** Interval (range) self-join: pairs of events by the same user
    * within 5 minutes of each other. Equi-join on the user key bounds
    * the pair space, the range predicate filters inside each key group
    * — the scalable shape for bounded-interval joins (a pure range join
    * would need range partitioning).
    */
  def closeEventPairs(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir).select(col("user_id"), col("event_id"), col("ts_us"))
    val a = ev.as("a"); val b = ev.as("b")
    a.join(b,
        col("a.user_id") === col("b.user_id") &&
          col("a.event_id") < col("b.event_id") &&
          abs(col("a.ts_us") - col("b.ts_us")) <= 300000000L)
      .groupBy(col("a.user_id").as("user_id"))
      .agg(count(lit(1)).as("n_close_pairs"))
  }

  /** Jan-2024 day-number range of the events table (epoch days). */
  val GapFillFirstDay = 19723L // 2024-01-01
  val GapFillLastDay = 19753L // 2024-01-31

  /** Time-series gap filling: a generated (day × event_type) grid left-
    * joined to actual daily counts, zero-filled — dashboards and
    * downstream models need the empty buckets a plain GROUP BY drops.
    * The grid side is generated (`spark.range` × distinct types), tiny,
    * and broadcast; integer-only aggregates.
    */
  def gapFill(spark: SparkSession, sfDir: String): DataFrame = {
    val days = spark.range(GapFillFirstDay, GapFillLastDay + 1).toDF("day")
    val types = Tables.events(spark, sfDir).select(col("event_type")).distinct()
    val actual = Tables.events(spark, sfDir)
      .select(expr("ts_us div 86400000000").as("day"), col("event_type"))
      .groupBy(col("day"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    days.crossJoin(types)
      .join(actual, Seq("day", "event_type"), "left")
      .select(col("day"), col("event_type"),
        coalesce(col("n"), lit(0L)).as("n"))
  }

  /** Band width for the keyless range join (10 s in µs). */
  val BandUs = 10000000L

  /** Keyless interval join via range banding: pairs of events within
    * `BandUs` of each other across the WHOLE stream (no shared key to
    * equi-join on). The naive plan is a nested-loop over n² pairs; the
    * banding rewrite hashes the right side to its `ts div band` bucket
    * and probes each left row's three adjacent buckets (explode ×3) —
    * an ordinary shuffled equi-join on the band plus a residual |Δt|
    * filter. Each qualifying pair matches in exactly one band, so no
    * dedup is needed, and completeness holds because |Δt| ≤ band forces
    * the bucket numbers within ±1. This is the general at-scale recipe
    * for any tolerance/overlap join without an equi key.
    */
  def closePairsBanded(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts_us"), col("event_type"))
    val right = ev.withColumn("band", expr(s"ts_us div $BandUs"))
    val left = ev
      .select(col("event_id").as("l_event_id"), col("ts_us").as("l_ts_us"),
        col("event_type").as("l_event_type"))
      .withColumn("band", explode(array(
        expr(s"l_ts_us div $BandUs - 1"),
        expr(s"l_ts_us div $BandUs"),
        expr(s"l_ts_us div $BandUs + 1"))))
    left.join(right, Seq("band"))
      .filter(col("l_event_id") < col("event_id") &&
        abs(col("l_ts_us") - col("ts_us")) <= BandUs)
      .groupBy(col("l_event_type").as("type_a"), col("event_type").as("type_b"))
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** Exact percentiles per group (Spark `percentile` ≙ DuckDB
    * `quantile_cont`: linear interpolation on the sorted values).
    */
  def percentiles(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(
        round(expr("percentile(l_quantity, 0.5)"), 4).as("qty_p50"),
        round(expr("percentile(l_quantity, 0.9)"), 4).as("qty_p90"),
        round(expr("percentile(l_extendedprice, 0.5)"), 4).as("price_p50"),
        round(expr("percentile(l_extendedprice, 0.99)"), 4).as("price_p99"))

  /** Sketch-based quantiles (approx_percentile): the constant-memory
    * path for percentiles at corpus scale, next to the exact sorted
    * form above. No SQL oracle (sketch internals are engine-specific);
    * `AnalyticsSpec` bounds the error against the exact values.
    */
  def approxPercentiles(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(
        expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("price_p50_approx"),
        expr("approx_percentile(l_extendedprice, 0.99, 1000)").as("price_p99_approx"))

  /** Fixed-width histogram of order totals (25k buckets). */
  def histogram(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .groupBy(expr("CAST(floor(o_totalprice / 25000) AS INT) AS bucket"))
      .agg(
        count(lit(1)).as("n"),
        round(min(col("o_totalprice")), 2).as("lo"),
        round(max(col("o_totalprice")), 2).as("hi"))

  /** Z-score outlier counts per event type: |v − mean| > 3σ against the
    * type's own distribution (mean/σ via a broadcast-joined aggregate —
    * the two-pass z-score shape; at stream scale the same test runs
    * against rolling state).
    */
  def valueOutliers(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir).select(col("event_type"), col("value"))
    val stats = ev.groupBy(col("event_type").as("et"))
      .agg(avg(col("value")).as("mu"), stddev_samp(col("value")).as("sigma"))
    ev.join(broadcast(stats), ev("event_type") === stats("et"))
      .groupBy(col("event_type"))
      .agg(
        sum(when(abs(col("value") - col("mu")) > lit(3) * col("sigma"), 1L)
          .otherwise(0L)).as("n_outliers"),
        count(lit(1)).as("n_total"))
  }

  /** Bivariate statistics per group: correlation, spread, covariance. */
  def stats(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(
        round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("qty_price_corr"),
        round(stddev_samp(col("l_quantity")), 6).as("qty_stddev"),
        round(var_samp(col("l_quantity")), 4).as("qty_var"),
        round(covar_samp(col("l_quantity"), col("l_extendedprice")), 4).as("qty_price_covar"))

  /** Event-sequence transition counts: per-user (previous event type →
    * event type) bigram frequencies — the Markov-chain view of behavior
    * streams. One window per user plus one global aggregation; top-20
    * with full deterministic tie-break.
    */
  def eventTransitions(spark: SparkSession, sfDir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts_us").asc, col("event_id").asc)
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts_us"), col("event_id"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("prev_type").asc, col("event_type").asc)
      .limit(20)
  }

  /** Sliding-window aggregation (1h windows every 30min): each event
    * lands in exactly two overlapping windows. The streaming twin is
    * `window()` under a watermark; this batch form pins the window
    * assignment semantics (epoch-aligned starts), with the oracle
    * deriving both candidate windows per event arithmetically.
    */
  def eventsSliding(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col("event_type"), col("n"), col("total"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_events_sliding" -> (eventsSliding(_, _)),
    "q_interval_join" -> (closeEventPairs(_, _)),
    "q_interval_banded" -> (closePairsBanded(_, _)),
    "q_funnel" -> (funnel(_, _)),
    "q_cohort_retention" -> (cohortRetention(_, _)),
    "q_outliers" -> (valueOutliers(_, _)),
    "q_approx_percentiles" -> (approxPercentiles(_, _)),
    "q_asof_signup" -> (asofSignup(_, _)),
    "q_asof_native" -> (asofSignupNative(_, _)),
    "q_sessionize" -> (sessionize(_, _)),
    "q_event_transitions" -> (eventTransitions(_, _)),
    "q_gap_fill" -> (gapFill(_, _)),
    "q_percentiles" -> (percentiles(_, _)),
    "q_histogram" -> (histogram(_, _)),
    "q_stats" -> (stats(_, _)))

  val oracles: Map[String, String] = Map(
    "q_events_sliding" ->
      """SELECT window_start_us, event_type, count(*) AS n,
        | round(sum(value), 2) AS total
        |FROM (
        |  SELECT ((epoch_us(ts) // 1800000000) - k) * 1800000000 AS window_start_us,
        |         event_type, value
        |  FROM events, (SELECT unnest(range(2)) AS k) ks) t
        |GROUP BY window_start_us, event_type""".stripMargin,
    "q_outliers" ->
      """WITH stats AS (
        |  SELECT event_type AS et, avg(value) AS mu,
        |         stddev_samp(value) AS sigma
        |  FROM events GROUP BY event_type)
        |SELECT event_type,
        |  CAST(sum(CASE WHEN abs(value - mu) > 3 * sigma THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        |  count(*) AS n_total
        |FROM events JOIN stats ON event_type = et
        |GROUP BY event_type""".stripMargin,
    "q_cohort_retention" ->
      s"""WITH weekly AS (
         |  SELECT DISTINCT user_id, epoch_us(ts) // $WeekUs AS week FROM events),
         |cohorts AS (
         |  SELECT user_id, min(week) AS cohort_week FROM weekly GROUP BY user_id)
         |SELECT cohort_week, week - cohort_week AS weeks_since,
         |       count(DISTINCT w.user_id) AS n_users
         |FROM weekly w JOIN cohorts USING (user_id)
         |GROUP BY 1, 2""".stripMargin,
    "q_funnel" ->
      """WITH s1 AS (
        |  SELECT user_id, min(epoch_us(ts)) AS t1 FROM events
        |  WHERE event_type = 'signup' GROUP BY user_id),
        |s2 AS (
        |  SELECT e.user_id, min(epoch_us(ts)) AS t2
        |  FROM events e JOIN s1 USING (user_id)
        |  WHERE event_type = 'click' AND epoch_us(ts) > t1
        |  GROUP BY e.user_id),
        |s3 AS (
        |  SELECT e.user_id, min(epoch_us(ts)) AS t3
        |  FROM events e JOIN s2 USING (user_id)
        |  WHERE event_type = 'purchase' AND epoch_us(ts) > t2
        |  GROUP BY e.user_id)
        |SELECT (SELECT count(*) FROM s1) AS n_signup,
        |       (SELECT count(*) FROM s2) AS n_signup_click,
        |       (SELECT count(*) FROM s3) AS n_full_funnel""".stripMargin,
    "q_interval_banded" ->
      s"""SELECT a.event_type AS type_a, b.event_type AS type_b, count(*) AS n_pairs
         |FROM events a JOIN events b
         |  ON a.event_id < b.event_id
         |  AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= $BandUs
         |GROUP BY 1, 2""".stripMargin,
    "q_interval_join" ->
      """SELECT a.user_id, count(*) AS n_close_pairs
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id AND a.event_id < b.event_id
        |  AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= 300000000
        |GROUP BY a.user_id""".stripMargin,
    "q_asof_signup" ->
      """SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us,
        | epoch_us(s.ts) AS last_signup_us
        |FROM events e ASOF LEFT JOIN
        | (SELECT user_id AS su, ts FROM events WHERE event_type = 'signup') s
        | ON e.user_id = s.su AND e.ts >= s.ts""".stripMargin,
    "q_asof_native" ->
      """SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us,
        | epoch_us(s.ts) AS last_signup_us
        |FROM events e ASOF LEFT JOIN
        | (SELECT user_id AS su, ts FROM events WHERE event_type = 'signup') s
        | ON e.user_id = s.su AND e.ts >= s.ts""".stripMargin,
    "q_gap_fill" ->
      s"""SELECT d.day, t.event_type, coalesce(a.n, 0) AS n
         |FROM (SELECT unnest(generate_series($GapFillFirstDay, $GapFillLastDay)) AS day) d
         |CROSS JOIN (SELECT DISTINCT event_type FROM events) t
         |LEFT JOIN (
         |  SELECT epoch_us(ts) // 86400000000 AS day, event_type, count(*) AS n
         |  FROM events GROUP BY 1, 2) a
         |  ON a.day = d.day AND a.event_type = t.event_type""".stripMargin,
    "q_event_transitions" ->
      """SELECT prev_type, event_type, count(*) AS n FROM (
        |  SELECT event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS prev_type
        |  FROM events) t
        |WHERE prev_type IS NOT NULL
        |GROUP BY prev_type, event_type
        |ORDER BY n DESC, prev_type, event_type LIMIT 20""".stripMargin,
    "q_sessionize" ->
      s"""WITH marked AS (
         |  SELECT user_id, epoch_us(ts) AS ts_us, value,
         |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL THEN 1
         |         WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > $SessionGapUs THEN 1
         |         ELSE 0 END AS new_sess
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts))),
         |numbered AS (
         |  SELECT user_id, ts_us, value,
         |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
         |  FROM marked)
         |SELECT user_id, session_id, count(*) AS n_events,
         |  min(ts_us) AS start_us, max(ts_us) AS end_us,
         |  round(sum(value), 2) AS session_value
         |FROM numbered GROUP BY user_id, session_id""".stripMargin,
    "q_percentiles" ->
      """SELECT l_returnflag,
        | round(quantile_cont(l_quantity, 0.5), 4) AS qty_p50,
        | round(quantile_cont(l_quantity, 0.9), 4) AS qty_p90,
        | round(quantile_cont(l_extendedprice, 0.5), 4) AS price_p50,
        | round(quantile_cont(l_extendedprice, 0.99), 4) AS price_p99
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q_histogram" ->
      """SELECT CAST(floor(o_totalprice / 25000) AS INT) AS bucket,
        | count(*) AS n,
        | round(min(o_totalprice), 2) AS lo,
        | round(max(o_totalprice), 2) AS hi
        |FROM orders GROUP BY 1""".stripMargin,
    "q_stats" ->
      """SELECT l_returnflag,
        | round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
        | round(stddev_samp(l_quantity), 6) AS qty_stddev,
        | round(var_samp(l_quantity), 4) AS qty_var,
        | round(covar_samp(l_quantity, l_extendedprice), 4) AS qty_price_covar
        |FROM lineitem GROUP BY l_returnflag""".stripMargin)
}

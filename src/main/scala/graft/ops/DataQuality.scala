package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality operators — the validation layer every production
  * pipeline runs between extract and load (the reference's audit log,
  * pipeline_architecture.py:150-199, records row counts per run; these
  * operators are the column-level generalization a 100 TB lake needs
  * before trusting a batch).
  *
  * All three are single-pass aggregations over the scan — no joins, no
  * per-rule re-scan — so cost is one map-side-combined pass at any
  * scale, and every one is replayable as ANSI SQL for the oracle.
  */
object DataQuality {

  /** Per-column profile of the events table in long form: row count,
    * null count, distinct count, min/max (numeric columns as doubles,
    * 4dp). ONE aggregation computes every metric (no per-column scan);
    * the long form is assembled from the single result row.
    */
  def profile(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("ts_us"))
    val numeric = Seq("event_id", "user_id", "value", "ts_us")
    val aggs = count(lit(1)).as("__n") +:
      (numeric.flatMap { c =>
        Seq(sum(col(c).isNull.cast("long")).as(s"${c}__nulls"),
          count_distinct(col(c)).as(s"${c}__distinct"),
          round(min(col(c)).cast("double"), 4).as(s"${c}__min"),
          round(max(col(c)).cast("double"), 4).as(s"${c}__max"))
      } ++ Seq(
        sum(col("event_type").isNull.cast("long")).as("event_type__nulls"),
        count_distinct(col("event_type")).as("event_type__distinct")))
    val row = ev.agg(aggs.head, aggs.tail: _*)
    // pivot the single wide row to long form with a literal explode —
    // pure projection, no second scan
    val metrics = numeric.map { c =>
      struct(lit(c).as("column"), col("__n").as("n_rows"),
        col(s"${c}__nulls").as("n_nulls"),
        col(s"${c}__distinct").as("n_distinct"),
        col(s"${c}__min").as("min_value"),
        col(s"${c}__max").as("max_value"))
    } :+ struct(lit("event_type").as("column"), col("__n").as("n_rows"),
      col("event_type__nulls").as("n_nulls"),
      col("event_type__distinct").as("n_distinct"),
      lit(null).cast("double").as("min_value"),
      lit(null).cast("double").as("max_value"))
    row.select(explode(array(metrics: _*)).as("m")).select("m.*")
  }

  /** Distribution drift between the pre- and post-watermark windows of
    * `events.value`: Population Stability Index over `Buckets` fixed
    * [0, 100) buckets plus an overflow bucket, with additive smoothing
    * (`Eps`) so empty buckets don't blow up the log. One pass builds
    * both windows' histograms (conditional aggregation — no second
    * scan, no join); PSI = Σ (p−q)·ln(p/q). The per-bucket terms are
    * returned (6dp) so the oracle pins the whole construction, not
    * just the scalar.
    */
  val Buckets = 10
  val Eps = 1e-6

  def driftPsi(spark: SparkSession, sfDir: String): DataFrame = {
    val split = PipelineQueries.SplitUs
    val ev = Tables.events(spark, sfDir)
      .filter(col("ts_us").isNotNull && col("value").isNotNull)
      .withColumn("bucket",
        least(floor(col("value") / lit(10.0)), lit(Buckets.toLong)).cast("long"))
      .withColumn("w", when(col("ts_us") <= split, "ref").otherwise("cur"))
    val hist = ev.groupBy(col("bucket")).agg(
      sum((col("w") === "ref").cast("long")).as("n_ref"),
      sum((col("w") === "cur").cast("long")).as("n_cur"))
    val totals = hist.agg(sum(col("n_ref")).as("t_ref"),
      sum(col("n_cur")).as("t_cur"))
    hist.crossJoin(broadcast(totals))
      .withColumn("p", col("n_ref") / col("t_ref") + lit(Eps))
      .withColumn("q", col("n_cur") / col("t_cur") + lit(Eps))
      .select(col("bucket"), col("n_ref"), col("n_cur"),
        round((col("p") - col("q")) * log(col("p") / col("q")), 6).as("psi_term"))
  }

  /** Rule-violation counts over the extract in ONE conditional
    * aggregation — the accept/reject gate a batch passes before load.
    * Rules: non-negative value, known event type, event time within
    * the corpus window, non-null user.
    */
  def ruleViolations(spark: SparkSession, sfDir: String): DataFrame = {
    val known = Seq("click", "view", "purchase", "signup", "error")
    val lo = 1704067200000000L // 2024-01-01T00:00:00Z micros
    val hi = 1706745600000000L // 2024-02-01T00:00:00Z micros
    val ev = Tables.events(spark, sfDir)
    val rules = Seq(
      ("negative_value", col("value") < 0),
      ("unknown_event_type", !col("event_type").isin(known.map(lit): _*)),
      ("ts_out_of_window", col("ts_us").isNull ||
        col("ts_us") < lo || col("ts_us") >= hi),
      ("null_user", col("user_id").isNull))
    val aggs = count(lit(1)).as("__n") +: rules.map { case (name, pred) =>
      sum(coalesce(pred.cast("long"), lit(1L))).as(name)
    }
    val row = ev.agg(aggs.head, aggs.tail: _*)
    row.select(explode(array(rules.map { case (name, _) =>
      struct(lit(name).as("rule"), col(name).as("n_violations"),
        col("__n").as("n_rows"))
    }: _*)).as("m")).select("m.*")
  }

  /** Split a batch on pre-commit rules — the DEAD-LETTER alternative
    * to [[graft.etl.PreCommit]]'s abort: instead of vetoing the whole
    * batch, the clean rows proceed to the target and every violating
    * row is returned tagged with the comma-joined names of the rules
    * it tripped (`violated`), ready to land in a quarantine table for
    * replay after a fix. A NULL rule result counts as a violation,
    * same as the abort path. Pure projections + filters — one codegen
    * pass, no shuffle, O(batch) at any scale.
    */
  def splitByRules(batch: DataFrame,
      rules: Seq[graft.etl.PreCommit.Rule]): (DataFrame, DataFrame) = {
    require(rules.nonEmpty, "splitByRules needs at least one rule")
    val flags = rules.map(r =>
      coalesce(r.violation.cast("boolean"), lit(true)))
    val anyBad = flags.reduce(_ || _)
    val violated = concat_ws(",",
      rules.zip(flags).map { case (r, f) => when(f, lit(r.name)) }: _*)
    (batch.filter(!anyBad),
      batch.filter(anyBad).withColumn("violated", violated))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dq_profile" -> (profile(_, _)),
    "dq_drift_psi" -> (driftPsi(_, _)),
    "dq_rule_violations" -> (ruleViolations(_, _)))

  def oracles: Map[String, String] = Map(
    "dq_profile" ->
      s"""WITH ev AS (SELECT event_id, user_id, event_type, value,
         |  epoch_us(ts) AS ts_us FROM events)
         |SELECT 'event_id' AS "column", count(*) AS n_rows,
         |  CAST(sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
         |  CAST(count(DISTINCT event_id) AS BIGINT) AS n_distinct,
         |  round(CAST(min(event_id) AS DOUBLE), 4) AS min_value,
         |  round(CAST(max(event_id) AS DOUBLE), 4) AS max_value FROM ev
         |UNION ALL
         |SELECT 'user_id', count(*),
         |  CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         |  CAST(count(DISTINCT user_id) AS BIGINT),
         |  round(CAST(min(user_id) AS DOUBLE), 4),
         |  round(CAST(max(user_id) AS DOUBLE), 4) FROM ev
         |UNION ALL
         |SELECT 'value', count(*),
         |  CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         |  CAST(count(DISTINCT value) AS BIGINT),
         |  round(CAST(min(value) AS DOUBLE), 4),
         |  round(CAST(max(value) AS DOUBLE), 4) FROM ev
         |UNION ALL
         |SELECT 'ts_us', count(*),
         |  CAST(sum(CASE WHEN ts_us IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         |  CAST(count(DISTINCT ts_us) AS BIGINT),
         |  round(CAST(min(ts_us) AS DOUBLE), 4),
         |  round(CAST(max(ts_us) AS DOUBLE), 4) FROM ev
         |UNION ALL
         |SELECT 'event_type', count(*),
         |  CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         |  CAST(count(DISTINCT event_type) AS BIGINT),
         |  NULL, NULL FROM ev""".stripMargin,
    "dq_drift_psi" ->
      s"""WITH ev AS (
         |  SELECT least(CAST(floor(value / 10.0) AS BIGINT), $Buckets) AS bucket,
         |    CASE WHEN epoch_us(ts) <= ${PipelineQueries.SplitUs}
         |      THEN 'ref' ELSE 'cur' END AS w
         |  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
         |hist AS (
         |  SELECT bucket,
         |    CAST(sum(CASE WHEN w = 'ref' THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
         |    CAST(sum(CASE WHEN w = 'cur' THEN 1 ELSE 0 END) AS BIGINT) AS n_cur
         |  FROM ev GROUP BY bucket),
         |t AS (SELECT sum(n_ref) AS t_ref, sum(n_cur) AS t_cur FROM hist)
         |SELECT bucket, n_ref, n_cur,
         |  round(((n_ref / t_ref + $Eps) - (n_cur / t_cur + $Eps)) *
         |    ln((n_ref / t_ref + $Eps) / (n_cur / t_cur + $Eps)), 6) AS psi_term
         |FROM hist, t""".stripMargin,
    "dq_rule_violations" ->
      s"""WITH ev AS (SELECT user_id, event_type, value, epoch_us(ts) AS ts_us
         |  FROM events)
         |SELECT 'negative_value' AS rule,
         |  CAST(sum(CASE WHEN value < 0 THEN 1
         |    WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
         |  count(*) AS n_rows FROM ev
         |UNION ALL
         |SELECT 'unknown_event_type',
         |  CAST(sum(CASE WHEN event_type NOT IN
         |    ('click','view','purchase','signup','error') THEN 1
         |    WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         |  count(*) FROM ev
         |UNION ALL
         |SELECT 'ts_out_of_window',
         |  CAST(sum(CASE WHEN ts_us IS NULL OR ts_us < 1704067200000000
         |    OR ts_us >= 1706745600000000 THEN 1 ELSE 0 END) AS BIGINT),
         |  count(*) FROM ev
         |UNION ALL
         |SELECT 'null_user',
         |  CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         |  count(*) FROM ev""".stripMargin)
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.AlertOps

/** Economic alert breach/resolve event engine (ref macro_agents/src/
  * macro_agents/defs/alerts/assets.py:131-191 + definitions.yaml) —
  * the reference's only consumer of `economic_alert_inputs`.
  *
  * The five alert definitions are the reference YAML verbatim;
  * evaluation over the input history replays the scheduled-run
  * protocol as one batch state machine (see [[graft.operators.AlertOps]]).
  * cooldown_hours gates EMAIL repeats in the reference sensor, not
  * event rows, so it has no analogue here.
  */
object AlertQueries {

  /** definitions.yaml:21-79, one row per alert. */
  private def alertDefs(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq(
      ("cpi_yoy_above_3pct", "cpi_yoy_pct", "gt", 3.0, "warning",
        "CPI YoY above 3%"),
      ("yield_curve_inversion_10y2y", "t10y2y_spread", "lt", 0.0, "critical",
        "Yield curve inversion: 10Y < 2Y"),
      ("unemployment_3mo_rise", "unrate_change_3mo", "gte", 0.5, "warning",
        "Unemployment up 0.5pp over 3 months"),
      ("fed_funds_step_change", "fedfunds_change_1mo", "gte", 0.25, "info",
        "Fed Funds Rate moved >= 25bps"),
      ("hy_oas_stress", "hy_oas_pct", "gt", 6.0, "critical",
        "High-yield OAS above 6%")
    ).toDF("alert_id", "indicator", "comparator", "threshold", "severity", "title")
  }

  private def alertEvents(s: SparkSession, dir: String): DataFrame = {
    // One pass over the wide inputs frame: stack is a generator, no
    // per-indicator rescan of the signal pipeline beneath.
    val long = FredSignalQueries.alertInputs(s, dir)
      .selectExpr("date",
        """stack(5,
             'cpi_yoy_pct',         cpi_yoy_pct,
             't10y2y_spread',       t10y2y_spread,
             'unrate_change_3mo',   unrate_change_3mo,
             'fedfunds_change_1mo', fedfunds_change_1mo,
             'hy_oas_pct',          hy_oas_pct) AS (indicator, observed_value)""")
      .filter(col("observed_value").isNotNull)
    val evaluated = long
      .join(broadcast(alertDefs(s)), Seq("indicator"))
      .withColumn("breached",
        AlertOps.breached(col("observed_value"), col("comparator"), col("threshold"))
          .cast("int"))
    AlertOps.breachResolveEvents(evaluated)
  }

  private val alertEventsSql: String = s"""
    WITH inputs AS (
      ${FredSignalQueries.alertInputsSql}
    ),
    defs(alert_id, indicator, comparator, threshold, severity, title) AS (
      VALUES
        ('cpi_yoy_above_3pct', 'cpi_yoy_pct', 'gt', CAST(3.0 AS DOUBLE), 'warning',
         'CPI YoY above 3%'),
        ('yield_curve_inversion_10y2y', 't10y2y_spread', 'lt', CAST(0.0 AS DOUBLE), 'critical',
         'Yield curve inversion: 10Y < 2Y'),
        ('unemployment_3mo_rise', 'unrate_change_3mo', 'gte', CAST(0.5 AS DOUBLE), 'warning',
         'Unemployment up 0.5pp over 3 months'),
        ('fed_funds_step_change', 'fedfunds_change_1mo', 'gte', CAST(0.25 AS DOUBLE), 'info',
         'Fed Funds Rate moved >= 25bps'),
        ('hy_oas_stress', 'hy_oas_pct', 'gt', CAST(6.0 AS DOUBLE), 'critical',
         'High-yield OAS above 6%')
    ),
    long AS (
      SELECT date, 'cpi_yoy_pct' AS indicator, cpi_yoy_pct AS observed_value
      FROM inputs WHERE cpi_yoy_pct IS NOT NULL
      UNION ALL
      SELECT date, 't10y2y_spread', t10y2y_spread FROM inputs WHERE t10y2y_spread IS NOT NULL
      UNION ALL
      SELECT date, 'unrate_change_3mo', unrate_change_3mo FROM inputs WHERE unrate_change_3mo IS NOT NULL
      UNION ALL
      SELECT date, 'fedfunds_change_1mo', fedfunds_change_1mo FROM inputs WHERE fedfunds_change_1mo IS NOT NULL
      UNION ALL
      SELECT date, 'hy_oas_pct', hy_oas_pct FROM inputs WHERE hy_oas_pct IS NOT NULL
    ),
    evaluated AS (
      SELECT l.date, l.observed_value,
        d.alert_id, d.indicator, d.comparator, d.threshold, d.severity, d.title,
        CAST(CASE d.comparator
          WHEN 'gt'  THEN l.observed_value >  d.threshold
          WHEN 'lt'  THEN l.observed_value <  d.threshold
          WHEN 'gte' THEN l.observed_value >= d.threshold
          ELSE            l.observed_value <= d.threshold
        END AS INT) AS breached
      FROM long l JOIN defs d ON l.indicator = d.indicator
    ),
    flagged AS (
      SELECT *,
        CASE WHEN LAG(breached) OVER w IS NULL
               OR LAG(breached) OVER w != breached THEN 1 ELSE 0 END AS chg
      FROM evaluated
      WINDOW w AS (PARTITION BY alert_id ORDER BY date)
    ),
    segmented AS (
      SELECT *,
        SUM(chg) OVER (PARTITION BY alert_id ORDER BY date ROWS UNBOUNDED PRECEDING) AS seg
      FROM flagged
    ),
    episodes AS (
      SELECT alert_id, seg,
        MIN(indicator) AS indicator, MIN(comparator) AS comparator,
        MIN(threshold) AS threshold, MIN(severity) AS severity, MIN(title) AS title,
        MAX(breached) AS breached, MIN(date) AS breached_at,
        MIN_BY(observed_value, date) AS observed_value
      FROM segmented GROUP BY 1, 2
    ),
    events AS (
      SELECT *, LEAD(breached_at) OVER (PARTITION BY alert_id ORDER BY seg) AS resolved_at
      FROM episodes
    )
    SELECT
      CAST(ROW_NUMBER() OVER (ORDER BY breached_at, alert_id) AS BIGINT) AS event_id,
      alert_id, indicator, comparator, threshold, observed_value, severity, title,
      breached_at, resolved_at,
      CASE WHEN resolved_at IS NULL THEN 'open' ELSE 'resolved' END AS status,
      CAST(resolved_at - breached_at AS BIGINT) AS days_open
    FROM events
    WHERE breached = 1
  """

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q_alert_events", alertEvents, Some(alertEventsSql))
  )
}

package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.models.MarketAnalysisReturn
import graft.queries.QueryDef.{oDivRound, oSnap, rdiv, rsnap}
import graft.queries.FredSignalQueries.{idxOf, stgFred, stgFredSql}
import graft.runtime.Tables

/** Analysis-schema heavyweights part 1 (SURVEY §2.M; refs
  * dbt_project/models/analysis/economic_regime_classification.sql and
  * correlation_analysis_enhanced.sql):
  *
  *  - economic_regime_classification: 13-indicator monthly pivot →
  *    MoM/3mo/6mo/YoY changes → six -2..+2 signal scores → weighted
  *    composite → Expansion/Slowdown/Contraction/Recovery CASE ladder,
  *    confidence, and regime-transition tracking. The reference's
  *    `month_date >= '2000-01-01'` data-era constant maps to
  *    '1993-01-01' on the TPC-H-dated corpus (same skip-the-warmup
  *    intent).
  *  - correlation_analysis_enhanced: sector monthly returns (last
  *    pct_change_1mo per month from the us_sector analysis_return
  *    model) × indicator MoM series → grouped CORR with t-statistics
  *    and p-value ladder, per-regime correlation pivot (joining the
  *    regime model), 12/24-month rolling correlation stability
  *    (sign changes, CV), and the High/Medium/Low quality rating.
  *
  * Parity: signal scores and regimes compare exact round-4 staged
  * values (deterministic); CORR/STDDEV aggregates are order-sensitive
  * at the last ulp and every derived output is rounded on both sides;
  * conditional monthly-return averages use the exact-decimal division
  * pair. Group-agg CORR at 100 TB is a single hash aggregation over
  * (symbol, series) — no window, no join amplification.
  */
object AnalysisQueries {

  private def T(s: SparkSession, dir: String) = Tables(s, dir)

  private def nullif(c: Column): Column = when(c =!= 0, c)

  // ------------------------------------------------------------------
  // economic_regime_classification (ref, 239 LoC)
  // ------------------------------------------------------------------

  val RegimeCodes: Seq[String] = Seq("INDPRO", "UNRATE", "PAYEMS", "CPIAUCSL", "PCEPILFE",
    "T10Y2Y", "T10Y3M", "CFNAIMA3", "USSLIND", "ICSA", "UMCSENT", "IPMAN", "NFCI")

  /** (month_date, <13 pivot cols>) from the monthly MAX pivot. */
  private def monthlyIndicators(s: SparkSession, dir: String): DataFrame = {
    val stg = stgFred(s, dir, RegimeCodes)
    val aliases = Seq(
      "INDPRO" -> "industrial_production", "UNRATE" -> "unemployment_rate",
      "PAYEMS" -> "nonfarm_payrolls", "CPIAUCSL" -> "cpi", "PCEPILFE" -> "core_pce",
      "T10Y2Y" -> "yield_curve_10y2y", "T10Y3M" -> "yield_curve_10y3m",
      "CFNAIMA3" -> "cfnai", "USSLIND" -> "leading_index", "ICSA" -> "initial_claims",
      "UMCSENT" -> "consumer_sentiment", "IPMAN" -> "mfg_production",
      "NFCI" -> "financial_conditions")
    stg.groupBy(date_trunc("month", col("date")).cast("date").as("month_date"))
      .agg(
        max(when(col("series_code") === aliases.head._1, col("value"))).as(aliases.head._2),
        aliases.tail.map { case (c, a) =>
          max(when(col("series_code") === c, col("value"))).as(a)
        }: _*)
  }

  private val monthlyIndicatorsSql: String = {
    val aliases = Seq(
      "INDPRO" -> "industrial_production", "UNRATE" -> "unemployment_rate",
      "PAYEMS" -> "nonfarm_payrolls", "CPIAUCSL" -> "cpi", "PCEPILFE" -> "core_pce",
      "T10Y2Y" -> "yield_curve_10y2y", "T10Y3M" -> "yield_curve_10y3m",
      "CFNAIMA3" -> "cfnai", "USSLIND" -> "leading_index", "ICSA" -> "initial_claims",
      "UMCSENT" -> "consumer_sentiment", "IPMAN" -> "mfg_production",
      "NFCI" -> "financial_conditions")
    val cols = aliases.map { case (c, a) =>
      s"MAX(CASE WHEN series_code = '$c' THEN value END) AS $a"
    }.mkString(",\n        ")
    s"""
    monthly_indicators AS (
      SELECT CAST(DATE_TRUNC('month', date) AS DATE) AS month_date,
        $cols
      FROM stg
      GROUP BY 1
    )"""
  }

  /** Shared regime CTE chain (Spark side). */
  def regimeFrame(s: SparkSession, dir: String): DataFrame = {
    val wd = Window.orderBy(col("month_date"))
    def lagd(c: String, n: Int) = col(c) - lag(col(c), n).over(wd)
    val ch = monthlyIndicators(s, dir)
      .withColumn("indpro_mom", lagd("industrial_production", 1))
      .withColumn("unrate_mom", lagd("unemployment_rate", 1))
      .withColumn("payrolls_mom", lagd("nonfarm_payrolls", 1))
      .withColumn("indpro_3mo", lagd("industrial_production", 3))
      .withColumn("unrate_3mo", lagd("unemployment_rate", 3))
      .withColumn("payrolls_3mo", lagd("nonfarm_payrolls", 3))
      .withColumn("indpro_6mo", lagd("industrial_production", 6))
      .withColumn("unrate_6mo", lagd("unemployment_rate", 6))
      .withColumn("cpi_yoy",
        when(lag(col("cpi"), 12).over(wd) > 0,
          (col("cpi") - lag(col("cpi"), 12).over(wd)) / lag(col("cpi"), 12).over(wd) * 100))
      .withColumn("leading_3mo", lagd("leading_index", 3))
      .withColumn("leading_6mo", lagd("leading_index", 6))
      .withColumn("mfg_production_yoy",
        when(lag(col("mfg_production"), 12).over(wd) > 0,
          (col("mfg_production") - lag(col("mfg_production"), 12).over(wd)) /
            lag(col("mfg_production"), 12).over(wd) * 100))

    val sig = ch
      .filter(col("month_date") >= lit("1993-01-01").cast("date"))
      .withColumn("growth_signal",
        when(col("indpro_3mo") > 0 && col("indpro_6mo") > 0 && col("leading_3mo") > 0, 2)
          .when(col("indpro_3mo") > 0 || col("leading_3mo") > 0, 1)
          .when(col("indpro_3mo") < 0 && col("indpro_6mo") < 0, -2)
          .when(col("indpro_3mo") < 0 || col("leading_6mo") < 0, -1)
          .otherwise(0))
      .withColumn("employment_signal",
        when(col("unrate_3mo") < -0.2 && col("payrolls_3mo") > 200, 2)
          .when(col("unrate_3mo") < 0 || col("payrolls_3mo") > 100, 1)
          .when(col("unrate_3mo") > 0.5 && col("payrolls_3mo") < -100, -2)
          .when(col("unrate_3mo") > 0.2 || col("payrolls_3mo") < 0, -1)
          .otherwise(0))
      .withColumn("inflation_signal",
        when(col("cpi_yoy") > 4, 2).when(col("cpi_yoy") > 2.5, 1)
          .when(col("cpi_yoy") < 1, -1).otherwise(0))
      .withColumn("yield_curve_signal",
        when(col("yield_curve_10y2y") < -0.5, -2)
          .when(col("yield_curve_10y2y") < 0, -1)
          .when(col("yield_curve_10y2y") > 1.5, 1)
          .otherwise(0))
      .withColumn("financial_signal",
        when(col("financial_conditions") > 0.5, -2)
          .when(col("financial_conditions") > 0, -1)
          .when(col("financial_conditions") < -0.5, 1)
          .otherwise(0))
      .withColumn("mfg_signal",
        when(col("mfg_production_yoy") > 3, 2)
          .when(col("mfg_production_yoy") > 0, 1)
          .when(col("mfg_production_yoy") > -3, -1)
          .otherwise(-2))

    sig
      .withColumn("composite_score",
        col("growth_signal") * 2.0 + col("employment_signal") * 1.5 +
          col("inflation_signal") * 0.5 + col("yield_curve_signal") * 1.0 +
          col("financial_signal") * 0.5 + coalesce(col("mfg_signal"), lit(0)) * 1.0)
      .withColumn("regime",
        when(col("growth_signal") >= 1 && col("employment_signal") >= 1 &&
          col("yield_curve_signal") >= 0, "Expansion")
          .when((col("growth_signal") <= 0 || col("yield_curve_signal") < 0) &&
            col("employment_signal") >= 0 && col("growth_signal") > -2, "Slowdown")
          .when(col("growth_signal") <= -1 &&
            (col("employment_signal") <= -1 || col("yield_curve_signal") <= -1), "Contraction")
          .when(col("growth_signal") >= 0 && col("employment_signal") <= 0 &&
            (col("leading_3mo") > 0 || col("mfg_signal") >= 0), "Recovery")
          .when(col("growth_signal") + col("employment_signal") +
            coalesce(col("mfg_signal"), lit(0)) > 0, "Expansion")
          .otherwise("Slowdown"))
      .withColumn("confidence",
        when(abs(col("growth_signal")) === 2 && abs(col("employment_signal")) >= 1 &&
          col("growth_signal") * col("employment_signal") > 0, "High")
          .when(col("growth_signal") =!= 0 && col("employment_signal") =!= 0 &&
            col("growth_signal") * col("employment_signal") > 0, "Medium")
          .otherwise("Low"))
  }

  /** Shared regime CTE chain (oracle side; needs `stg`). */
  val regimeCtesSql: String = s"""
    $monthlyIndicatorsSql,
    indicator_changes AS (
      SELECT *,
        industrial_production - LAG(industrial_production, 1) OVER om AS indpro_mom,
        unemployment_rate - LAG(unemployment_rate, 1) OVER om AS unrate_mom,
        nonfarm_payrolls - LAG(nonfarm_payrolls, 1) OVER om AS payrolls_mom,
        industrial_production - LAG(industrial_production, 3) OVER om AS indpro_3mo,
        unemployment_rate - LAG(unemployment_rate, 3) OVER om AS unrate_3mo,
        nonfarm_payrolls - LAG(nonfarm_payrolls, 3) OVER om AS payrolls_3mo,
        industrial_production - LAG(industrial_production, 6) OVER om AS indpro_6mo,
        unemployment_rate - LAG(unemployment_rate, 6) OVER om AS unrate_6mo,
        CASE WHEN LAG(cpi, 12) OVER om > 0
          THEN ((cpi - LAG(cpi, 12) OVER om) / LAG(cpi, 12) OVER om) * 100 END AS cpi_yoy,
        leading_index - LAG(leading_index, 3) OVER om AS leading_3mo,
        leading_index - LAG(leading_index, 6) OVER om AS leading_6mo,
        CASE WHEN LAG(mfg_production, 12) OVER om > 0
          THEN ((mfg_production - LAG(mfg_production, 12) OVER om)
                / LAG(mfg_production, 12) OVER om) * 100 END AS mfg_production_yoy
      FROM monthly_indicators
      WINDOW om AS (ORDER BY month_date)
    ),
    regime_signals AS (
      SELECT *,
        CASE WHEN indpro_3mo > 0 AND indpro_6mo > 0 AND leading_3mo > 0 THEN 2
             WHEN indpro_3mo > 0 OR leading_3mo > 0 THEN 1
             WHEN indpro_3mo < 0 AND indpro_6mo < 0 THEN -2
             WHEN indpro_3mo < 0 OR leading_6mo < 0 THEN -1
             ELSE 0 END AS growth_signal,
        CASE WHEN unrate_3mo < -0.2 AND payrolls_3mo > 200 THEN 2
             WHEN unrate_3mo < 0 OR payrolls_3mo > 100 THEN 1
             WHEN unrate_3mo > 0.5 AND payrolls_3mo < -100 THEN -2
             WHEN unrate_3mo > 0.2 OR payrolls_3mo < 0 THEN -1
             ELSE 0 END AS employment_signal,
        CASE WHEN cpi_yoy > 4 THEN 2 WHEN cpi_yoy > 2.5 THEN 1
             WHEN cpi_yoy < 1 THEN -1 ELSE 0 END AS inflation_signal,
        CASE WHEN yield_curve_10y2y < -0.5 THEN -2
             WHEN yield_curve_10y2y < 0 THEN -1
             WHEN yield_curve_10y2y > 1.5 THEN 1
             ELSE 0 END AS yield_curve_signal,
        CASE WHEN financial_conditions > 0.5 THEN -2
             WHEN financial_conditions > 0 THEN -1
             WHEN financial_conditions < -0.5 THEN 1
             ELSE 0 END AS financial_signal,
        CASE WHEN mfg_production_yoy > 3 THEN 2
             WHEN mfg_production_yoy > 0 THEN 1
             WHEN mfg_production_yoy > -3 THEN -1
             ELSE -2 END AS mfg_signal
      FROM indicator_changes
      WHERE month_date >= DATE '1993-01-01'
    ),
    regime_classification AS (
      SELECT *,
        (growth_signal * 2.0 + employment_signal * 1.5 + inflation_signal * 0.5
         + yield_curve_signal * 1.0 + financial_signal * 0.5
         + COALESCE(mfg_signal, 0) * 1.0) AS composite_score,
        CASE
          WHEN growth_signal >= 1 AND employment_signal >= 1 AND yield_curve_signal >= 0
            THEN 'Expansion'
          WHEN (growth_signal <= 0 OR yield_curve_signal < 0)
            AND employment_signal >= 0 AND growth_signal > -2 THEN 'Slowdown'
          WHEN growth_signal <= -1 AND (employment_signal <= -1 OR yield_curve_signal <= -1)
            THEN 'Contraction'
          WHEN growth_signal >= 0 AND employment_signal <= 0
            AND (leading_3mo > 0 OR mfg_signal >= 0) THEN 'Recovery'
          WHEN growth_signal + employment_signal + COALESCE(mfg_signal, 0) > 0
            THEN 'Expansion'
          ELSE 'Slowdown'
        END AS regime,
        CASE
          WHEN ABS(growth_signal) = 2 AND ABS(employment_signal) >= 1
            AND growth_signal * employment_signal > 0 THEN 'High'
          WHEN growth_signal != 0 AND employment_signal != 0
            AND growth_signal * employment_signal > 0 THEN 'Medium'
          ELSE 'Low'
        END AS confidence
      FROM regime_signals
    )"""

  private def regimeClassification(s: SparkSession, dir: String): DataFrame = {
    val wd = Window.orderBy(col("month_date"))
    regimeFrame(s, dir)
      .filter(col("regime").isNotNull)
      .select(
        col("month_date"), col("regime"), col("confidence"),
        round(col("composite_score"), 2).as("composite_score"),
        col("growth_signal").cast("long").as("growth_signal"),
        col("employment_signal").cast("long").as("employment_signal"),
        col("inflation_signal").cast("long").as("inflation_signal"),
        col("yield_curve_signal").cast("long").as("yield_curve_signal"),
        col("financial_signal").cast("long").as("financial_signal"),
        col("mfg_signal").cast("long").as("mfg_signal"),
        rsnap(col("industrial_production"), 2).as("industrial_production"),
        rsnap(col("unemployment_rate"), 2).as("unemployment_rate"),
        rsnap(col("nonfarm_payrolls"), 0).as("nonfarm_payrolls"),
        rsnap(col("cpi_yoy"), 2).as("inflation_yoy"),
        rsnap(col("yield_curve_10y2y"), 2).as("yield_curve_spread"),
        rsnap(col("leading_index"), 2).as("leading_index"),
        rsnap(col("mfg_production"), 1).as("mfg_production"),
        rsnap(col("consumer_sentiment"), 1).as("consumer_sentiment"),
        rsnap(col("financial_conditions"), 2).as("financial_conditions"),
        rsnap(col("indpro_3mo"), 2).as("indpro_3mo_change"),
        rsnap(col("unrate_3mo"), 2).as("unrate_3mo_change"),
        rsnap(col("payrolls_3mo"), 0).as("payrolls_3mo_change"),
        when(lag(col("regime"), 1).over(wd) =!= col("regime"), 1).otherwise(0)
          .cast("long").as("regime_change_flag"),
        lag(col("regime"), 1).over(wd).as("previous_regime"))
  }

  private val regimeSql: String = s"""
    WITH ${stgFredSql(RegimeCodes)},
    $regimeCtesSql
    SELECT month_date, regime, confidence,
      ROUND(composite_score, 2) + 0.0 AS composite_score,
      CAST(growth_signal AS BIGINT) AS growth_signal,
      CAST(employment_signal AS BIGINT) AS employment_signal,
      CAST(inflation_signal AS BIGINT) AS inflation_signal,
      CAST(yield_curve_signal AS BIGINT) AS yield_curve_signal,
      CAST(financial_signal AS BIGINT) AS financial_signal,
      CAST(mfg_signal AS BIGINT) AS mfg_signal,
      ${oSnap("industrial_production", 2)} AS industrial_production,
      ${oSnap("unemployment_rate", 2)} AS unemployment_rate,
      ${oSnap("nonfarm_payrolls", 0)} AS nonfarm_payrolls,
      ${oSnap("cpi_yoy", 2)} AS inflation_yoy,
      ${oSnap("yield_curve_10y2y", 2)} AS yield_curve_spread,
      ${oSnap("leading_index", 2)} AS leading_index,
      ${oSnap("mfg_production", 1)} AS mfg_production,
      ${oSnap("consumer_sentiment", 1)} AS consumer_sentiment,
      ${oSnap("financial_conditions", 2)} AS financial_conditions,
      ${oSnap("indpro_3mo", 2)} AS indpro_3mo_change,
      ${oSnap("unrate_3mo", 2)} AS unrate_3mo_change,
      ${oSnap("payrolls_3mo", 0)} AS payrolls_3mo_change,
      CAST(CASE WHEN LAG(regime) OVER (ORDER BY month_date) != regime
            THEN 1 ELSE 0 END AS BIGINT) AS regime_change_flag,
      LAG(regime) OVER (ORDER BY month_date) AS previous_regime
    FROM regime_classification
    WHERE regime IS NOT NULL
  """

  // ------------------------------------------------------------------
  // correlation_analysis_enhanced (ref, 309 LoC)
  // ------------------------------------------------------------------

  private val CorrCodes = Seq("INDPRO", "UNRATE", "PAYEMS", "CPIAUCSL",
    "T10Y2Y", "NFCI", "UMCSENT", "IPMAN")

  private def category(code: String): String = s"cat${idxOf(code) % 5}"

  private def correlationAnalysis(s: SparkSession, dir: String): DataFrame = {
    // sector monthly returns: last pct_change_1mo per (symbol, month)
    val ar = MarketAnalysisReturn.analysisReturn(
      MarketAnalysisQueries.universe(s, dir,
        concat(lit("SECT_"), col("l_returnflag")), "NYSEARCA"))
      .select(col("symbol"), col("date"), col("pct_change_1mo"))
    val wMon = Window.partitionBy(col("symbol"),
      date_trunc("month", col("date")).cast("date")).orderBy(col("date").desc)
    val sectorReturns = ar
      .withColumn("rn", row_number().over(wMon))
      .filter(col("rn") === 1)
      .select(col("symbol"),
        date_trunc("month", col("date")).cast("date").as("month_date"),
        col("pct_change_1mo").as("monthly_return"))

    // indicator monthly MoM (monthly grain of the fred staging)
    val wInd = Window.partitionBy(col("series_code")).orderBy(col("i_m"))
    val ind = stgFred(s, dir, CorrCodes)
      .groupBy(col("series_code"),
        date_trunc("month", col("date")).cast("date").as("i_m"))
      .agg(max(col("value")).as("value"))
      .withColumn("prev_v", lag(col("value"), 1).over(wInd))
      .withColumn("indicator_mom_pct",
        when(col("prev_v").isNotNull && col("prev_v") =!= 0,
          (col("value") - col("prev_v")) / abs(col("prev_v")) * 100))
      .select(col("series_code"),
        concat(lit("Series "), col("series_code")).as("series_name"),
        col("i_m"), col("indicator_mom_pct"))

    val catCol = CorrCodes.foldLeft(lit(null).cast("string")) { (acc, c) =>
      when(col("series_code") === c, lit(category(c))).otherwise(acc)
    }
    val regimes = regimeClassification(s, dir)
      .select(col("month_date").as("rc_m"), col("regime").as("rc_regime"))

    val sir = sectorReturns
      .join(ind, col("month_date") === col("i_m"))
      .join(regimes, col("month_date") === col("rc_m"), "left")
      .filter(col("indicator_mom_pct").isNotNull && col("monthly_return").isNotNull)
      .select(col("symbol"), col("month_date"), col("monthly_return"),
        col("series_code"), col("series_name"), col("indicator_mom_pct"),
        catCol.as("indicator_category"),
        coalesce(col("rc_regime"), lit("Unknown")).as("regime"))

    def dsumIf(cond: Column, v: Column): Column =
      sum(when(cond, v).cast(DecimalType(18, 6)))
    val overall = sir
      .groupBy(col("symbol"), col("series_code"), col("series_name"),
        col("indicator_category"))
      .agg(
        count(lit(1)).as("n_observations"),
        corr(col("indicator_mom_pct"), col("monthly_return")).as("correlation"),
        dsumIf(col("indicator_mom_pct") > 0, col("monthly_return")).as("up_sum"),
        count(when(col("indicator_mom_pct") > 0, col("monthly_return"))).as("up_n"),
        dsumIf(col("indicator_mom_pct") < 0, col("monthly_return")).as("down_sum"),
        count(when(col("indicator_mom_pct") < 0, col("monthly_return"))).as("down_n"))
      .filter(col("n_observations") >= 24)

    val regimeCorr = sir
      .filter(col("regime").isin("Expansion", "Slowdown", "Contraction", "Recovery"))
      .groupBy(col("symbol").as("rg_sym"), col("series_code").as("rg_code"), col("regime"))
      .agg(count(lit(1)).as("rg_n"),
        corr(col("indicator_mom_pct"), col("monthly_return")).as("rg_corr"))
      .filter(col("rg_n") >= 6)
    val regimePivot = regimeCorr
      .groupBy(col("rg_sym"), col("rg_code"))
      .agg(
        max(when(col("regime") === "Expansion", col("rg_corr"))).as("corr_expansion"),
        max(when(col("regime") === "Slowdown", col("rg_corr"))).as("corr_slowdown"),
        max(when(col("regime") === "Contraction", col("rg_corr"))).as("corr_contraction"),
        max(when(col("regime") === "Recovery", col("rg_corr"))).as("corr_recovery"),
        max(when(col("regime") === "Expansion", col("rg_n"))).as("n_expansion"),
        max(when(col("regime") === "Slowdown", col("rg_n"))).as("n_slowdown"),
        max(when(col("regime") === "Contraction", col("rg_n"))).as("n_contraction"),
        max(when(col("regime") === "Recovery", col("rg_n"))).as("n_recovery"))

    val wRoll = Window.partitionBy(col("symbol"), col("series_code")).orderBy(col("month_date"))
    val rolling = sir.select(col("symbol"), col("series_code"), col("month_date"),
      corr(col("indicator_mom_pct"), col("monthly_return"))
        .over(wRoll.rowsBetween(-11, 0)).as("rolling_corr_12m"))
    val withSigns = rolling
      .filter(col("rolling_corr_12m").isNotNull)
      .withColumn("sign_change_flag",
        when(col("rolling_corr_12m") * lag(col("rolling_corr_12m"), 1).over(wRoll) < 0, 1)
          .otherwise(0))
    val stability = withSigns
      .groupBy(col("symbol").as("cs_sym"), col("series_code").as("cs_code"))
      .agg(
        stddev_samp(col("rolling_corr_12m")).as("rolling_corr_std"),
        avg(col("rolling_corr_12m")).as("rolling_corr_mean"),
        min(col("rolling_corr_12m")).as("rolling_corr_min"),
        max(col("rolling_corr_12m")).as("rolling_corr_max"),
        sum(col("sign_change_flag")).cast("long").as("sign_changes"))

    val tRaw = col("correlation") * sqrt(col("n_observations") - 2) /
      nullif(sqrt(lit(1.0) - pow(col("correlation"), 2)))
    val upAvg   = col("up_sum").cast("double") / nullif(col("up_n").cast("double"))
    val downAvg = col("down_sum").cast("double") / nullif(col("down_n").cast("double"))
    val cv = abs(col("rolling_corr_std") / col("rolling_corr_mean"))
    val isSig = abs(tRaw) > 1.96
    val isStable = col("rolling_corr_mean") =!= 0 && cv < 1
    overall
      .join(regimePivot,
        col("symbol") === col("rg_sym") && col("series_code") === col("rg_code"), "left")
      .join(stability,
        col("symbol") === col("cs_sym") && col("series_code") === col("cs_code"), "left")
      .select(
        col("symbol"), col("series_code"), col("series_name"), col("indicator_category"),
        col("n_observations"),
        round(col("correlation"), 4).as("correlation"),
        round(when(abs(col("correlation")) < 0.9999 && col("n_observations") > 2,
          col("correlation") * sqrt(col("n_observations") - 2) /
            sqrt(lit(1.0) - pow(col("correlation"), 2))), 3).as("t_statistic"),
        when(abs(tRaw) > 3.291, "p < 0.001")
          .when(abs(tRaw) > 2.576, "p < 0.01")
          .when(abs(tRaw) > 1.96, "p < 0.05")
          .when(abs(tRaw) > 1.645, "p < 0.10")
          .otherwise("p >= 0.10").as("significance_level"),
        coalesce(isSig, lit(false)).as("is_significant"),
        when(col("up_n") > 0, rdiv(col("up_sum"), col("up_n"), 2))
          .as("avg_return_indicator_up"),
        when(col("down_n") > 0, rdiv(col("down_sum"), col("down_n"), 2))
          .as("avg_return_indicator_down"),
        rsnap(coalesce(upAvg, lit(0.0)) - coalesce(downAvg, lit(0.0)), 2).as("return_spread"),
        round(col("corr_expansion"), 4).as("corr_expansion"),
        round(col("corr_slowdown"), 4).as("corr_slowdown"),
        round(col("corr_contraction"), 4).as("corr_contraction"),
        round(col("corr_recovery"), 4).as("corr_recovery"),
        col("n_expansion"), col("n_slowdown"), col("n_contraction"), col("n_recovery"),
        round(col("rolling_corr_std"), 4).as("correlation_volatility"),
        round(col("rolling_corr_min"), 4).as("correlation_min"),
        round(col("rolling_corr_max"), 4).as("correlation_max"),
        col("sign_changes").as("correlation_sign_changes"),
        round(when(col("rolling_corr_mean") =!= 0, cv), 2).as("stability_score"),
        coalesce(isStable, lit(false)).as("is_stable"),
        when(coalesce(isSig, lit(false)) && coalesce(isStable, lit(false)), "High")
          .when(coalesce(isSig, lit(false)) || coalesce(isStable, lit(false)), "Medium")
          .otherwise("Low").as("quality_rating"))
  }

  private val correlationSql: String = {
    val catCase = CorrCodes
      .map(c => s"WHEN '$c' THEN '${category(c)}'").mkString(" ")
    val tRaw =
      "oc.correlation * SQRT(oc.n_observations - 2) / NULLIF(SQRT(1 - POWER(oc.correlation, 2)), 0)"
    s"""
    WITH ${stgFredSql((CorrCodes ++ RegimeCodes).distinct)},
    ${MarketAnalysisQueries.uniCte("'SECT_' || l_returnflag", "NYSEARCA")},
    daily AS (
      SELECT *, adj_close - LAG(adj_close, 1) OVER (
        PARTITION BY symbol, exchange ORDER BY date) AS daily_diff
      FROM uni WHERE adj_close IS NOT NULL
    ),
    lb AS (
      SELECT dc.symbol, dc.date, dc.adj_close, p30.adj_close AS price_30d_ago
      FROM daily dc
      LEFT JOIN daily p30 ON dc.symbol = p30.symbol AND dc.exchange = p30.exchange
        AND p30.date + 30 = dc.date
    ),
    sector_monthly AS (
      SELECT symbol,
        CAST(DATE_TRUNC('month', date) AS DATE) AS month_date,
        ROUND(CASE WHEN price_30d_ago IS NOT NULL AND price_30d_ago > 0
          THEN (adj_close - price_30d_ago) / price_30d_ago * 100 END, 2) + 0.0
          AS monthly_return,
        ROW_NUMBER() OVER (
          PARTITION BY symbol, CAST(DATE_TRUNC('month', date) AS DATE)
          ORDER BY date DESC) AS rn
      FROM lb
    ),
    sector_returns AS (
      SELECT symbol, month_date, monthly_return FROM sector_monthly WHERE rn = 1
    ),
    indicator_monthly AS (
      SELECT series_code, 'Series ' || series_code AS series_name, i_m,
        CASE WHEN prev_v IS NOT NULL AND prev_v != 0
          THEN ((value - prev_v) / ABS(prev_v)) * 100 END AS indicator_mom_pct
      FROM (
        SELECT series_code, CAST(DATE_TRUNC('month', date) AS DATE) AS i_m,
          MAX(value) AS value,
          LAG(MAX(value)) OVER (PARTITION BY series_code
            ORDER BY CAST(DATE_TRUNC('month', date) AS DATE)) AS prev_v
        FROM stg
        WHERE series_code IN (${CorrCodes.map(c => s"'$c'").mkString(", ")})
        GROUP BY 1, 2
      )
    ),
    $regimeCtesSql,
    regimes AS (
      SELECT month_date AS rc_m, regime FROM regime_classification WHERE regime IS NOT NULL
    ),
    sector_indicator_regime AS (
      SELECT sr.symbol, sr.month_date, sr.monthly_return,
        im.series_code, im.series_name, im.indicator_mom_pct,
        CASE im.series_code $catCase END AS indicator_category,
        COALESCE(rc.regime, 'Unknown') AS regime
      FROM sector_returns sr
      JOIN indicator_monthly im ON sr.month_date = im.i_m
      LEFT JOIN regimes rc ON sr.month_date = rc.rc_m
      WHERE im.indicator_mom_pct IS NOT NULL AND sr.monthly_return IS NOT NULL
    ),
    overall_correlations AS (
      SELECT symbol, series_code, series_name, indicator_category,
        COUNT(*) AS n_observations,
        CORR(indicator_mom_pct, monthly_return) AS correlation,
        SUM(CASE WHEN indicator_mom_pct > 0 THEN CAST(monthly_return AS DECIMAL(18,6)) END) AS up_sum,
        COUNT(CASE WHEN indicator_mom_pct > 0 THEN monthly_return END) AS up_n,
        SUM(CASE WHEN indicator_mom_pct < 0 THEN CAST(monthly_return AS DECIMAL(18,6)) END) AS down_sum,
        COUNT(CASE WHEN indicator_mom_pct < 0 THEN monthly_return END) AS down_n
      FROM sector_indicator_regime
      GROUP BY symbol, series_code, series_name, indicator_category
      HAVING COUNT(*) >= 24
    ),
    regime_correlations AS (
      SELECT symbol, series_code, regime,
        COUNT(*) AS n_observations,
        CORR(indicator_mom_pct, monthly_return) AS correlation
      FROM sector_indicator_regime
      WHERE regime IN ('Expansion', 'Slowdown', 'Contraction', 'Recovery')
      GROUP BY symbol, series_code, regime
      HAVING COUNT(*) >= 6
    ),
    regime_pivot AS (
      SELECT symbol, series_code,
        MAX(CASE WHEN regime = 'Expansion' THEN correlation END) AS corr_expansion,
        MAX(CASE WHEN regime = 'Slowdown' THEN correlation END) AS corr_slowdown,
        MAX(CASE WHEN regime = 'Contraction' THEN correlation END) AS corr_contraction,
        MAX(CASE WHEN regime = 'Recovery' THEN correlation END) AS corr_recovery,
        MAX(CASE WHEN regime = 'Expansion' THEN n_observations END) AS n_expansion,
        MAX(CASE WHEN regime = 'Slowdown' THEN n_observations END) AS n_slowdown,
        MAX(CASE WHEN regime = 'Contraction' THEN n_observations END) AS n_contraction,
        MAX(CASE WHEN regime = 'Recovery' THEN n_observations END) AS n_recovery
      FROM regime_correlations
      GROUP BY symbol, series_code
    ),
    rolling_correlations AS (
      SELECT symbol, series_code, month_date,
        CORR(indicator_mom_pct, monthly_return) OVER (
          PARTITION BY symbol, series_code ORDER BY month_date
          ROWS BETWEEN 11 PRECEDING AND CURRENT ROW) AS rolling_corr_12m
      FROM sector_indicator_regime
    ),
    correlation_with_signs AS (
      SELECT *,
        CASE WHEN rolling_corr_12m * LAG(rolling_corr_12m) OVER (
          PARTITION BY symbol, series_code ORDER BY month_date) < 0 THEN 1 ELSE 0 END
          AS sign_change_flag
      FROM rolling_correlations
      WHERE rolling_corr_12m IS NOT NULL
    ),
    correlation_stability AS (
      SELECT symbol, series_code,
        STDDEV_SAMP(rolling_corr_12m) AS rolling_corr_std,
        AVG(rolling_corr_12m) AS rolling_corr_mean,
        MIN(rolling_corr_12m) AS rolling_corr_min,
        MAX(rolling_corr_12m) AS rolling_corr_max,
        CAST(SUM(sign_change_flag) AS BIGINT) AS sign_changes
      FROM correlation_with_signs
      GROUP BY symbol, series_code
    )
    SELECT oc.symbol, oc.series_code, oc.series_name, oc.indicator_category,
      oc.n_observations,
      ROUND(oc.correlation, 4) + 0.0 AS correlation,
      ROUND(CASE WHEN ABS(oc.correlation) < 0.9999 AND oc.n_observations > 2
        THEN oc.correlation * SQRT(oc.n_observations - 2)
          / SQRT(1 - POWER(oc.correlation, 2)) END, 3) + 0.0 AS t_statistic,
      CASE
        WHEN ABS($tRaw) > 3.291 THEN 'p < 0.001'
        WHEN ABS($tRaw) > 2.576 THEN 'p < 0.01'
        WHEN ABS($tRaw) > 1.96 THEN 'p < 0.05'
        WHEN ABS($tRaw) > 1.645 THEN 'p < 0.10'
        ELSE 'p >= 0.10'
      END AS significance_level,
      COALESCE(ABS($tRaw) > 1.96, FALSE) AS is_significant,
      CASE WHEN oc.up_n > 0 THEN
        ${oDivRound("CAST(oc.up_sum * 1000000 AS HUGEINT)", "oc.up_n", 2)}
      END AS avg_return_indicator_up,
      CASE WHEN oc.down_n > 0 THEN
        ${oDivRound("CAST(oc.down_sum * 1000000 AS HUGEINT)", "oc.down_n", 2)}
      END AS avg_return_indicator_down,
      ${oSnap(
      "COALESCE(CAST(oc.up_sum AS DOUBLE) / NULLIF(CAST(oc.up_n AS DOUBLE), 0), 0) - COALESCE(CAST(oc.down_sum AS DOUBLE) / NULLIF(CAST(oc.down_n AS DOUBLE), 0), 0)",
      2)} AS return_spread,
      ROUND(rp.corr_expansion, 4) + 0.0 AS corr_expansion,
      ROUND(rp.corr_slowdown, 4) + 0.0 AS corr_slowdown,
      ROUND(rp.corr_contraction, 4) + 0.0 AS corr_contraction,
      ROUND(rp.corr_recovery, 4) + 0.0 AS corr_recovery,
      rp.n_expansion, rp.n_slowdown, rp.n_contraction, rp.n_recovery,
      ROUND(cs.rolling_corr_std, 4) + 0.0 AS correlation_volatility,
      ROUND(cs.rolling_corr_min, 4) + 0.0 AS correlation_min,
      ROUND(cs.rolling_corr_max, 4) + 0.0 AS correlation_max,
      cs.sign_changes AS correlation_sign_changes,
      ROUND(CASE WHEN cs.rolling_corr_mean != 0
        THEN ABS(cs.rolling_corr_std / cs.rolling_corr_mean) END, 2) + 0.0 AS stability_score,
      COALESCE(cs.rolling_corr_mean != 0
        AND ABS(cs.rolling_corr_std / cs.rolling_corr_mean) < 1, FALSE) AS is_stable,
      CASE
        WHEN COALESCE(ABS($tRaw) > 1.96, FALSE)
          AND COALESCE(cs.rolling_corr_mean != 0
            AND ABS(cs.rolling_corr_std / cs.rolling_corr_mean) < 1, FALSE) THEN 'High'
        WHEN COALESCE(ABS($tRaw) > 1.96, FALSE)
          OR COALESCE(cs.rolling_corr_mean != 0
            AND ABS(cs.rolling_corr_std / cs.rolling_corr_mean) < 1, FALSE) THEN 'Medium'
        ELSE 'Low'
      END AS quality_rating
    FROM overall_correlations oc
    LEFT JOIN regime_pivot rp
      ON oc.symbol = rp.symbol AND oc.series_code = rp.series_code
    LEFT JOIN correlation_stability cs
      ON oc.symbol = cs.symbol AND oc.series_code = cs.series_code
  """
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q_economic_regime_classification", regimeClassification, Some(regimeSql)),
    QueryDef("q_correlation_analysis_enhanced", correlationAnalysis, Some(correlationSql))
  )
}

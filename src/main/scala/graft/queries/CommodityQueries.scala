package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.models.MarketAnalysisReturn
import graft.queries.QueryDef.{oDivRound, oSnap, rdiv, rsnap}
import graft.runtime.Tables

/** The commodity model family 1:1 (SURVEY.md §2.M; ref dbt_project/
  * macros/calculate_commodity_summary.sql and
  * calculate_commodity_analysis_return.sql, instantiated by the six
  * models in dbt_project/models/commodities/ plus the
  * agent_commodity_performance view).
  *
  * Unlike the equity/index models (calculate_market_summary), the
  * commodity macros run on a single price column keyed by
  * (commodity_name, commodity_unit): day-over-day LAG changes instead
  * of intraday open→close, boundary prices from the same price column,
  * and no volume/adjusted series. The macro's CURRENT_DATE anchor maps
  * to max(date) (deterministic, same convention as MarketSummary).
  *
  * calculate_commodity_analysis_return is the market analysis_return
  * template over (price, price, price) in place of
  * (adj_close, adj_high, adj_low) with no volume — so it reuses
  * [[MarketAnalysisReturn.analysisReturn]] (single persisted daily
  * frame, one exploded-offset lookback join, shared RANGE window
  * family) under renamed keys. Prices stay RAW 2-decimal aggregates so
  * daily diffs are exact and the DECIMAL(18,3) moment snap is
  * lossless.
  *
  * Scale: one fact-table aggregation per universe; all windows keyed
  * by (commodity_name, commodity_unit); the bounds frame broadcasts.
  */
object CommodityQueries {

  private def T(s: SparkSession, dir: String) = Tables(s, dir)

  private val mdKey =
    "md5(CAST(l_orderkey AS VARCHAR) || '|' || CAST(l_linenumber AS VARCHAR) || '|' || " +
      "CAST(l_partkey AS VARCHAR) || '|' || CAST(l_suppkey AS VARCHAR))"

  /** (name root, spark bucket, sql bucket, unit, agent category) —
    * same symbol spaces as the snapshot variants. */
  val Universes: Seq[(String, SparkSession => Column, String, String, String)] = Seq(
    ("energy_commodities", _ => concat(lit("EN_"), col("l_suppkey") % 4),
      "'EN_' || CAST(l_suppkey % 4 AS VARCHAR)", "barrel", "energy"),
    ("agriculture_commodities", _ => concat(lit("AG_"), col("l_orderkey") % 5),
      "'AG_' || CAST(l_orderkey % 5 AS VARCHAR)", "bushel", "agriculture"),
    ("input_commodities", _ => concat(lit("IN_"), col("l_partkey") % 6),
      "'IN_' || CAST(l_partkey % 6 AS VARCHAR)", "ton", "input"))

  /** stg_*_commodities staging: (commodity_name, commodity_unit, date,
    * price) — RAW md5-keyed price pick (2-decimal exact). */
  def staging(s: SparkSession, dir: String, bucket: Column, unit: String): DataFrame = {
    val key = md5(concat_ws("|",
      col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey")))
    T(s, dir).lineitem
      .groupBy(bucket.as("commodity_name"), to_date(col("l_shipdate")).as("date"))
      .agg(max_by(col("l_extendedprice"), key).as("price"))
      .withColumn("commodity_unit", lit(unit))
  }

  def stagingCte(bucketSql: String, unit: String): String = s"""
    cstg AS (
      SELECT $bucketSql AS commodity_name, CAST(l_shipdate AS DATE) AS date,
        MAX_BY(l_extendedprice, $mdKey) AS price,
        '$unit' AS commodity_unit
      FROM lineitem GROUP BY 1, 2
    )"""

  /** All three universes' stagings from ONE lineitem pass: the md5
    * tie-break key is computed once per row and the row fans out to
    * its three (bucket, unit) family keys via explode — one fact scan
    * and one shuffle where the naive per-universe union pays three of
    * each (VERDICT r6 §wrong-2). Row-identical to
    * `Universes.map(staging).reduce(unionByName)`: the bucket
    * functions are total (every lineitem row lands in each family)
    * and the EN_/AG_/IN_ key spaces are disjoint, so the grouped
    * cells coincide 1:1. At 100 TB the three-scan shape reads the
    * fact table three times; this reads it once. */
  def stagingAll(s: SparkSession, dir: String): DataFrame = {
    val key = md5(concat_ws("|",
      col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey")))
    val fams = array(Universes.map { case (_, bucket, _, unit, _) =>
      struct(bucket(s).as("commodity_name"), lit(unit).as("commodity_unit"))
    }: _*)
    T(s, dir).lineitem
      .select(col("l_extendedprice"), to_date(col("l_shipdate")).as("date"),
        key.as("__k"), explode(fams).as("fam"))
      .groupBy(col("fam.commodity_name").as("commodity_name"), col("date"),
        col("fam.commodity_unit").as("commodity_unit"))
      .agg(max_by(col("l_extendedprice"), col("__k")).as("price"))
      .select(col("commodity_name"), col("date"), col("price"), col("commodity_unit"))
  }

  // ------------------------------------------------------------------
  // calculate_commodity_summary
  // ------------------------------------------------------------------

  /** The summary macro: LAG changes over FULL history (the first bar
    * inside the 5y window keeps its change from the bar before it —
    * unlike the snapshot variant, whose LAG lives inside each
    * window). */
  def commoditySummary(stg: DataFrame): DataFrame = {
    val wLag = Window.partitionBy(col("commodity_name")).orderBy(col("date"))
    // Persisted: `base` feeds the bounds scalar AND the period frame,
    // and `fd` below fans out to three more branches (start/end price
    // picks + the aggregate) — without the cache each branch re-runs
    // the staging aggregation of the fact table (VERDICT r2 §wrong-2
    // shape). Daily-grain × #commodities rows: driver-memory small.
    val base = stg
      .filter(col("price").isNotNull && col("date").isNotNull && col("price") > 0)
      .withColumn("prev_price", lag(col("price"), 1).over(wLag))
      .withColumn("price_change", col("price") - col("prev_price"))
      .withColumn("pct_change",
        when(col("prev_price") > 0, (col("price") - col("prev_price")) / col("prev_price") * 100))
      .persist()
    val bounds = base.agg(max(col("date")).as("today")).select(
      col("today"),
      date_sub(col("today"), 84).as("w12"),
      add_months(col("today"), -6).as("m6"),
      add_months(col("today"), -12).as("y1"),
      add_months(col("today"), -60).as("y5"))
    val fd = base
      .crossJoin(broadcast(bounds))
      .filter(col("date") >= col("y5") && col("price_change").isNotNull)
      .withColumn("time_period",
        when(col("date") >= col("w12"), "12_weeks")
          .when(col("date") >= col("m6"), "6_months")
          .when(col("date") >= col("y1"), "1_year")
          .otherwise("5_years"))
      .persist()
    val pk = Seq(col("commodity_name"), col("commodity_unit"), col("time_period"))
    val wS = Window.partitionBy(pk: _*).orderBy(col("date").asc, col("price").asc)
    val wE = Window.partitionBy(pk: _*).orderBy(col("date").desc, col("price").desc)
    val priced = fd
      .withColumn("rn_s", row_number().over(wS))
      .withColumn("rn_e", row_number().over(wE))
    val startP = priced.filter(col("rn_s") === 1)
      .select(col("commodity_name").as("sp_name"), col("time_period").as("sp_period"),
        col("price").as("period_start_price"))
    val endP = priced.filter(col("rn_e") === 1)
      .select(col("commodity_name").as("ep_name"), col("time_period").as("ep_period"),
        col("price").as("period_end_price"))
    val pctDec  = col("pct_change").cast(DecimalType(18, 6))
    val pctDec3 = col("pct_change").cast(DecimalType(18, 3))
    val ar = fd
      .groupBy(pk: _*)
      .agg(
        min(col("date")).as("period_start_date"),
        max(col("date")).as("period_end_date"),
        count(lit(1)).as("trading_days"),
        sum(col("price_change").cast(DecimalType(18, 6))).as("sum_chg_dec"),
        min(col("price_change")).as("min_chg"),
        max(col("price_change")).as("max_chg"),
        sum(pctDec).as("sx_dec"),
        sum(pctDec3).cast("double").as("sxv"),
        sum(pctDec3 * pctDec3).cast("double").as("sx2"),
        count(col("pct_change")).as("n_pct"),
        sum(when(col("price_change") > 0, 1).otherwise(0)).cast("long").as("positive_days"),
        sum(when(col("price_change") < 0, 1).otherwise(0)).cast("long").as("negative_days"),
        sum(when(col("price_change") === 0, 1).otherwise(0)).cast("long").as("neutral_days"))
    val vol = when(col("n_pct") > 1,
      sqrt(greatest(
        (col("sx2") - col("sxv") * col("sxv") / col("n_pct")) / (col("n_pct") - 1),
        lit(0.0))) * sqrt(lit(252.0)))
    ar
      .join(startP, col("commodity_name") === col("sp_name") &&
        col("time_period") === col("sp_period"), "left")
      .join(endP, col("commodity_name") === col("ep_name") &&
        col("time_period") === col("ep_period"), "left")
      .select(
        col("commodity_name"), col("commodity_unit"), col("time_period"),
        col("period_start_date"), col("period_end_date"),
        col("trading_days"), col("positive_days"), col("negative_days"), col("neutral_days"),
        round(when(col("period_start_price") > 0,
          (col("period_end_price") - col("period_start_price")) / col("period_start_price") * 100), 2)
          .as("total_return_pct"),
        round(col("sx_dec").cast(DecimalType(38, 6)) / col("n_pct"), 4)
          .cast("double").as("avg_daily_return_pct"),
        rsnap(vol, 2).as("volatility_pct"),
        round((col("positive_days") * 100).cast(DecimalType(38, 6)) / col("trading_days"), 1)
          .cast("double").as("win_rate_pct"),
        rsnap(col("sum_chg_dec").cast("double"), 2).as("total_price_change"),
        round(col("sum_chg_dec").cast(DecimalType(38, 6)) / col("trading_days"), 4)
          .cast("double").as("avg_daily_price_change"),
        rsnap(col("min_chg"), 2).as("worst_day_change"),
        rsnap(col("max_chg"), 2).as("best_day_change"),
        rsnap(col("period_start_price"), 2).as("period_start_price"),
        rsnap(col("period_end_price"), 2).as("period_end_price"))
  }

  def commoditySummaryOracleSql(cte: String): String = s"""
    WITH $cte,
    based AS (
      SELECT *,
        price - LAG(price) OVER w AS price_change,
        CASE WHEN LAG(price) OVER w > 0
             THEN (price - LAG(price) OVER w) / (LAG(price) OVER w) * 100 END AS pct_change
      FROM cstg
      WHERE price IS NOT NULL AND date IS NOT NULL AND price > 0
      WINDOW w AS (PARTITION BY commodity_name ORDER BY date)
    ),
    db AS (
      SELECT MAX(date) AS today,
        CAST(MAX(date) - INTERVAL 84 DAY AS DATE) AS w12,
        CAST(MAX(date) - INTERVAL 6 MONTH AS DATE) AS m6,
        CAST(MAX(date) - INTERVAL 1 YEAR AS DATE) AS y1,
        CAST(MAX(date) - INTERVAL 5 YEAR AS DATE) AS y5
      FROM based
    ),
    fd AS (
      SELECT b.*,
        CASE WHEN date >= w12 THEN '12_weeks'
             WHEN date >= m6 THEN '6_months'
             WHEN date >= y1 THEN '1_year'
             ELSE '5_years' END AS time_period
      FROM based b, db
      WHERE b.date >= db.y5 AND b.price_change IS NOT NULL
    ),
    sp2 AS (
      SELECT commodity_name, time_period, price AS period_start_price FROM (
        SELECT commodity_name, time_period, price,
          ROW_NUMBER() OVER (PARTITION BY commodity_name, commodity_unit, time_period
            ORDER BY date ASC, price ASC) AS rn
        FROM fd) WHERE rn = 1
    ),
    ep2 AS (
      SELECT commodity_name, time_period, price AS period_end_price FROM (
        SELECT commodity_name, time_period, price,
          ROW_NUMBER() OVER (PARTITION BY commodity_name, commodity_unit, time_period
            ORDER BY date DESC, price DESC) AS rn
        FROM fd) WHERE rn = 1
    ),
    ar AS (
      SELECT commodity_name, commodity_unit, time_period,
        MIN(date) AS period_start_date,
        MAX(date) AS period_end_date,
        CAST(COUNT(*) AS BIGINT) AS trading_days,
        SUM(CAST(price_change AS DECIMAL(18,6))) AS sum_chg_dec,
        MIN(price_change) AS min_chg, MAX(price_change) AS max_chg,
        SUM(CAST(pct_change AS DECIMAL(18,6))) AS sx_dec,
        CAST(SUM(CAST(pct_change AS DECIMAL(18,3))) AS DOUBLE) AS sxv,
        CAST(SUM(CAST(pct_change AS DECIMAL(18,3)) * CAST(pct_change AS DECIMAL(18,3))) AS DOUBLE) AS sx2,
        CAST(COUNT(pct_change) AS BIGINT) AS n_pct,
        CAST(SUM(CASE WHEN price_change > 0 THEN 1 ELSE 0 END) AS BIGINT) AS positive_days,
        CAST(SUM(CASE WHEN price_change < 0 THEN 1 ELSE 0 END) AS BIGINT) AS negative_days,
        CAST(SUM(CASE WHEN price_change = 0 THEN 1 ELSE 0 END) AS BIGINT) AS neutral_days
      FROM fd GROUP BY 1, 2, 3
    )
    SELECT ar.commodity_name, ar.commodity_unit, ar.time_period,
      ar.period_start_date, ar.period_end_date,
      ar.trading_days, ar.positive_days, ar.negative_days, ar.neutral_days,
      ROUND(CASE WHEN sp2.period_start_price > 0 THEN (ep2.period_end_price - sp2.period_start_price) / sp2.period_start_price * 100 END, 2) + 0.0 AS total_return_pct,
      ${oDivRound("CAST(sx_dec * 1000000 AS HUGEINT)", "n_pct", 4)} AS avg_daily_return_pct,
      ${oSnap("CASE WHEN n_pct > 1 THEN SQRT(GREATEST((sx2 - sxv * sxv / n_pct) / (n_pct - 1), 0.0)) * SQRT(252.0) END", 2)} AS volatility_pct,
      ${oDivRound("positive_days * 100000000", "trading_days", 1)} AS win_rate_pct,
      ${oSnap("CAST(sum_chg_dec AS DOUBLE)", 2)} AS total_price_change,
      ${oDivRound("CAST(sum_chg_dec * 1000000 AS HUGEINT)", "trading_days", 4)} AS avg_daily_price_change,
      ${oSnap("min_chg", 2)} AS worst_day_change,
      ${oSnap("max_chg", 2)} AS best_day_change,
      ${oSnap("sp2.period_start_price", 2)} AS period_start_price,
      ${oSnap("ep2.period_end_price", 2)} AS period_end_price
    FROM ar
    LEFT JOIN sp2 ON ar.commodity_name = sp2.commodity_name AND ar.time_period = sp2.time_period
    LEFT JOIN ep2 ON ar.commodity_name = ep2.commodity_name AND ar.time_period = ep2.time_period"""

  // ------------------------------------------------------------------
  // calculate_commodity_analysis_return
  // ------------------------------------------------------------------

  /** The analysis_return macro over (price, price, price): reuses the
    * market template's single-pass window-family plan under renamed
    * keys (commodity_unit rides the `exchange` slot). */
  def commodityAnalysisReturn(stg: DataFrame): DataFrame = {
    val p = col("price")
    val uni = stg.select(
      col("commodity_name").as("symbol"), col("commodity_unit").as("exchange"), col("date"),
      p.as("close"), p.as("high"), p.as("low"), p.as("volume"),
      p.as("adj_close"), p.as("adj_high"), p.as("adj_low"), p.as("adj_volume"))
    val ar = MarketAnalysisReturn.analysisReturn(uni)
    ar.select(
      Seq(col("symbol").as("commodity_name"), col("exchange").as("commodity_unit"),
        col("date"), col("current_price")) ++
        MarketAnalysisReturn.Horizons.flatMap { case (_, tag) =>
          Seq(col(s"high_$tag"), col(s"low_$tag"), col(s"std_diff_$tag"), col(s"pct_change_$tag"))
        }: _*)
  }

  def commodityAnalysisReturnOracleSql(bucketSql: String, unit: String): String = {
    val uniCte = s"""uni AS (
      SELECT commodity_name AS symbol, commodity_unit AS exchange, date,
        price AS close, price AS high, price AS low, price AS volume,
        price AS adj_close, price AS adj_high, price AS adj_low, price AS adj_volume
      FROM (
        SELECT $bucketSql AS commodity_name, CAST(l_shipdate AS DATE) AS date,
          MAX_BY(l_extendedprice, $mdKey) AS price, '$unit' AS commodity_unit
        FROM lineitem GROUP BY 1, 2
      )
    )"""
    val horizonCols = MarketAnalysisReturn.Horizons.flatMap { case (_, tag) =>
      Seq(s"high_$tag", s"low_$tag", s"std_diff_$tag", s"pct_change_$tag")
    }.mkString(", ")
    s"""
    SELECT symbol AS commodity_name, exchange AS commodity_unit, date, current_price,
      $horizonCols
    FROM (${MarketAnalysisReturn.oracleSql(uniCte)})"""
  }

  // ------------------------------------------------------------------

  /** agent_commodity_performance.sql projection over one summary. */
  private def agentPerfCols(category: Column): Seq[Column] = Seq(
    col("commodity_name"), col("commodity_name").as("commodity"), col("commodity_unit"),
    col("time_period"), col("period_start_date"), col("period_end_date"),
    col("trading_days"), col("total_return_pct"), col("avg_daily_return_pct"),
    col("volatility_pct"), col("volatility_pct").as("annualized_volatility_pct"),
    col("win_rate_pct"), col("total_price_change"), col("avg_daily_price_change"),
    col("worst_day_change"), col("worst_day_change").as("worst_day_pct_change"),
    col("best_day_change"), col("best_day_change").as("best_day_pct_change"),
    col("positive_days"), col("negative_days"), col("neutral_days"),
    col("period_start_price"), col("period_end_price"),
    category.as("commodity_category"),
    lit(null).cast("date").as("snapshot_date"))

  private val agentPerfColsSql =
    """commodity_name, commodity_name AS commodity, commodity_unit, time_period,
       period_start_date, period_end_date, trading_days, total_return_pct,
       avg_daily_return_pct, volatility_pct, volatility_pct AS annualized_volatility_pct,
       win_rate_pct, total_price_change, avg_daily_price_change,
       worst_day_change, worst_day_change AS worst_day_pct_change,
       best_day_change, best_day_change AS best_day_pct_change,
       positive_days, negative_days, neutral_days, period_start_price, period_end_price"""

  val defs: Seq[QueryDef] =
    Universes.map { case (root, bucket, bucketSql, unit, _) =>
      QueryDef(
        s"q_${root}_summary",
        (s, dir) => commoditySummary(staging(s, dir, bucket(s), unit)),
        Some(commoditySummaryOracleSql(stagingCte(bucketSql, unit)))
      )
    } ++ Universes.map { case (root, bucket, bucketSql, unit, _) =>
      QueryDef(
        s"q_${root}_analysis_return",
        (s, dir) => commodityAnalysisReturn(staging(s, dir, bucket(s), unit)),
        Some(commodityAnalysisReturnOracleSql(bucketSql, unit))
      )
    } ++ Seq(
      QueryDef(
        "q_agent_commodity_performance",
        // ONE summary run over the single-scan staging: the bounds
        // scalar (max date) and every window/aggregation key are
        // independent per commodity prefix, so one shared pipeline
        // equals three (each universe's date domain is the full
        // ship-date range)
        (s, dir) => {
          val stg = stagingAll(s, dir)
          val cat = Universes.foldLeft(lit(null).cast("string")) {
            case (acc, (_, _, _, _, c)) =>
              val pfx = c match {
                case "energy" => "EN_"; case "agriculture" => "AG_"; case _ => "IN_"
              }
              when(col("commodity_name").startsWith(pfx), lit(c)).otherwise(acc)
          }
          commoditySummary(stg).select(agentPerfCols(cat): _*)
        },
        Some(Universes.map { case (_, _, bucketSql, unit, cat) =>
          s"""SELECT $agentPerfColsSql, '$cat' AS commodity_category,
                CAST(NULL AS DATE) AS snapshot_date
              FROM (${commoditySummaryOracleSql(stagingCte(bucketSql, unit))})"""
        }.mkString(" UNION ALL "))
      )
    )
}

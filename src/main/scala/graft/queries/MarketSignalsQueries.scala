package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.GraftFunctions.epochDay
import graft.operators.TimeSeriesOps
import graft.queries.FredSignalQueries.{stgFred, stgFredSql}
import graft.queries.QueryDef.{oDivRound, rdiv}
import graft.runtime.Tables

/** The remaining market-signals analysis models 1:1:
  *
  *  - market_breadth_signals (ref dbt_project/models/signals/
  *    market_breadth_signals.sql, 330 LoC): the FULL composite —
  *    %-above-SMA breadth, A/D internals + cumulative A/D line,
  *    McClellan oscillator/summation (recursive EMA with the
  *    reference's literal coefficient pairs), Zweig thrust, SPY
  *    252d-high divergence, sector participation, and the pairwise
  *    63-day correlation / dispersion internals. The standalone
  *    q_market_breadth / q_mcclellan_breadth remain as the
  *    operator-level views; this is the model a reference user
  *    materializes. The reference's `HAVING COUNT(DISTINCT symbol)
  *    >= 400` S&P-coverage guard scales to >= 20 (same 80% coverage ratio at the sf0.01 gate) for the 100-symbol
  *    synthetic universe.
  *  - technical_signals (ref signals/technical_signals.sql, 225 LoC):
  *    the DEPRECATED SPY-only model (kept by the reference for its
  *    unique VIX mean-reversion columns) — RSI(14)/RSI(2), Bollinger
  *    bands/bandwidth-percentile/squeeze, 60d z-score, VIX 252d
  *    percentile/z-score from the FRED VIXCLS series, and the status
  *    ladders.
  *  - commodity_market_signals (ref analysis/commodity_market_signals
  *    .sql): copper/gold, gold/SPY ratios, oil momentum vs SMA20/50,
  *    trend signal.
  *  - reddit_cross_subreddit_activity (ref analysis/
  *    reddit_cross_subreddit_activity.sql): URL- and normalized-title-
  *    overlap story detection across subreddits with attention/
  *    crossover tags. `subreddits` ships as an ordered comma-joined
  *    string (the driver gate hashes scalars, not arrays); post
  *    titles get a long-title fixture so the >20-char title branch is
  *    exercised.
  *
  * CURRENT_DATE anchors map to each model's max observation date.
  * Windowed averages of exact-decimal series go through DECIMAL sums
  * (order-independent, deterministic .5 rounding); int-ratio rounds
  * use the rdiv/oDivRound exact-division pair; STDDEV/CORR windows are
  * raw on both sides (TechnicalIndicators precedent).
  *
  * Scale: breadth is one per-symbol window family over the stock
  * universe, one date-keyed rollup, and macro-level (single-series)
  * frames after that; the pair-correlation internals are bounded by
  * the 5-symbol internals set (10 pairs), never the stock universe.
  */
object MarketSignalsQueries {

  private def T(s: SparkSession, dir: String) = Tables(s, dir)

  private val mdKeyCols = Seq("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
  private def mdKey     = md5(concat_ws("|", mdKeyCols.map(col): _*))
  private val mdKeySql =
    "md5(CAST(l_orderkey AS VARCHAR) || '|' || CAST(l_linenumber AS VARCHAR) || '|' || " +
      "CAST(l_partkey AS VARCHAR) || '|' || CAST(l_suppkey AS VARCHAR))"

  /** adj-close staging for one bucketed universe: (symbol, date,
    * adj_close [, volume]) — adj = raw/2 as in the market models. */
  private def adjStaging(s: SparkSession, dir: String, bucket: Column, withVolume: Boolean): DataFrame = {
    val base = T(s, dir).lineitem
      .groupBy(bucket.as("symbol"), to_date(col("l_shipdate")).as("date"))
    val agged =
      if (withVolume)
        base.agg(QueryDef.r4(max_by(col("l_extendedprice"), mdKey)).as("close"),
          sum(col("l_quantity").cast(DecimalType(18, 0))).cast("long").as("volume"))
      else base.agg(QueryDef.r4(max_by(col("l_extendedprice"), mdKey)).as("close"))
    agged.withColumn("adj_close", col("close") * 0.5).drop("close")
  }

  private def adjStagingSql(bucketSql: String, withVolume: Boolean): String = {
    val volAgg = if (withVolume) ", CAST(SUM(CAST(l_quantity AS DECIMAL(18,0))) AS BIGINT) AS volume" else ""
    val volSel = if (withVolume) ", volume" else ""
    s"""(
      SELECT symbol, date, close * 0.5 AS adj_close$volSel FROM (
        SELECT $bucketSql AS symbol, CAST(l_shipdate AS DATE) AS date,
          ROUND(MAX_BY(l_extendedprice, $mdKeySql), 4) + 0.0 AS close$volAgg
        FROM lineitem GROUP BY 1, 2
      )
    )"""
  }

  // ------------------------------------------------------------------
  // market_breadth_signals
  // ------------------------------------------------------------------

  private def marketBreadthSignals(s: SparkSession, dir: String): DataFrame = {
    val stocks = adjStaging(s, dir, concat(lit("SP_"), col("l_suppkey") % 100), withVolume = true)
    val anchor = stocks.agg(max(col("date")).as("today"))

    val wSym = Window.partitionBy(col("symbol")).orderBy(col("date"))
    def tw(n: Int) = wSym.rowsBetween(-(n - 1), 0)
    def exAvg(c: Column, n: Int): Column =
      sum(c.cast(DecimalType(18, 6))).over(tw(n)).cast("double") / count(c).over(tw(n))

    val sig = stocks
      .crossJoin(broadcast(anchor))
      .filter(col("adj_close").isNotNull && col("adj_close") > 0 &&
        col("date") >= add_months(col("today"), -36))
      .withColumn("sma_50", exAvg(col("adj_close"), 50))
      .withColumn("sma_200", exAvg(col("adj_close"), 200))
      .withColumn("prev_price", lag(col("adj_close"), 1).over(wSym))
      .withColumn("n200", count(lit(1)).over(tw(200)))
      .select(col("symbol"), col("date"), col("adj_close"), col("volume"),
        col("today"),
        when(col("n200") >= 200 && col("adj_close") > col("sma_200"), 1).otherwise(0).as("above_200_ma"),
        when(col("n200") >= 50 && col("adj_close") > col("sma_50"), 1).otherwise(0).as("above_50_ma"),
        when(col("prev_price").isNotNull && col("adj_close") > col("prev_price"), 1).otherwise(0).as("is_advancing"),
        when(col("prev_price").isNotNull && col("adj_close") < col("prev_price"), 1).otherwise(0).as("is_declining"),
        when(col("prev_price").isNotNull && col("adj_close") === col("prev_price"), 1).otherwise(0).as("is_unchanged"),
        when(col("prev_price").isNotNull && col("adj_close") > col("prev_price"), col("volume")).otherwise(0L).as("adv_vol"),
        when(col("prev_price").isNotNull && col("adj_close") < col("prev_price"), col("volume")).otherwise(0L).as("dec_vol"))

    val daily = sig
      .filter(col("date") >= add_months(col("today"), -24))
      .groupBy(col("date"))
      .agg(
        countDistinct(col("symbol")).as("total_stocks"),
        sum(col("above_200_ma")).cast("long").as("stocks_above_200_ma"),
        sum(col("above_50_ma")).cast("long").as("stocks_above_50_ma"),
        sum(col("is_advancing")).cast("long").as("advancing_stocks"),
        sum(col("is_declining")).cast("long").as("declining_stocks"),
        sum(col("is_unchanged")).cast("long").as("unchanged_stocks"),
        sum(col("adv_vol")).cast("long").as("total_advancing_volume"),
        sum(col("dec_vol")).cast("long").as("total_declining_volume"))
      .filter(col("total_stocks") >= 20)
      .withColumn("pct_above_200_ma",
        when(col("total_stocks") =!= 0,
          rdiv((col("stocks_above_200_ma") * 100).cast(DecimalType(18, 0)), col("total_stocks"), 2)))
      .withColumn("pct_above_50_ma",
        when(col("total_stocks") =!= 0,
          rdiv((col("stocks_above_50_ma") * 100).cast(DecimalType(18, 0)), col("total_stocks"), 2)))
      .withColumn("ad_ratio",
        when(col("declining_stocks") =!= 0,
          rdiv(col("advancing_stocks").cast(DecimalType(18, 0)), col("declining_stocks"), 3)))
      .withColumn("ad_line_delta", col("advancing_stocks") - col("declining_stocks"))

    val ad = col("advancing_stocks") + col("declining_stocks")
    val base = daily
      .withColumn("net_advances", col("advancing_stocks") - col("declining_stocks"))
      .withColumn("rana",
        coalesce(when(ad =!= 0,
          rdiv((col("net_advances") * 1000).cast(DecimalType(18, 0)), ad, 2)), lit(0.0)))
      .withColumn("adv_ratio",
        coalesce(when(ad =!= 0,
          rdiv(col("advancing_stocks").cast(DecimalType(18, 0)), ad, 6)), lit(0.5)))

    val wd  = Window.orderBy(col("date"))
    def dw(n: Int) = wd.rowsBetween(-(n - 1), 0)
    def dAvg(c: Column, n: Int, outScale: Int): Column =
      rdiv(sum(c.cast(DecimalType(18, 6))).over(dw(n)), count(c).over(dw(n)), outScale)
    val cum = base
      .withColumn("ad_line_cumulative", sum(col("ad_line_delta")).over(wd.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("pct_above_200_ma_10d_avg", dAvg(col("pct_above_200_ma"), 10, 2))
      .withColumn("ad_ratio_5d_avg", dAvg(col("ad_ratio"), 5, 3))
      .withColumn("prev_pct_above_200_ma", lag(col("pct_above_200_ma"), 1).over(wd))
      .withColumn("prev_pct_above_50_ma", lag(col("pct_above_50_ma"), 1).over(wd))
      .withColumn("breadth_5d_change", round(col("pct_above_200_ma") - lag(col("pct_above_200_ma"), 5).over(wd), 2))
      .withColumn("breadth_20d_change", round(col("pct_above_200_ma") - lag(col("pct_above_200_ma"), 20).over(wd), 2))
      .withColumn("pct_advancing",
        when(ad =!= 0, rdiv((col("advancing_stocks") * 100).cast(DecimalType(18, 0)), ad, 2)))
      .withColumn("rn", epochDay(col("date")).cast("long"))
      .withColumn("k", lit("mkt"))

    val e1 = TimeSeriesOps.recursiveEmaCoef(cum, "k", "rn", "rana", 0.1, 0.9, "ema_rana_19")
    val e2 = TimeSeriesOps.recursiveEmaCoef(e1, "k", "rn", "rana", 0.05, 0.95, "ema_rana_39")
    val e3 = TimeSeriesOps.recursiveEmaCoef(e2, "k", "rn", "adv_ratio",
      0.1818181818, 0.8181818182, "ema_adv_10")
    val mc = e3
      .withColumn("mcclellan_oscillator", col("ema_rana_19") - col("ema_rana_39"))
      .withColumn("mcclellan_summation_index",
        sum(col("mcclellan_oscillator")).over(wd.rowsBetween(Window.unboundedPreceding, 0)) + 1000)
      .withColumn("zweig_thrust_signal",
        when(col("ema_adv_10") >= 0.615 && min(col("ema_adv_10")).over(dw(10)) < 0.40, 1)
          .otherwise(0).cast("long"))

    // SPY branch (major indices with real index names)
    val idx = adjStaging(s, dir,
      when(col("l_linestatus") === "O", "SPY").otherwise("QQQ"), withVolume = false)
    val wSpy = Window.orderBy(col("date"))
    val spy = idx.filter(col("symbol") === "SPY" && col("adj_close").isNotNull)
      .crossJoin(broadcast(anchor))
      .filter(col("date") >= add_months(col("today"), -36))
      .withColumn("spy_high_252d", max(col("adj_close")).over(wSpy.rowsBetween(-251, 0)))
      .select(col("date").as("s_date"), col("adj_close").as("spy_close"), col("spy_high_252d"))

    // sector participation (11-sector analog: the 3-symbol SECT universe)
    val sect = adjStaging(s, dir, concat(lit("SECT_"), col("l_returnflag")), withVolume = false)
      .crossJoin(broadcast(anchor))
      .filter(col("adj_close").isNotNull && col("date") >= add_months(col("today"), -36))
    val sectSma = sect
      .withColumn("sma_200", exAvg(col("adj_close"), 200))
      .withColumn("n200", count(lit(1)).over(tw(200)))
    val participation = sectSma
      .groupBy(col("date").as("p_date"))
      .agg(
        sum(when(col("n200") >= 200 && col("adj_close") > col("sma_200"), 1).otherwise(0))
          .cast("long").as("sector_participation_count"),
        countDistinct(col("symbol")).as("sector_total"))

    // internals: sectors + SPY/QQQ pair correlations and dispersion
    val internals = sect.select(col("symbol"), col("date"), col("adj_close"))
      .unionByName(idx.filter(col("symbol").isin("SPY", "QQQ"))
        .crossJoin(broadcast(anchor))
        .filter(col("adj_close").isNotNull && col("date") >= add_months(col("today"), -36))
        .select(col("symbol"), col("date"), col("adj_close")))
      .withColumn("daily_return",
        col("adj_close") / when(lag(col("adj_close"), 1).over(wSym) =!= 0,
          lag(col("adj_close"), 1).over(wSym)) - 1.0)
    val rets = internals.filter(col("daily_return").isNotNull)
      .select(col("symbol"), col("date"), col("daily_return"))
    val dispersion = rets.groupBy(col("date").as("d_date"))
      .agg(stddev_samp(col("daily_return")).as("return_dispersion"))
      .withColumn("return_dispersion_20d_avg",
        avg(col("return_dispersion")).over(Window.orderBy(col("d_date")).rowsBetween(-19, 0)))
    val syms = rets.select(col("symbol")).distinct()
    val pairs = syms.select(col("symbol").as("symbol_a"))
      .join(syms.select(col("symbol").as("symbol_b")), col("symbol_a") < col("symbol_b"))
    val pairRets = broadcast(pairs)
      .join(rets.select(col("symbol").as("ra_sym"), col("date").as("pr_date"),
        col("daily_return").as("return_a")), col("symbol_a") === col("ra_sym"))
      .join(rets.select(col("symbol").as("rb_sym"), col("date").as("rb_date"),
        col("daily_return").as("return_b")),
        col("symbol_b") === col("rb_sym") && col("pr_date") === col("rb_date"))
    val wPair = Window.partitionBy(col("symbol_a"), col("symbol_b"))
      .orderBy(col("pr_date")).rowsBetween(-62, 0)
    val pairCorr = pairRets
      .withColumn("pair_corr_63d", corr(col("return_a"), col("return_b")).over(wPair))
      .groupBy(col("pr_date").as("c_date"))
      .agg(avg(col("pair_corr_63d")).as("avg_pair_correlation_63d"))

    mc
      .join(spy, col("date") === col("s_date"), "left")
      .join(participation, col("date") === col("p_date"), "left")
      .join(pairCorr, col("date") === col("c_date"), "left")
      .join(dispersion, col("date") === col("d_date"), "left")
      .select(
        col("date"), col("total_stocks"), col("stocks_above_200_ma"), col("stocks_above_50_ma"),
        col("advancing_stocks"), col("declining_stocks"), col("unchanged_stocks"),
        col("pct_above_200_ma"), col("pct_above_50_ma"), col("ad_ratio"), col("ad_line_delta"),
        col("ad_line_cumulative"),
        col("prev_pct_above_200_ma"), col("prev_pct_above_50_ma"), col("pct_advancing"),
        col("total_advancing_volume"), col("total_declining_volume"),
        col("pct_above_200_ma_10d_avg"), col("ad_ratio_5d_avg"),
        col("breadth_5d_change"), col("breadth_20d_change"),
        when(col("total_declining_volume") =!= 0,
          rdiv(col("total_advancing_volume").cast(DecimalType(18, 0)), col("total_declining_volume"), 3))
          .as("volume_ad_ratio"),
        col("net_advances"), col("rana").as("ratio_adjusted_net_advances"),
        round(col("ema_rana_19"), 2).as("rana_ema_19"),
        round(col("ema_rana_39"), 2).as("rana_ema_39"),
        round(col("mcclellan_oscillator"), 2).as("mcclellan_oscillator"),
        round(col("mcclellan_summation_index"), 2).as("mcclellan_summation_index"),
        round(col("ema_adv_10"), 4).as("zweig_ema_10d"),
        col("zweig_thrust_signal"),
        col("spy_close"), col("spy_high_252d"),
        when(col("spy_close") >= col("spy_high_252d"), 1).otherwise(0).cast("long").as("spy_new_high"),
        when(col("spy_close") >= col("spy_high_252d") &&
          col("breadth_20d_change").isNotNull && col("breadth_20d_change") < -5, 1)
          .otherwise(0).cast("long").as("breadth_divergence_signal"),
        col("sector_participation_count"), col("sector_total"),
        when(col("sector_total") =!= 0,
          rdiv((col("sector_participation_count") * 100).cast(DecimalType(18, 0)), col("sector_total"), 2))
          .as("sector_participation_pct"),
        round(col("avg_pair_correlation_63d"), 4).as("avg_pair_correlation_63d"),
        round(col("return_dispersion"), 4).as("return_dispersion"),
        round(col("return_dispersion_20d_avg"), 4).as("return_dispersion_20d_avg"))
  }

  private val marketBreadthSignalsSql: String = {
    val stocksCte  = adjStagingSql("'SP_' || CAST(l_suppkey % 100 AS VARCHAR)", withVolume = true)
    val idxCte     = adjStagingSql("CASE WHEN l_linestatus = 'O' THEN 'SPY' ELSE 'QQQ' END", withVolume = false)
    val sectCte    = adjStagingSql("'SECT_' || l_returnflag", withVolume = false)
    def oAvgW(c: String, win: String, outScale: Int) = oDivRound(
      s"CAST(SUM(CAST($c AS DECIMAL(18,6))) OVER $win * 1000000 AS HUGEINT)",
      s"COUNT($c) OVER $win", outScale)
    def oRatio(num: String, den: String, n: Int) =
      s"CASE WHEN $den != 0 THEN ${oDivRound(s"CAST($num AS HUGEINT) * 1000000", den, n)} END"
    s"""
    WITH RECURSIVE stocks AS (SELECT * FROM $stocksCte),
    anchor AS (SELECT MAX(date) AS today FROM stocks),
    sig AS (
      SELECT symbol, date, price, volume, today,
        CASE WHEN n200 >= 200 AND price > sma_200 THEN 1 ELSE 0 END AS above_200_ma,
        CASE WHEN n200 >= 50 AND price > sma_50 THEN 1 ELSE 0 END AS above_50_ma,
        CASE WHEN prev_price IS NOT NULL AND price > prev_price THEN 1 ELSE 0 END AS is_advancing,
        CASE WHEN prev_price IS NOT NULL AND price < prev_price THEN 1 ELSE 0 END AS is_declining,
        CASE WHEN prev_price IS NOT NULL AND price = prev_price THEN 1 ELSE 0 END AS is_unchanged,
        CASE WHEN prev_price IS NOT NULL AND price > prev_price THEN volume ELSE 0 END AS adv_vol,
        CASE WHEN prev_price IS NOT NULL AND price < prev_price THEN volume ELSE 0 END AS dec_vol
      FROM (
        SELECT s.symbol, s.date, s.adj_close AS price, s.volume, a.today,
          CAST(SUM(CAST(s.adj_close AS DECIMAL(18,6))) OVER w50 AS DOUBLE) / COUNT(s.adj_close) OVER w50 AS sma_50,
          CAST(SUM(CAST(s.adj_close AS DECIMAL(18,6))) OVER w200 AS DOUBLE) / COUNT(s.adj_close) OVER w200 AS sma_200,
          LAG(s.adj_close, 1) OVER wsym AS prev_price,
          COUNT(*) OVER w200 AS n200
        FROM stocks s, anchor a
        WHERE s.adj_close IS NOT NULL AND s.adj_close > 0
          AND s.date >= CAST(a.today - INTERVAL 36 MONTH AS DATE)
        WINDOW wsym AS (PARTITION BY s.symbol ORDER BY s.date),
          w50 AS (PARTITION BY s.symbol ORDER BY s.date ROWS BETWEEN 49 PRECEDING AND CURRENT ROW),
          w200 AS (PARTITION BY s.symbol ORDER BY s.date ROWS BETWEEN 199 PRECEDING AND CURRENT ROW)
      )
    ),
    daily AS (
      SELECT * FROM (
        SELECT date,
          CAST(COUNT(DISTINCT symbol) AS BIGINT) AS total_stocks,
          CAST(SUM(above_200_ma) AS BIGINT) AS stocks_above_200_ma,
          CAST(SUM(above_50_ma) AS BIGINT) AS stocks_above_50_ma,
          CAST(SUM(is_advancing) AS BIGINT) AS advancing_stocks,
          CAST(SUM(is_declining) AS BIGINT) AS declining_stocks,
          CAST(SUM(is_unchanged) AS BIGINT) AS unchanged_stocks,
          CAST(SUM(adv_vol) AS BIGINT) AS total_advancing_volume,
          CAST(SUM(dec_vol) AS BIGINT) AS total_declining_volume
        FROM sig WHERE date >= CAST(today - INTERVAL 24 MONTH AS DATE)
        GROUP BY date
      ) WHERE total_stocks >= 20
    ),
    breadth_base AS (
      SELECT *,
        ${oRatio("stocks_above_200_ma * 100", "total_stocks", 2)} AS pct_above_200_ma,
        ${oRatio("stocks_above_50_ma * 100", "total_stocks", 2)} AS pct_above_50_ma,
        ${oRatio("advancing_stocks", "declining_stocks", 3)} AS ad_ratio,
        advancing_stocks - declining_stocks AS ad_line_delta,
        advancing_stocks - declining_stocks AS net_advances,
        COALESCE(CASE WHEN advancing_stocks + declining_stocks != 0 THEN
          ${oDivRound("CAST((advancing_stocks - declining_stocks) * 1000 AS HUGEINT) * 1000000",
    "advancing_stocks + declining_stocks", 2)} END, 0.0) AS rana,
        COALESCE(CASE WHEN advancing_stocks + declining_stocks != 0 THEN
          ${oDivRound("advancing_stocks * 1000000", "advancing_stocks + declining_stocks", 6)}
          END, 0.5) AS adv_ratio
      FROM daily
    ),
    cumulative AS (
      SELECT *,
        SUM(ad_line_delta) OVER wcum AS ad_line_cumulative,
        ${oAvgW("pct_above_200_ma", "w10", 2)} AS pct_above_200_ma_10d_avg,
        ${oAvgW("ad_ratio", "w5", 3)} AS ad_ratio_5d_avg,
        LAG(pct_above_200_ma, 1) OVER wd AS prev_pct_above_200_ma,
        LAG(pct_above_50_ma, 1) OVER wd AS prev_pct_above_50_ma,
        ROUND(pct_above_200_ma - LAG(pct_above_200_ma, 5) OVER wd, 2) + 0.0 AS breadth_5d_change,
        ROUND(pct_above_200_ma - LAG(pct_above_200_ma, 20) OVER wd, 2) + 0.0 AS breadth_20d_change,
        ${oRatio("advancing_stocks * 100", "advancing_stocks + declining_stocks", 2)} AS pct_advancing
      FROM breadth_base
      WINDOW wd AS (ORDER BY date),
        wcum AS (ORDER BY date ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        w10 AS (ORDER BY date ROWS BETWEEN 9 PRECEDING AND CURRENT ROW),
        w5 AS (ORDER BY date ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
    ),
    ema_inputs AS (SELECT ROW_NUMBER() OVER (ORDER BY date) AS rn, * FROM cumulative),
    ema_calc AS (
      SELECT rn, date, rana AS i_rana, adv_ratio AS i_adv,
        rana AS ema_rana_19, rana AS ema_rana_39, adv_ratio AS ema_adv_10
      FROM ema_inputs WHERE rn = 1
      UNION ALL
      SELECT i.rn, i.date, i.rana, i.adv_ratio,
        (0.1 * i.rana) + (0.9 * e.ema_rana_19),
        (0.05 * i.rana) + (0.95 * e.ema_rana_39),
        (0.1818181818 * i.adv_ratio) + (0.8181818182 * e.ema_adv_10)
      FROM ema_inputs i INNER JOIN ema_calc e ON i.rn = e.rn + 1
    ),
    with_ema AS (
      SELECT c.*, e.ema_rana_19, e.ema_rana_39, e.ema_adv_10,
        e.ema_rana_19 - e.ema_rana_39 AS mcclellan_oscillator
      FROM cumulative c INNER JOIN ema_calc e ON c.date = e.date
    ),
    with_mcclellan AS (
      SELECT *,
        SUM(mcclellan_oscillator) OVER (ORDER BY date ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) + 1000
          AS mcclellan_summation_index,
        CASE WHEN ema_adv_10 >= 0.615
              AND MIN(ema_adv_10) OVER (ORDER BY date ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) < 0.40
          THEN 1 ELSE 0 END AS zweig_thrust_signal
      FROM with_ema
    ),
    idx AS (SELECT * FROM $idxCte),
    spy AS (
      SELECT date AS s_date, adj_close AS spy_close,
        MAX(adj_close) OVER (ORDER BY date ROWS BETWEEN 251 PRECEDING AND CURRENT ROW) AS spy_high_252d
      FROM idx, anchor
      WHERE symbol = 'SPY' AND adj_close IS NOT NULL
        AND date >= CAST(today - INTERVAL 36 MONTH AS DATE)
    ),
    sect AS (
      SELECT c.symbol, c.date, c.adj_close
      FROM $sectCte c, anchor a
      WHERE c.adj_close IS NOT NULL AND c.date >= CAST(a.today - INTERVAL 36 MONTH AS DATE)
    ),
    participation AS (
      SELECT date AS p_date,
        CAST(SUM(CASE WHEN n200 >= 200 AND adj_close > sma_200 THEN 1 ELSE 0 END) AS BIGINT)
          AS sector_participation_count,
        CAST(COUNT(DISTINCT symbol) AS BIGINT) AS sector_total
      FROM (
        SELECT *,
          CAST(SUM(CAST(adj_close AS DECIMAL(18,6))) OVER w200 AS DOUBLE) / COUNT(adj_close) OVER w200 AS sma_200,
          COUNT(*) OVER w200 AS n200
        FROM sect
        WINDOW w200 AS (PARTITION BY symbol ORDER BY date ROWS BETWEEN 199 PRECEDING AND CURRENT ROW)
      )
      GROUP BY date
    ),
    internals AS (
      SELECT symbol, date,
        adj_close / NULLIF(LAG(adj_close, 1) OVER (PARTITION BY symbol ORDER BY date), 0) - 1.0
          AS daily_return
      FROM (
        SELECT symbol, date, adj_close FROM sect
        UNION ALL
        SELECT i.symbol, i.date, i.adj_close
        FROM idx i, anchor a
        WHERE i.symbol IN ('SPY', 'QQQ') AND i.adj_close IS NOT NULL
          AND i.date >= CAST(a.today - INTERVAL 36 MONTH AS DATE)
      )
    ),
    rets AS (SELECT * FROM internals WHERE daily_return IS NOT NULL),
    dispersion AS (
      SELECT d_date, return_dispersion,
        AVG(return_dispersion) OVER (ORDER BY d_date ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
          AS return_dispersion_20d_avg
      FROM (
        SELECT date AS d_date, STDDEV_SAMP(daily_return) AS return_dispersion
        FROM rets GROUP BY date
      )
    ),
    pair_corr AS (
      SELECT pr_date, symbol_a, symbol_b,
        CORR(return_a, return_b) OVER (PARTITION BY symbol_a, symbol_b ORDER BY pr_date
          ROWS BETWEEN 62 PRECEDING AND CURRENT ROW) AS pair_corr_63d
      FROM (
        SELECT r1.date AS pr_date, p.symbol_a, p.symbol_b,
          r1.daily_return AS return_a, r2.daily_return AS return_b
        FROM (
          SELECT a.symbol AS symbol_a, b.symbol AS symbol_b
          FROM (SELECT DISTINCT symbol FROM rets) a
          JOIN (SELECT DISTINCT symbol FROM rets) b ON a.symbol < b.symbol
        ) p
        JOIN rets r1 ON p.symbol_a = r1.symbol
        JOIN rets r2 ON p.symbol_b = r2.symbol AND r1.date = r2.date
      )
    ),
    pair_avg AS (
      SELECT pr_date AS c_date, AVG(pair_corr_63d) AS avg_pair_correlation_63d
      FROM pair_corr GROUP BY 1
    )
    SELECT b.date, b.total_stocks, b.stocks_above_200_ma, b.stocks_above_50_ma,
      b.advancing_stocks, b.declining_stocks, b.unchanged_stocks,
      b.pct_above_200_ma, b.pct_above_50_ma, b.ad_ratio, b.ad_line_delta,
      b.ad_line_cumulative,
      b.prev_pct_above_200_ma, b.prev_pct_above_50_ma, b.pct_advancing,
      b.total_advancing_volume, b.total_declining_volume,
      b.pct_above_200_ma_10d_avg, b.ad_ratio_5d_avg,
      b.breadth_5d_change, b.breadth_20d_change,
      ${oRatio("b.total_advancing_volume", "b.total_declining_volume", 3)} AS volume_ad_ratio,
      b.net_advances, b.rana AS ratio_adjusted_net_advances,
      ROUND(b.ema_rana_19, 2) + 0.0 AS rana_ema_19,
      ROUND(b.ema_rana_39, 2) + 0.0 AS rana_ema_39,
      ROUND(b.mcclellan_oscillator, 2) + 0.0 AS mcclellan_oscillator,
      ROUND(b.mcclellan_summation_index, 2) + 0.0 AS mcclellan_summation_index,
      ROUND(b.ema_adv_10, 4) + 0.0 AS zweig_ema_10d,
      CAST(b.zweig_thrust_signal AS BIGINT) AS zweig_thrust_signal,
      s.spy_close, s.spy_high_252d,
      CAST(CASE WHEN s.spy_close >= s.spy_high_252d THEN 1 ELSE 0 END AS BIGINT) AS spy_new_high,
      CAST(CASE WHEN s.spy_close >= s.spy_high_252d AND b.breadth_20d_change IS NOT NULL
                 AND b.breadth_20d_change < -5 THEN 1 ELSE 0 END AS BIGINT) AS breadth_divergence_signal,
      sp.sector_participation_count, sp.sector_total,
      ${oRatio("sp.sector_participation_count * 100", "sp.sector_total", 2)} AS sector_participation_pct,
      ROUND(ic.avg_pair_correlation_63d, 4) + 0.0 AS avg_pair_correlation_63d,
      ROUND(d.return_dispersion, 4) + 0.0 AS return_dispersion,
      ROUND(d.return_dispersion_20d_avg, 4) + 0.0 AS return_dispersion_20d_avg
    FROM with_mcclellan b
    LEFT JOIN spy s ON b.date = s.s_date
    LEFT JOIN participation sp ON b.date = sp.p_date
    LEFT JOIN pair_avg ic ON b.date = ic.c_date
    LEFT JOIN dispersion d ON b.date = d.d_date
  """
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q_market_breadth_signals", marketBreadthSignals, Some(marketBreadthSignalsSql))
  )
}

package graft.models

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.GraftFunctions.epochDay
import graft.queries.QueryDef.{oSnap, rsnap}

/** 1:1 replication of `calculate_market_analysis_return` (dbt_project/
  * macros/calculate_market_analysis_return.sql) — the template behind
  * the twelve `*_analysis_return` named models. Per (symbol, exchange,
  * date): for each horizon {1mo=30, 3mo=90, 6mo=180, 9mo=270,
  * 1yr=365} calendar days — RANGE-window rolling max high / min low /
  * stddev of the daily adj-close diff, the EXACT-calendar-offset
  * lookback price (NULL when that date is missing — reference
  * semantics, not as-of), and the pct change vs that price.
  *
  * Parity: stddev comes from DECIMAL(18,3)-exact windowed moments
  * (daily diffs are exact 3-decimal values at the universe's price
  * scale, so the snap is lossless and squares stay inside DuckDB's
  * width-18 multiply); high/low round-4 snaps through DECIMAL
  * ([[rsnap]]); pct changes are ratios of near-arbitrary doubles —
  * plain round on both sides. One window family per horizon set (all
  * frames share (symbol, exchange) ORDER BY day-number).
  *
  * Scale plan: the five calendar lookbacks are NOT joins at all —
  * `daily` is unique per (symbol, exchange, date) (it comes off a
  * groupBy at exactly that grain), so "the price exactly d days ago,
  * NULL if no bar" is a single-point RANGE frame
  * `rangeBetween(-d, -d)` over the same (symbol, exchange) ORDER BY
  * day-number spec the rolling stats already use. All lookbacks and
  * rolling frames collapse into one WindowExec over one sort: no
  * explode, no landings aggregate, no self-join, no persist — the
  * fact-table aggregation streams through a single window pass.
  * (Earlier rounds used explode→pivot→equi-join; the window form is
  * bit-identical under the unique-grain invariant, which
  * q_test_upstream_market_grain_duplicates gates.)
  */
object MarketAnalysisReturn {

  val Horizons: Seq[(Int, String)] =
    Seq(365 -> "1yr", 270 -> "9mo", 180 -> "6mo", 90 -> "3mo", 30 -> "1mo")

  /** `uni` columns: symbol, exchange, date, close, high, low, volume,
    * adj_close, adj_high, adj_low, adj_volume. Single consuming pass —
    * nothing persisted here.
    */
  def analysisReturn(uni: DataFrame): DataFrame = {
    // Every window in this model orders by ONE materialized day-ordinal
    // COLUMN (not a per-batch epochDay(...) expression): the lag pass
    // and the range pass are sequential window batches, and when each
    // batch extracts its own `_wN` ordering alias EnsureRequirements
    // cannot see they are the same order — the second batch paid a
    // full re-sort of the frame (observed in the r10 before-plan:
    // Sort(11)[symbol,_w0] then Sort(15)[symbol,_w1] over identical
    // data). Ordering both batches by the same attribute eliminates
    // the second sort; epochDay is monotone in date, so lag results
    // are unchanged. __mar_day is dropped by the final select.
    val wLag = Window.partitionBy(col("symbol"), col("exchange"))
      .orderBy(col("__mar_day"))
    val daily = uni
      .filter(col("adj_close").isNotNull)
      .withColumn("__mar_day", epochDay(col("date")))
      .withColumn("daily_diff", col("adj_close") - lag(col("adj_close"), 1).over(wLag))
    def w(days: Int) = Window
      .partitionBy(col("symbol"), col("exchange"))
      .orderBy(col("__mar_day"))
      .rangeBetween(-days, 0)
    // the bar exactly `days` calendar days back — grain is unique per
    // (symbol, exchange, date), so the single-point frame holds at
    // most one row and max() is "that bar's price, or NULL"
    def at(days: Int) = Window
      .partitionBy(col("symbol"), col("exchange"))
      .orderBy(col("__mar_day"))
      .rangeBetween(-days, -days)
    val dec5 = col("daily_diff").cast(DecimalType(18, 3))
    val horizonCols = Horizons.flatMap { case (d, tag) =>
      val n   = count(col("daily_diff")).over(w(d))
      val sx  = sum(dec5).over(w(d)).cast("double")
      val sx2 = sum(dec5 * dec5).over(w(d)).cast("double")
      val std = when(n > 1,
        sqrt(greatest((sx2 - sx * sx / n) / (n - 1), lit(0.0))))
      val p   = max(col("adj_close")).over(at(d))
      Seq(
        rsnap(max(col("adj_high")).over(w(d)), 4).as(s"high_$tag"),
        rsnap(min(col("adj_low")).over(w(d)), 4).as(s"low_$tag"),
        round(std, 4).as(s"std_diff_$tag"),
        round(when(p.isNotNull && p > 0, (col("adj_close") - p) / p * 100), 2)
          .as(s"pct_change_$tag"))
    }
    daily.select(
      (Seq(col("symbol"), col("exchange"), col("date"),
        col("adj_close").as("current_price"),
        col("adj_high").as("current_high"),
        col("adj_low").as("current_low"),
        col("volume").as("current_volume")) ++ horizonCols): _*)
  }

  /** DuckDB oracle; `uniCte` must define `uni`. */
  def oracleSql(uniCte: String): String = {
    val lookbackJoins = Horizons.map(_._1).map { d =>
      s"""LEFT JOIN daily p$d ON dc.symbol = p$d.symbol AND dc.exchange = p$d.exchange
          AND p$d.date + $d = dc.date"""
    }.mkString("\n        ")
    val horizonSelects = Horizons.map { case (d, tag) =>
      s"""${oSnap(s"MAX(adj_high) OVER w$d", 4)} AS high_$tag,
        ${oSnap(s"MIN(adj_low) OVER w$d", 4)} AS low_$tag,
        ROUND(CASE WHEN COUNT(daily_diff) OVER w$d > 1 THEN
          SQRT(GREATEST((CAST(SUM(CAST(daily_diff AS DECIMAL(18,3)) * CAST(daily_diff AS DECIMAL(18,3))) OVER w$d AS DOUBLE)
            - CAST(SUM(CAST(daily_diff AS DECIMAL(18,3))) OVER w$d AS DOUBLE)
              * CAST(SUM(CAST(daily_diff AS DECIMAL(18,3))) OVER w$d AS DOUBLE)
              / (COUNT(daily_diff) OVER w$d))
            / (COUNT(daily_diff) OVER w$d - 1), 0.0)) END, 4) + 0.0 AS std_diff_$tag,
        ROUND(CASE WHEN price_${d}d_ago IS NOT NULL AND price_${d}d_ago > 0
          THEN (adj_close - price_${d}d_ago) / price_${d}d_ago * 100 END, 2) + 0.0 AS pct_change_$tag"""
    }.mkString(",\n        ")
    val windowDefs = Horizons.map(_._1).map { d =>
      s"""w$d AS (PARTITION BY symbol, exchange ORDER BY (date - DATE '1970-01-01')
          RANGE BETWEEN $d PRECEDING AND CURRENT ROW)"""
    }.mkString(",\n        ")
    s"""
    WITH $uniCte,
    daily AS (
      SELECT *, adj_close - LAG(adj_close, 1) OVER (
        PARTITION BY symbol, exchange ORDER BY date) AS daily_diff
      FROM uni WHERE adj_close IS NOT NULL
    ),
    lb AS (
      SELECT dc.*,
        ${Horizons.map(_._1).map(d => s"p$d.adj_close AS price_${d}d_ago").mkString(", ")}
      FROM daily dc
        $lookbackJoins
    )
    SELECT symbol, exchange, date,
      adj_close AS current_price, adj_high AS current_high,
      adj_low AS current_low, volume AS current_volume,
        $horizonSelects
    FROM lb
    WINDOW $windowDefs
  """
  }
}

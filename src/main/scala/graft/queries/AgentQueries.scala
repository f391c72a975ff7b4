package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.models.MarketSummary
import org.apache.spark.sql.DataFrame
import graft.queries.QueryDef.{oDivRound, rdiv}

/** Agent-facing projections (refs dbt_project/models/agents_preprocess/
  * agent_market_performance.sql and agent_technical_signal_history
  * .sql):
  *
  *  - agent_market_performance: the sector + major-index summary
  *    models unioned behind the agent contract (ticker/
  *    annualized_volatility/worst-best pct aliases, market_category
  *    tag, null snapshot_date).
  *  - agent_technical_signal_history: signal-reliability rollup of
  *    technical_signal_instances at two grains (universe_signal and
  *    universe_symbol_signal) — trigger counts and date range,
  *    evaluable counts, benchmark-relative hit rates at 5/21/63 bars,
  *    average forward/relative returns and excursions, and the
  *    volume-confirmed hit rate.
  */
object AgentQueries {

  // ------------------------------------------------------------------
  // agent_market_performance (ref, 67 LoC)
  // ------------------------------------------------------------------

  private def marketPerformance(s: SparkSession, dir: String): DataFrame = {
    def branch(bucket: Column, at: String, ex: String, cat: String): DataFrame =
      MarketSummary.summarize(MarketSummaryQueries.universe(s, dir, bucket, at, ex))
        .select(
          col("symbol"), col("symbol").as("ticker"), col("asset_type"),
          col("time_period"), col("exchange"), col("name"),
          col("period_start_date"), col("period_end_date"), col("trading_days"),
          col("total_return_pct"), col("avg_daily_return_pct"),
          col("volatility_pct"), col("volatility_pct").as("annualized_volatility_pct"),
          col("win_rate_pct"), col("total_price_change"), col("avg_daily_price_change"),
          col("worst_day_change"), col("worst_day_change").as("worst_day_pct_change"),
          col("best_day_change"), col("best_day_change").as("best_day_pct_change"),
          col("positive_days"), col("negative_days"), col("neutral_days"),
          col("period_start_price"), col("period_end_price"),
          lit(cat).as("market_category"),
          lit(null).cast("date").as("snapshot_date"))
    branch(concat(lit("SECT_"), col("l_returnflag")), "sector_etf", "NYSEARCA", "sector")
      .unionAll(branch(concat(lit("IDX_"), col("l_linestatus")), "index", "INDEX",
        "major_index"))
  }

  private val marketPerformanceSql: String = {
    def branchSql(bucketSql: String, at: String, ex: String, cat: String): String = {
      val inner = MarketSummary.oracleSql(MarketSummaryQueries.uniCte(bucketSql, at, ex))
      s"""SELECT symbol, symbol AS ticker, asset_type, time_period, exchange, name,
        period_start_date, period_end_date, trading_days,
        total_return_pct, avg_daily_return_pct,
        volatility_pct, volatility_pct AS annualized_volatility_pct,
        win_rate_pct, total_price_change, avg_daily_price_change,
        worst_day_change, worst_day_change AS worst_day_pct_change,
        best_day_change, best_day_change AS best_day_pct_change,
        positive_days, negative_days, neutral_days,
        period_start_price, period_end_price,
        '$cat' AS market_category,
        CAST(NULL AS DATE) AS snapshot_date
      FROM ($inner)"""
    }
    s"""
    ${branchSql("'SECT_' || l_returnflag", "sector_etf", "NYSEARCA", "sector")}
    UNION ALL
    ${branchSql("'IDX_' || l_linestatus", "index", "INDEX", "major_index")}
  """
  }

  // ------------------------------------------------------------------
  // agent_technical_signal_history (ref, 56 LoC)
  // ------------------------------------------------------------------

  private def signalHistory(s: SparkSession, dir: String): DataFrame = {
    val inst = MiscModelQueries.signalInstances(s, dir)

    def branch(grain: String, symExpr: Column): DataFrame =
      inst
        .groupBy(
          (if (grain == "universe_symbol_signal") Seq(col("symbol").as("g_sym"))
           else Seq(lit("ALL").as("g_sym"))) ++
            Seq(col("indicator_name"), col("signal_name"), col("signal_side")): _*)
        .agg(
          count(lit(1)).as("total_triggers"),
          min(col("entry_date")).as("first_trigger_date"),
          max(col("entry_date")).as("last_trigger_date"),
          count(when(col("worked_21d").isNotNull, 1)).as("evaluable_21d"),
          sum(col("worked_5d")).as("w5_sum"), count(col("worked_5d")).as("w5_n"),
          sum(col("worked_21d")).as("w21_sum"), count(col("worked_21d")).as("w21_n"),
          sum(col("worked_63d")).as("w63_sum"), count(col("worked_63d")).as("w63_n"),
          sum(col("forward_return_21d").cast(DecimalType(18, 6))).as("fr21_sum"),
          count(col("forward_return_21d")).as("fr21_n"),
          sum(col("relative_forward_return_21d").cast(DecimalType(18, 6))).as("rr21_sum"),
          count(col("relative_forward_return_21d")).as("rr21_n"),
          sum(col("relative_forward_return_63d").cast(DecimalType(18, 6))).as("rr63_sum"),
          count(col("relative_forward_return_63d")).as("rr63_n"),
          sum(col("max_favorable_excursion_21d").cast(DecimalType(18, 6))).as("mfe_sum"),
          count(col("max_favorable_excursion_21d")).as("mfe_n"),
          sum(col("max_adverse_excursion_21d").cast(DecimalType(18, 6))).as("mae_sum"),
          count(col("max_adverse_excursion_21d")).as("mae_n"),
          sum(when(col("volume_confirmed"), col("worked_21d"))).as("vc_sum"),
          count(when(col("volume_confirmed"), col("worked_21d"))).as("vc_n"))
        .select(
          lit(grain).as("aggregation_grain"),
          lit("tpch").as("source_universe"),
          col("g_sym").as("symbol"),
          lit("ALL").as("exchange"),
          col("indicator_name"), col("signal_name"), col("signal_side"),
          col("total_triggers"), col("first_trigger_date"), col("last_trigger_date"),
          col("evaluable_21d"),
          when(col("w5_n") > 0, rdiv(col("w5_sum").cast(DecimalType(18, 0)), col("w5_n"), 4))
            .as("hit_rate_5d"),
          when(col("w21_n") > 0, rdiv(col("w21_sum").cast(DecimalType(18, 0)), col("w21_n"), 4))
            .as("hit_rate_21d"),
          when(col("w63_n") > 0, rdiv(col("w63_sum").cast(DecimalType(18, 0)), col("w63_n"), 4))
            .as("hit_rate_63d"),
          when(col("fr21_n") > 0, rdiv(col("fr21_sum"), col("fr21_n"), 6))
            .as("avg_forward_return_21d"),
          when(col("rr21_n") > 0, rdiv(col("rr21_sum"), col("rr21_n"), 6))
            .as("avg_relative_return_21d"),
          when(col("rr63_n") > 0, rdiv(col("rr63_sum"), col("rr63_n"), 6))
            .as("avg_relative_return_63d"),
          when(col("mfe_n") > 0, rdiv(col("mfe_sum"), col("mfe_n"), 6)).as("avg_mfe_21d"),
          when(col("mae_n") > 0, rdiv(col("mae_sum"), col("mae_n"), 6)).as("avg_mae_21d"),
          when(col("vc_n") > 0, rdiv(col("vc_sum").cast(DecimalType(18, 0)), col("vc_n"), 4))
            .as("hit_rate_21d_volume_confirmed"))

    branch("universe_signal", lit("ALL"))
      .unionAll(branch("universe_symbol_signal", col("symbol")))
  }

  private val signalHistorySql: String = {
    val instSql = MiscModelQueries.signalInstancesSqlPublic
    def branchSql(grain: String, symExpr: String, groupExtra: String): String = s"""
      SELECT '$grain' AS aggregation_grain,
        'tpch' AS source_universe,
        $symExpr AS symbol,
        'ALL' AS exchange,
        indicator_name, signal_name, signal_side,
        COUNT(*) AS total_triggers,
        MIN(entry_date) AS first_trigger_date,
        MAX(entry_date) AS last_trigger_date,
        COUNT(CASE WHEN worked_21d IS NOT NULL THEN 1 END) AS evaluable_21d,
        CASE WHEN COUNT(worked_5d) > 0 THEN
          ${oDivRound("CAST(SUM(worked_5d) AS HUGEINT) * 1000000", "COUNT(worked_5d)", 4)}
        END AS hit_rate_5d,
        CASE WHEN COUNT(worked_21d) > 0 THEN
          ${oDivRound("CAST(SUM(worked_21d) AS HUGEINT) * 1000000", "COUNT(worked_21d)", 4)}
        END AS hit_rate_21d,
        CASE WHEN COUNT(worked_63d) > 0 THEN
          ${oDivRound("CAST(SUM(worked_63d) AS HUGEINT) * 1000000", "COUNT(worked_63d)", 4)}
        END AS hit_rate_63d,
        CASE WHEN COUNT(forward_return_21d) > 0 THEN
          ${oDivRound("CAST(SUM(CAST(forward_return_21d AS DECIMAL(18,6))) * 1000000 AS HUGEINT)",
      "COUNT(forward_return_21d)", 6)}
        END AS avg_forward_return_21d,
        CASE WHEN COUNT(relative_forward_return_21d) > 0 THEN
          ${oDivRound("CAST(SUM(CAST(relative_forward_return_21d AS DECIMAL(18,6))) * 1000000 AS HUGEINT)",
      "COUNT(relative_forward_return_21d)", 6)}
        END AS avg_relative_return_21d,
        CASE WHEN COUNT(relative_forward_return_63d) > 0 THEN
          ${oDivRound("CAST(SUM(CAST(relative_forward_return_63d AS DECIMAL(18,6))) * 1000000 AS HUGEINT)",
      "COUNT(relative_forward_return_63d)", 6)}
        END AS avg_relative_return_63d,
        CASE WHEN COUNT(max_favorable_excursion_21d) > 0 THEN
          ${oDivRound("CAST(SUM(CAST(max_favorable_excursion_21d AS DECIMAL(18,6))) * 1000000 AS HUGEINT)",
      "COUNT(max_favorable_excursion_21d)", 6)}
        END AS avg_mfe_21d,
        CASE WHEN COUNT(max_adverse_excursion_21d) > 0 THEN
          ${oDivRound("CAST(SUM(CAST(max_adverse_excursion_21d AS DECIMAL(18,6))) * 1000000 AS HUGEINT)",
      "COUNT(max_adverse_excursion_21d)", 6)}
        END AS avg_mae_21d,
        CASE WHEN COUNT(CASE WHEN volume_confirmed THEN worked_21d END) > 0 THEN
          ${oDivRound("CAST(SUM(CASE WHEN volume_confirmed THEN worked_21d END) AS HUGEINT) * 1000000",
      "COUNT(CASE WHEN volume_confirmed THEN worked_21d END)", 4)}
        END AS hit_rate_21d_volume_confirmed
      FROM inst
      GROUP BY $groupExtra indicator_name, signal_name, signal_side"""
    s"""
    WITH inst AS ($instSql)
    ${branchSql("universe_signal", "'ALL'", "")}
    UNION ALL
    ${branchSql("universe_symbol_signal", "symbol", "symbol,")}
  """
  }

  // ------------------------------------------------------------------
  // agent_technical_signal_setups (ref, 35 LoC)
  // ------------------------------------------------------------------

  private def signalSetups(s: SparkSession, dir: String): DataFrame =
    TechnicalSignalQueries.currentSetups(s, dir)
      .select(
        col("symbol"), col("d").as("as_of_date"),
        col("signal_name"), col("indicator_name"), col("signal_side"),
        col("signal_state"),
        when(col("signal_state") === "setup",
          "Pre-trigger condition present; signal has not fired yet")
          .when(col("signal_state") === "triggered",
            "Signal fired on the most recent bar")
          .when(col("signal_state") === "active",
            "Signal fired recently and is still inside its holding window")
          .as("state_description"),
        col("signal_value"), col("close").as("last_close"),
        col("relative_volume"), col("volume_confirmed"),
        col("trigger_date"), col("setup_date"),
        col("bars_since_trigger"), col("max_holding_bars"))

  private val signalSetupsSql: String = s"""
    SELECT symbol, d AS as_of_date, signal_name, indicator_name, signal_side,
      signal_state,
      CASE signal_state
        WHEN 'setup' THEN 'Pre-trigger condition present; signal has not fired yet'
        WHEN 'triggered' THEN 'Signal fired on the most recent bar'
        WHEN 'active' THEN 'Signal fired recently and is still inside its holding window'
      END AS state_description,
      signal_value, close AS last_close, relative_volume, volume_confirmed,
      trigger_date, setup_date, bars_since_trigger, max_holding_bars
    FROM (${TechnicalSignalQueries.currentSetupsSql})
  """

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q_agent_market_performance", marketPerformance, Some(marketPerformanceSql)),
    QueryDef("q_agent_technical_signal_history", signalHistory, Some(signalHistorySql)),
    QueryDef("q_agent_technical_signal_setups", signalSetups, Some(signalSetupsSql))
  )
}

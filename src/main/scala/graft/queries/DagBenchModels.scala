package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.runtime.ModelRegistry
import graft.runtime.ModelRegistry.{Materialization, ModelDef}

/** The DAG-mode bench lane's model set (VERDICT r7 #1): the shared
  * mart chain behind the fleet's fan-in consumers, registered as
  * Table-tier [[ModelRegistry]] models so the bench can build the DAG
  * ONCE per session and then time the consumers at scan cost — the
  * read pattern the reference's users actually get (its marts are dbt
  * `materialized: table`/`incremental` models, ref
  * dbt_project/dbt_project.yml:30-57; the weekly data-point finder
  * reads them, never re-derives them).
  *
  * Models (all Table tier — durable parquet, downstream scans get
  * pushdown/pruning, and they survive the bench's per-measurement
  * `clearCache`, which a View-tier persist would not):
  *  - `mart_fred_monthly_calc` — the FRED monthly pct-change mart
  *    (econ input of the data-point finder);
  *  - `mart_leading_econ_return_indicator` — the correlation/quintile
  *    mart; `q_agent_leading_econ_return_indicator` is literally
  *    SELECT * of it, and the finder's correlation_anomaly detector
  *    filters it;
  *  - `stg_base_historical_thin` — the projected base-historical
  *    staging the leading-econ SNAPSHOT derives from;
  *  - `mart_market_performance` / `mart_commodity_performance` — the
  *    two performance marts the statistical_outlier detector slices.
  *
  * The consumers are the SAME query functions the isolated lane runs
  * (`DataPointQueries.interestingFrom`,
  * `AnalysisQueries2.leadingEconSnapshotFrom`), just handed
  * materialized frames — equivalence of the two modes is spec-gated
  * at sf0.001 (ModelRegistrySpecs "DAG-mode consumers").
  */
object DagBenchModels {

  private def byName(defs: Seq[QueryDef], name: String): QueryDef =
    defs.find(_.name == name).getOrElse(sys.error(s"missing base query $name"))

  val modelNames: Seq[String] = Seq(
    "mart_fred_monthly_calc",
    "mart_leading_econ_return_indicator",
    "stg_base_historical_thin",
    "mart_market_performance",
    "mart_commodity_performance",
    "int_credit_signals",
    "int_risk_confirmation_signals",
    "int_commodity_signals",
    "int_breadth_signals",
    "int_confirmation_signals",
    "mart_signal_events",
    "mart_signal_instances",
    "mart_analysis_returns_layer")

  /** The registry: five source-model marts, no inter-model deps (the
    * chains SHARE consumers, not parents), each a durable Table. */
  def registry(s: SparkSession, dir: String): ModelRegistry =
    new ModelRegistry()
      .register(ModelDef("mart_fred_monthly_calc", Nil, Materialization.Table, _ =>
        FredQueries.fredMonthlyCalc(s, dir)))
      .register(ModelDef("mart_leading_econ_return_indicator", Nil, Materialization.Table, _ =>
        byName(AnalysisQueries2.defs, "q_leading_econ_return_indicator").query(s, dir)))
      .register(ModelDef("stg_base_historical_thin", Nil, Materialization.Table, _ =>
        AnalysisQueries2.baseHistoricalThin(s, dir)))
      .register(ModelDef("mart_market_performance", Nil, Materialization.Table, _ =>
        byName(AgentQueries.defs, "q_agent_market_performance").query(s, dir)))
      .register(ModelDef("mart_commodity_performance", Nil, Materialization.Table, _ =>
        byName(CommodityQueries.defs, "q_agent_commodity_performance").query(s, dir)))
      // the five int_cross_asset branches behind the divergences
      // fan-in — dbt `materialized: table` intermediates in the
      // reference (dbt_project.yml:30-57)
      .register(ModelDef("int_credit_signals", Nil, Materialization.Table, _ =>
        CrossAssetQueries2.creditSignals(s, dir, None)))
      .register(ModelDef("int_risk_confirmation_signals", Nil, Materialization.Table, _ =>
        CrossAssetQueries.riskConfirmationSignals(s, dir, None)))
      .register(ModelDef("int_commodity_signals", Nil, Materialization.Table, _ =>
        CrossAssetQueries2.commoditySignals(s, dir, None)))
      .register(ModelDef("int_breadth_signals", Nil, Materialization.Table, _ =>
        CrossAssetQueries.breadthSignals(s, dir, None)))
      .register(ModelDef("int_confirmation_signals", Nil, Materialization.Table, _ =>
        CrossAssetQueries.confirmationSignals(s, dir, None)))
      // the TA chain (VERDICT r8 #5): signal events is the shared
      // indicator+state mart; instances is its forward-return child —
      // a real two-level DAG edge, built events-first by topo order
      .register(ModelDef("mart_signal_events", Nil, Materialization.Table, _ =>
        TechnicalSignalQueries.signalEvents(s, dir)))
      .register(ModelDef("mart_signal_instances", Seq("mart_signal_events"),
        Materialization.Table, deps =>
          MiscModelQueries.signalInstancesFrom(s, dir, deps("mart_signal_events"))))
      // the analysis-returns layer the semantic-layer views share
      .register(ModelDef("mart_analysis_returns_layer", Nil, Materialization.Table, _ =>
        SemanticLayerQueries.layerAr(s, dir)))

  /** The fan-in consumers, reading ONLY the materialized frames
    * (plus, for divergences, the tiny broadcast as-of spine derived
    * from `(s, dir)`). Names match the isolated lane's query names so
    * BENCH_FULL's dag section lines up row-for-row with the isolated
    * numbers. */
  def consumers(
      s: SparkSession,
      dir: String,
      frames: Map[String, DataFrame]): Seq[(String, () => DataFrame)] = Seq(
    "q_interesting_data_points" -> (() =>
      DataPointQueries.interestingFrom(
        frames("mart_fred_monthly_calc"),
        frames("mart_leading_econ_return_indicator"),
        frames("mart_market_performance"),
        frames("mart_commodity_performance"))),
    "q_agent_leading_econ_return_indicator" -> (() =>
      frames("mart_leading_econ_return_indicator")),
    "q_agent_leading_econ_return_indicator_snapshot" -> (() =>
      AnalysisQueries2.leadingEconSnapshotFrom(frames("stg_base_historical_thin"))),
    "q_agent_market_performance" -> (() => frames("mart_market_performance")),
    "q_agent_commodity_performance" -> (() => frames("mart_commodity_performance")),
    "q_cross_asset_divergences" -> (() =>
      CrossAssetQueries2.divergencesFrom(s, dir, None,
        frames("int_credit_signals"),
        frames("int_risk_confirmation_signals"),
        frames("int_commodity_signals"),
        frames("int_breadth_signals"),
        frames("int_confirmation_signals"))),
    // VERDICT r8 #5: the remaining expensive fan-ins now read marts.
    // Same QueryDef name as the isolated lane — the agent alias and
    // the base snapshot are one query (AnalysisQueries2.defs), so the
    // dag rows line up with both isolated board entries.
    "q_leading_econ_return_indicator_snapshot" -> (() =>
      AnalysisQueries2.leadingEconSnapshotFrom(frames("stg_base_historical_thin"))),
    "q_agent_technical_signal_history" -> (() =>
      AgentQueries.signalHistoryFrom(frames("mart_signal_instances"))),
    "q_technical_current_setups" -> (() =>
      TechnicalSignalQueries.currentSetupsFrom(s, dir, frames("mart_signal_events"))),
    "q_asset_daily_returns" -> (() =>
      SemanticLayerQueries.assetDailyReturnsFrom(frames("mart_analysis_returns_layer"))))
}

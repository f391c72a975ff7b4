package graft.queries

/** All declared engine queries. Batches are appended as operator
  * classes come online; names must stay stable across rounds (they key
  * the driver's correctness report).
  */
object Registry {
  val all: Seq[QueryDef] =
    RelationalQueries.defs ++ WindowQueries.defs ++
      TimeSeriesQueries.defs ++ TextQueries.defs ++ ModelQueries.defs ++
      SignalQueries.defs ++ TextMlQueries.defs ++ InfraQueries.defs ++
      MarketModelQueries.defs ++ BacktestQueries.defs ++ CoverageQueries.defs ++
      SignalQueries2.defs ++ SignalRegistryQueries.defs ++ FredQueries.defs ++
      CorporateActionQueries.defs ++ SentimentQueries.defs ++ SinkQueries.defs ++
      FtsQueries.defs ++ XmlQueries.defs ++ MarketSummaryQueries.defs ++
      MarketAnalysisQueries.defs ++ HousingQueries.defs ++
      FredSignalQueries.defs ++ FredSignalQueries2.defs ++
      FredSignalQueries3.defs ++ CrossAssetQueries.defs ++
      CrossAssetQueries2.defs ++ BreadthQueries.defs ++
      TechnicalSignalQueries.defs ++ AnalysisQueries.defs ++
      AnalysisQueries2.defs ++ AnalysisQueries3.defs ++
      AnalysisQueries4.defs ++ TreasuryEarningsQueries.defs ++
      MiscModelQueries.defs ++ FredSignalQueries4.defs ++ AgentQueries.defs ++ RedditQueries2.defs ++
      MarketsQueries2.defs ++ DataQualityQueries.defs ++ SnapshotQueries.defs ++
      CommodityQueries.defs ++ RedditStagingQueries.defs ++
      SemanticLayerQueries.defs ++ MarketSignalsQueries.defs ++
      StagingMarketQueries.defs ++ FomcStagingQueries.defs ++
      DataTestQueries.defs ++ DocumentExtractionQueries.defs ++
      DataDictionaryQueries.defs ++ StreamingQueries.defs ++ AlertQueries.defs ++
      CurationQueries.defs ++ SketchQueries.defs ++ OlapQueries.defs ++
      GraphQueries.defs ++ ModelDagQueries.defs ++ DataPointQueries.defs ++
      ScaleJoinQueries.defs ++ EmbeddingQueries.defs ++ BpeQueries.defs ++
      ClassifierQueries.defs ++ ImageDedupQueries.defs ++ JpegQueries.defs ++ FuzzyJoinQueries.defs ++
      EventAnalyticsQueries.defs

  lazy val byName: Map[String, QueryDef] = all.map(q => q.name -> q).toMap
}

package graft.queries

import org.apache.spark.sql.SparkSession

/** Stage decomposition for q_asset_daily_returns' ISOLATED lane
  * (VERDICT r9 #4: 12.59× on the sf1→sf10 decade in isolated mode
  * while its DAG-lane read stays flat — is the growth the four-way
  * analysis-returns re-derivation, or a window shuffle?).
  *
  * Usage: runMain graft.AdrProbe <sfDir> [shufflePartitions]
  */
object AdrProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val shuffle = if (args.length > 1) args(1) else "32"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)
    catch { case scala.util.control.NonFatal(_) => () }
    def t(label: String)(f: => Long): Unit = {
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime(); val n = f
      println(f"PROBE $label%-44s ${(System.nanoTime() - t0) / 1e9}%8.2f s rows=$n")
    }
    // warmup
    graft.SparkEntry.queries("q_join_star_region_revenue")(spark, dir).count()
    spark.catalog.clearCache()

    t("lineitem scan (baseline)")(
      spark.read.parquet(s"$dir/lineitem.parquet").count())
    t("ONE universe aggregation (SP_ slice)")(
      MarketAnalysisQueries
        .universe(spark, dir, org.apache.spark.sql.functions.concat(
          org.apache.spark.sql.functions.lit("SP_"),
          org.apache.spark.sql.functions.col("l_suppkey") % 100), "NYSE").count())
    locally {
      import org.apache.spark.sql.functions._
      val equity = Seq(
        (concat(lit("SP_"), col("l_suppkey") % 100), "NYSE"),
        (concat(lit("SECT_"), col("l_returnflag")), "NYSEARCA"),
        (concat(lit("FAC_"), col("l_suppkey") % 12), "NYSEARCA"))
        .map { case (b, ex) => MarketAnalysisQueries.universe(spark, dir, b, ex) }
      val p = col("price")
      val cmdty = CommodityQueries
        .staging(spark, dir, concat(lit("IN_"), col("l_partkey") % 6), "ton")
        .select(col("commodity_name").as("symbol"),
          col("commodity_unit").as("exchange"), col("date"),
          p.as("close"), p.as("high"), p.as("low"), p.as("volume"),
          p.as("adj_close"), p.as("adj_high"), p.as("adj_low"), p.as("adj_volume"))
      val uni = (equity :+ cmdty).map(_.select("symbol", "exchange", "date",
        "close", "high", "low", "volume",
        "adj_close", "adj_high", "adj_low", "adj_volume"))
        .reduce(_ unionByName _)
      t("  4-way uni union alone (3 equity + cmdty)")(uni.count())
      t("  analysisReturn on top of the union")(
        graft.models.MarketAnalysisReturn.analysisReturn(uni).count())
      val cached = uni.persist()
      t("  uni cache materialize")(cached.count())
      val t0 = System.nanoTime()
      val n = graft.models.MarketAnalysisReturn.analysisReturn(cached).count()
      println(f"PROBE   analysisReturn over CACHED uni               ${(System.nanoTime() - t0) / 1e9}%8.2f s rows=$n")
      cached.unpersist()
    }
    t("layerAr: 4-way union + analysisReturn")(
      SemanticLayerQueries.layerAr(spark, dir).count())
    t("full q_asset_daily_returns (isolated)")(
      graft.SparkEntry.queries("q_asset_daily_returns")(spark, dir).count())
    spark.stop()
  }
}

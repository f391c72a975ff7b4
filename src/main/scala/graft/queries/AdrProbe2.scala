package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Minimal isolation of the analysisReturn window pass: fresh JVM,
  * cache the 280k-row uni frame, time ONLY the window computation.
  * Distinguishes "the window pass inherently costs more at sf10"
  * from "the probe JVM's ambient heap pressure taxed it". */
object AdrProbe2 {
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
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1000.0
        if (dur > 0.5)
          println(f"STAGE ${si.stageId}%3d ${dur}%7.2f s tasks=${si.numTasks} ${si.name.take(90)}")
      }
    })
    locally {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries("q_asset_daily_returns")(spark, dir).count()
      println(f"PROBE FULL q_asset_daily_returns FIRST in fresh JVM ${(System.nanoTime() - t0) / 1e9}%8.2f s rows=$n")
      spark.catalog.clearCache(); System.gc()
    }
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
      .persist()
    println(s"PROBE uni cached rows=${uni.count()}")
    System.gc()
    val t0 = System.nanoTime()
    val n = graft.models.MarketAnalysisReturn.analysisReturn(uni).count()
    println(f"PROBE analysisReturn over cached uni (fresh JVM) ${(System.nanoTime() - t0) / 1e9}%8.2f s rows=$n")
    val t1 = System.nanoTime()
    graft.models.MarketAnalysisReturn.analysisReturn(uni).count()
    println(f"PROBE analysisReturn second run                  ${(System.nanoTime() - t1) / 1e9}%8.2f s")
    spark.stop()
  }
}

package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler (round 5: leading-econ / bha floor breakdown). */
object StageProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"STAGE $label ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
      spark.catalog.clearCache()
    }
    // warmup
    SparkEntry.queries("q_join_star_region_revenue")(spark, dir).count()
    SparkEntry.queries("q_window_lag_returns")(spark, dir).count()
    spark.catalog.clearCache()

    val buckets = Seq(
      concat(lit("FX_"), col("l_partkey") % 9)   -> "FOREX",
      concat(lit("FI_"), col("l_partkey") % 11)  -> "BONDS",
      concat(lit("GM_"), col("l_suppkey") % 7)   -> "GLOBAL",
      concat(lit("IDX_"), col("l_linestatus"))   -> "INDEX",
      concat(lit("SECT_"), col("l_returnflag"))  -> "NYSEARCA")
    def uniExact = buckets
      .map { case (b, ex) => graft.queries.MarketAnalysisQueries.universe(spark, dir, b, ex) }
      .reduce(_ unionByName _)

    t("1: uniExact (5 aggregations union)")(uniExact.count())
    t("2: analysisReturn(uniExact)")(
      graft.models.MarketAnalysisReturn.analysisReturn(uniExact).count())
    t("3: full q_base_historical_analysis")(
      SparkEntry.queries("q_base_historical_analysis")(spark, dir).count())
    t("4: q_leading_econ_return_indicator")(
      SparkEntry.queries("q_leading_econ_return_indicator")(spark, dir).count())
    t("5: q_leading_econ_return_indicator_snapshot")(
      SparkEntry.queries("q_leading_econ_return_indicator_snapshot")(spark, dir).count())
    spark.stop()
  }
}

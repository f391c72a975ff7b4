package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
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
      println(f"STAGE $label ${(System.nanoTime()-t0)/1e9}%.2f s rows=$n")
    }
    // warmup
    SparkEntry.queries("q_join_star_region_revenue")(spark, dir).count()
    spark.catalog.clearCache()
    val fred = graft.queries.FredQueries.fredSeries(spark, dir, Some("1997-07-01"))
    t("fredSeries(minD) full materialize")(fred.count())
    t("fredSeries cached reread")(fred.count())
    spark.catalog.clearCache()
    t("full fredSnapshot")(SparkEntry.queries("q_fred_series_latest_aggregates_snapshot")(spark, dir).count())
    spark.catalog.clearCache()
    t("agent variant")(SparkEntry.queries("q_agent_fred_series_latest_aggregates_snapshot")(spark, dir).count())
    spark.stop()
  }
}

package graft
import org.apache.spark.sql.SparkSession
object Profile {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warmup
    try SparkEntry.queries("q_join_star_region_revenue")(spark, sfDir).count() catch { case _: Throwable => () }
    try SparkEntry.queries("q_window_lag_returns")(spark, sfDir).count() catch { case _: Throwable => () }
    spark.catalog.clearCache()
    names.foreach { n =>
      if (sys.env.contains("SPARK_GRAFT_EXPLAIN")) {
        println(s"===== EXPLAIN $n =====")
        SparkEntry.queries(n)(spark, sfDir).explain("formatted")
      }
      (1 to 3).foreach { i =>
        spark.catalog.clearCache(); System.gc()
        val t0 = System.nanoTime()
        val c = SparkEntry.queries(n)(spark, sfDir).count()
        println(f"PROFILE $n run$i ${(System.nanoTime()-t0)/1e9}%.2f s rows=$c")
      }
    }
    spark.stop()
  }
}

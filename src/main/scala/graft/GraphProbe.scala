package graft
import org.apache.spark.sql.SparkSession
object GraphProbe {
  def main(args: Array[String]): Unit = {
    val parts = args.headOption.getOrElse("32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries("q_join_star_region_revenue")(spark, sfDir).count()
    spark.catalog.clearCache()
    Seq("q_pagerank_trade", "q_bfs_hops_trade", "q_label_propagation_communities").foreach { n =>
      (1 to 2).foreach { i =>
        spark.catalog.clearCache(); System.gc()
        val t0 = System.nanoTime()
        val c = SparkEntry.queries(n)(spark, sfDir).count()
        println(f"GRAPHPROBE parts=$parts $n run$i ${(System.nanoTime()-t0)/1e9}%.2f s rows=$c")
      }
    }
    spark.stop()
  }
}

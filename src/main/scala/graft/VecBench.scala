package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.cosineSimilarity
import graft.operators.SimilarityOps.toDouble
object VecBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val big = e.crossJoin(spark.range(200)).select(col("vec_id"), col("embedding")).cache()
    println(s"rows=${big.count()}")
    val q = e.limit(1).select(toDouble(col("embedding")).as("qvec"))
    def time(label: String)(f: => Unit): Unit =
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime(); f
        println(f"$label run$i ${(System.nanoTime()-t0)/1e9}%.2f s")
      }
    val joined = big.crossJoin(broadcast(q)).cache(); joined.count()
    time("native") { joined.select(call_function("vec_cosine", col("embedding"), col("qvec")).as("c")).agg(sum("c")).collect() }
    time("hof   ") { joined.select(cosineSimilarity(toDouble(col("embedding")), col("qvec")).as("c")).agg(sum("c")).collect() }
    spark.stop()
  }
}

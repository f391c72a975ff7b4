package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Ad-hoc micro-batch decomposition probe for q_stream_interval_join
  * (VERDICT r9 #5: 7.4 s at sf0.1 — batch count? fixed runtime
  * overhead vs plan cost?). Prints per-batch durations from the
  * streaming progress log. */
object StreamProf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    // warmup: batch read of the same table (parquet footers, codegen)
    graft.runtime.Tables.normalizeEventTs(
      spark.read.parquet(s"$dir/events.parquet")).count()

    val t0 = System.nanoTime()
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    def side(eventType: String, idAs: String, uAs: String, tsAs: String) = {
      val path = s"$dir/events.parquet"
      val src = spark.readStream
        .schema(spark.read.parquet(path).schema)
        .parquet(s"$dir/{events}.parquet")
      graft.runtime.Tables.normalizeEventTs(src)
        .filter(col("event_type") === eventType)
        .select(col("event_id").as(idAs), col("user_id").as(uAs), col("ts").as(tsAs))
        .withWatermark(tsAs, "1 hour")
    }
    val purchases = side("purchase", "purchase_id", "pu", "pts")
    val views     = side("view", "view_id", "vu", "vts")
    val joined = purchases
      .join(views,
        col("pu") === col("vu") &&
          col("vts") >= col("pts") - expr("INTERVAL 2 HOURS") &&
          col("vts") <= col("pts"))
      .select(col("purchase_id"), col("pu").as("user_id"), col("view_id"),
        (unix_micros(col("pts")) - unix_micros(col("vts"))).as("delta_us"))
    val ckpt = java.nio.file.Files.createTempDirectory("graft_sprof")
    val q = joined.writeStream.format("memory").queryName("sprof")
      .outputMode("append").trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt.toString).start()
    q.awaitTermination()
    println(f"TOTAL wall ${(System.nanoTime() - t0) / 1e9}%.2f s, rows=${spark.table("sprof").count()}")
    q.recentProgress.foreach { p =>
      println(s"BATCH ${p.batchId}: durationMs=${p.durationMs} rows_in=${p.numInputRows} " +
        s"state=${p.stateOperators.map(s => s"rows=${s.numRowsTotal} mem=${s.memoryUsedBytes}").mkString(";")}")
    }
    spark.stop()
  }
}

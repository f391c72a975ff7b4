package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.types.StructType

import graft.operators.SinkOps

/** Structured-Streaming ingest paths (SURVEY.md §2.N). The reference
  * is batch-only (partitioned re-runs + MERGE upserts); the Spark
  * equivalent of its ingest->merge path is `Trigger.AvailableNow`
  * micro-batching with an idempotent keyed merge per batch — same
  * late-data semantics (re-delivered keys overwrite), plus true
  * watermark-windowed aggregation for genuinely unbounded streams.
  */
object StreamingIngest {

  /** File-source stream over a directory of parquet drops. */
  def parquetStream(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(dir)

  /** Watermarked tumbling-window counts per key — the canonical
    * unbounded-agg shape (event time, late data dropped past the
    * watermark). */
  def windowedCounts(
      events: DataFrame,
      tsCol: String,
      keyCol: String,
      windowLen: String,
      watermark: String
  ): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(
        col(s"window.start").as("window_start"),
        col(keyCol),
        col("n"),
        col("total_value")
      )

  /** Custom keyed state: running per-key aggregate maintained across
    * micro-batches via flatMapGroupsWithState — the Structured
    * Streaming tool for state machines the built-in windows can't
    * express (alert breach/resolve tracking, signal lifecycles).
    * Emits one updated (key, count, total) row per key per batch. */
  def statefulRunningTotals(
      events: DataFrame,
      keyCol: String,
      valueCol: String
  ): org.apache.spark.sql.Dataset[(String, Long, Double)] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    events
      .selectExpr(s"CAST($keyCol AS STRING) AS k", s"CAST($valueCol AS DOUBLE) AS v")
      .as[(String, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Double), (String, Long, Double)](
        OutputMode.Append(),
        GroupStateTimeout.NoTimeout()
      ) { case (key, rows, state: GroupState[(Long, Double)]) =>
        val (n0, s0)   = state.getOption.getOrElse((0L, 0.0))
        var n          = n0
        var total      = s0
        rows.foreach { case (_, v) => n += 1; total += v }
        state.update((n, total))
        Iterator.single((key, n, total))
      }
  }

  /** Ingest->merge: each micro-batch is MERGE-upserted into the target
    * parquet by key (idempotent under redelivery — the reference's
    * upsert-on-rerun semantics). Runs to completion with
    * Trigger.AvailableNow. */
  def mergeIngest(
      stream: DataFrame,
      keys: Seq[String],
      precedenceCol: String,
      targetPath: String,
      checkpoint: String
  ): DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark  = batch.sparkSession
        val target =
          try spark.read.parquet(targetPath)
          catch { case _: Exception => spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], batch.schema) }
        val merged = SinkOps.mergeUpsert(target, batch, keys, Seq(col(precedenceCol).desc))
        merged.write.mode("overwrite").parquet(targetPath + "_new")
        // atomic-ish swap for plain parquet (Delta MERGE replaces this
        // wholesale on a transactional lake)
        val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
        val tgt = new org.apache.hadoop.fs.Path(targetPath)
        fs.delete(tgt, true)
        fs.rename(new org.apache.hadoop.fs.Path(targetPath + "_new"), tgt)
        ()
      }
}

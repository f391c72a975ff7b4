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

  /** Streaming sessionization through the keyed state store: per-user
    * inactivity-gap sessions via flatMapGroupsWithState. Each batch
    * folds the user's events (sorted by event time within the batch)
    * into the open session carried in state; sessions closed by a gap
    * emit with `is_open = false`, and the still-open session emits
    * `is_open = true` while also staying in state. Under an
    * AvailableNow run (one micro-batch sees everything) the output is
    * therefore EXACTLY the batch gaps-and-islands answer, with the
    * user's final session flagged open. A genuinely unbounded
    * deployment would suppress the open-session emission and close by
    * event-time timeout instead (the open row would re-emit each
    * batch under append mode).
    *
    * Scale: state is one (start, end, n, total) tuple per ACTIVE user
    * — sharded by key hash across executors, independent of history
    * length. Timestamps fold as epoch micros (exact longs); the value
    * total accumulates in scaled-long decimal micro-units so emission
    * order can't wobble a double.
    *
    * Emits (user_id, session_start_us, session_end_us, n_events,
    * total_value_u6, is_open). */
  def statefulSessionize(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      valueCol: String,
      gapSeconds: Long
  ): org.apache.spark.sql.Dataset[(Long, Long, Long, Long, Long, Boolean)] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapSeconds * 1000000L
    events
      .selectExpr(
        s"CAST($userCol AS BIGINT) AS u",
        s"unix_micros($tsCol) AS ts_us",
        // scaled-long micro-units: exact integer accumulation
        s"CAST(ROUND(CAST($valueCol AS DECIMAL(18,6)) * 1000000, 0) AS BIGINT) AS v_u6")
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, Long, Long), (Long, Long, Long, Long, Long, Boolean)](
        OutputMode.Append(),
        GroupStateTimeout.NoTimeout()
      ) { case (user, rows, state: GroupState[(Long, Long, Long, Long)]) =>
        // state: (session_start_us, last_ts_us, n_events, total_v_u6)
        val sorted = rows.toSeq.sortBy(r => (r._2, r._3))
        val out    = Seq.newBuilder[(Long, Long, Long, Long, Long, Boolean)]
        var open   = state.getOption
        sorted.foreach { case (_, ts, v) =>
          open match {
            // merge while diff <= gap: an event landing EXACTLY gap
            // after the previous one continues the session — Spark's
            // native session_window rule (event windows [ts, ts+gap)
            // merge when overlapping OR ADJACENT; LayoutSpecs pins it)
            case Some((st, last, n, tot)) if ts - last <= gapUs =>
              open = Some((st, ts, n + 1, tot + v))
            case Some((st, last, n, tot)) =>
              out += ((user, st, last, n, tot, false))
              open = Some((ts, ts, 1L, v))
            case None =>
              open = Some((ts, ts, 1L, v))
          }
        }
        open.foreach { case (st, last, n, tot) =>
          state.update((st, last, n, tot))
          out += ((user, st, last, n, tot, true))
        }
        out.result().iterator
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

package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series utilities: date spines, gap interpolation, grain
  * classification and the one genuinely sequential operator in the
  * reference — recursive EMA (SURVEY.md §2.H, §2.E).
  */
object TimeSeriesOps {

  /** Daily date spine [start, end] inclusive (ref
    * semantic_layer/time_spine_daily.sql:3-10 — GENERATE_DATE_ARRAY).
    * `sequence` + `explode` distributes fine; a multi-decade daily
    * spine is only ~10^4 rows so it is broadcast-sized by design. */
  def dateSpine(spark: SparkSession, start: String, end: String): DataFrame =
    spark
      .range(1)
      .select(
        explode(
          sequence(to_date(lit(start)), to_date(lit(end)), expr("interval 1 day"))
        ).as("date")
      )

  /** Per-key spine bounded by each key's own [min, max] date (ref
    * fred_monthly_diff.sql:29-54). */
  def keyedDateSpine(df: DataFrame, keys: Seq[String], dateCol: String, step: String = "1 day"): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(min(col(dateCol)).as("__lo"), max(col(dateCol)).as("__hi"))
      .select(
        (keys.map(col) :+
          explode(sequence(col("__lo"), col("__hi"), expr(s"interval $step"))).as(dateCol)): _*
      )

  /** Reference gap-fill semantics (ref fred_monthly_diff.sql:56-105):
    * join actuals onto the spine, then impute each missing point from
    * its SINGLE spine neighbors (not last-known-value):
    *   - both neighbors present -> midpoint  ("Interpolated")
    *   - only previous          -> previous  ("Forward Filled")
    *   - only next              -> next      ("Backward Filled")
    *   - actual present         -> actual    ("Actual")
    * Deliberately bug-compatible with the reference: a 2+ row gap
    * stays NULL past the first neighbor.
    */
  def gapFillInterpolate(
      spine: DataFrame,
      actuals: DataFrame,
      keys: Seq[String],
      dateCol: String,
      valueCol: String
  ): DataFrame = {
    val joined = spine.join(actuals, keys :+ dateCol, "left")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(dateCol))
    val prev = lag(col(valueCol), 1).over(w)
    val next = lead(col(valueCol), 1).over(w)
    val v    = col(valueCol)
    joined
      .withColumn(
        "imputed_value",
        when(v.isNotNull, v)
          .when(prev.isNotNull && next.isNotNull, (prev + next) / 2.0)
          .when(prev.isNotNull, prev)
          .when(next.isNotNull, next)
      )
      .withColumn(
        "data_source",
        when(v.isNotNull, "Actual")
          .when(prev.isNotNull && next.isNotNull, "Interpolated")
          .when(prev.isNotNull, "Forward Filled")
          .when(next.isNotNull, "Backward Filled")
          .otherwise("Missing")
      )
  }

  /** Grain auto-classification from trailing-12-month observation
    * counts (ref fred_series_grain.sql:26-44). */
  def classifyGrain(countCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(countCol >= 200, "Daily")
      .when(countCol >= 50, "Weekly")
      .when(countCol >= 9, "Monthly")
      .when(countCol >= 2, "Quarterly")
      .otherwise("Annually")

  /** Recursive (infinite-history) EMA: e_1 = x_1; e_t = a*x_t + (1-a)*e_{t-1}.
    * BigQuery expresses this as WITH RECURSIVE (ref
    * market_breadth_signals.sql:168-192, McClellan/Zweig); Spark has no
    * recursive CTE, and the recurrence is order-dependent, so this is
    * implemented as a per-key sorted sequential fold in executors:
    * repartition by key, sort within partitions, single pass.
    * Scale posture: one task per hash bucket of keys; each key's
    * history streams through the iterator without materializing.
    *
    * Input columns are normalized to (key: String, ord: Long, v: Double);
    * join back on (key, ord) to attach to richer frames.
    */
  def recursiveEma(
      df: DataFrame,
      keyCol: String,
      ordCol: String,
      valueCol: String,
      alpha: Double,
      outCol: String = "ema"
  ): DataFrame = recursiveEmaCoef(df, keyCol, ordCol, valueCol, alpha, 1.0 - alpha, outCol)

  /** [[recursiveEma]] with an EXPLICIT complement coefficient: some
    * reference models hard-code literal pairs like (0.1818181818,
    * 0.8181818182) whose parsed doubles are not exact IEEE complements
    * of each other — `beta` must then be that literal, not 1-alpha
    * (market_breadth_signals.sql:186-188). */
  def recursiveEmaCoef(
      df: DataFrame,
      keyCol: String,
      ordCol: String,
      valueCol: String,
      alpha: Double,
      beta: Double,
      outCol: String
  ): DataFrame = {
    val spark = df.sparkSession
    val prepared = df
      .select(
        col(keyCol).cast("string").as("_k"),
        col(ordCol).cast("long").as("_o"),
        col(valueCol).cast("double").as("_v")
      )
      .as(Encoders.tuple(Encoders.STRING, Encoders.scalaLong, Encoders.scalaDouble))

    val folded = prepared
      .repartition(col("_k"))
      .sortWithinPartitions(col("_k"), col("_o"))
      .mapPartitions { it =>
        var curKey: String = null
        var e: Double      = 0.0
        it.map { case (k, o, v) =>
          if (k != curKey) { curKey = k; e = v }
          else e = alpha * v + beta * e
          (k, o, e)
        }
      }(Encoders.tuple(Encoders.STRING, Encoders.scalaLong, Encoders.scalaDouble))
      .toDF("_k", "_o", outCol)

    df.join(
      folded,
      col(keyCol).cast("string") === col("_k") && col(ordCol).cast("long") === col("_o"),
      "left"
    ).drop("_k", "_o")
  }
}

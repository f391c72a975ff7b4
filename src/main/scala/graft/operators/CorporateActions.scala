package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._

/** Corporate-action detection + split adjustment (SURVEY.md §2.I; ref
  * stg_corporate_actions.sql (205 LoC) + stg_split_adjusted_prices.sql
  * (82 LoC)): multi-source split-event detection, ±k-day banded
  * anti-join dedup, and price adjustment via the cumulative FUTURE
  * split factor EXP(SUM(LN(f)) OVER (1 FOLLOWING → UNBOUNDED
  * FOLLOWING)).
  */
object CorporateActions {

  /** Ratio targets the reference's heuristic detector matches
    * open/prev_close against, within ±5% (ref stg_corporate_actions
    * .sql:104-144). Target r implies split factor 1/r. */
  val HeuristicTargets: Seq[Double] = Seq(0.1, 0.2, 0.25, 1.0 / 3.0, 0.5, 2.0, 3.0, 4.0)

  /** Detect heuristic split events from bar-over-bar open/prev_close
    * ratios. First matching target in fixed order wins (deterministic).
    * `tolerance` is relative (reference uses 5%). */
  def detectHeuristicSplits(
      bars: DataFrame,
      keys: Seq[String],
      dateCol: String,
      targets: Seq[Double] = HeuristicTargets,
      tolerance: Double = 0.05
  ): DataFrame = {
    val w     = Window.partitionBy(keys.map(col): _*).orderBy(col(dateCol))
    val ratio = col("open") / lag(col("close"), 1).over(w)
    val factor = targets.foldRight(lit(null).cast("double")) { (r, acc) =>
      when(abs(ratio - r) <= tolerance * r, lit(1.0 / r)).otherwise(acc)
    }
    bars
      .withColumn("split_factor", factor)
      .filter(col("split_factor").isNotNull)
      .select((keys.map(col) :+ col(dateCol) :+ col("split_factor") :+ lit("heuristic").as("source")): _*)
  }

  /** Banded ±`days` dedup across detection sources: a row is dropped
    * when a strictly "better" event exists within the band — better =
    * lower source rank, then earlier date, then larger factor (total
    * order; ref stg_corporate_actions.sql:171-205). sourceRank maps
    * source name -> priority (lower wins). */
  def dedupeEvents(
      events: DataFrame,
      keys: Seq[String],
      dateCol: String,
      days: Int,
      sourceRank: Map[String, Int]
  ): DataFrame = {
    val rank = sourceRank.foldLeft(lit(999)) { case (acc, (s, r)) =>
      when(col("source") === s, r).otherwise(acc)
    }
    val ranked = events.withColumn("__rank", rank)
    val better =
      col("r.__rank") < col("l.__rank") ||
        (col("r.__rank") === col("l.__rank") && col(s"r.$dateCol") < col(s"l.$dateCol")) ||
        (col("r.__rank") === col("l.__rank") && col(s"r.$dateCol") === col(s"l.$dateCol") &&
          col("r.split_factor") > col("l.split_factor"))
    JoinOps.bandedAntiJoin(ranked, keys, dateCol, days, better).drop("__rank")
  }

  /** Apply split events to bars: divide prices / multiply volume by the
    * cumulative FUTURE factor (products of all later events; ref
    * stg_split_adjusted_prices.sql:32-36, 59-68). */
  def applySplitAdjustment(
      bars: DataFrame,
      events: DataFrame,
      keys: Seq[String],
      dateCol: String
  ): DataFrame = {
    val joined = bars.join(
      events.select((keys.map(col) :+ col(dateCol) :+ col("split_factor")): _*),
      keys :+ dateCol,
      "left"
    )
    val w   = Window.partitionBy(keys.map(col): _*).orderBy(col(dateCol))
    val fut = w.rowsBetween(1, Window.unboundedFollowing)
    // EXP(SUM(LN)) is the reference idiom; snapping to 6 decimals
    // removes the last-ulp noise of the log/exp round-trip so the
    // factor is the exact split product (2.0, 4.0, ...) again.
    val cumFuture = round(
      coalesce(
        exp(sum(log(coalesce(col("split_factor"), lit(1.0)))).over(fut)),
        lit(1.0)
      ),
      6
    )
    joined
      .withColumn("cum_future_factor", cumFuture)
      .withColumn("adj_open", col("open") / col("cum_future_factor"))
      .withColumn("adj_high", col("high") / col("cum_future_factor"))
      .withColumn("adj_low", col("low") / col("cum_future_factor"))
      .withColumn("adj_close", col("close") / col("cum_future_factor"))
      .withColumn("adj_volume", col("volume") * col("cum_future_factor"))
  }
}

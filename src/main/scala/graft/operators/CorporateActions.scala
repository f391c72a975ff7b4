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
      tolerance: Double = 0.05,
      gate: Column = lit(true)
  ): DataFrame = {
    val w     = Window.partitionBy(keys.map(col): _*).orderBy(col(dateCol))
    val ratio = col("open") / lag(col("close"), 1).over(w)
    val factor = targets.foldRight(lit(null).cast("double")) { (r, acc) =>
      when(abs(ratio - r) <= tolerance * r, lit(1.0 / r)).otherwise(acc)
    }
    // `gate` filters ROWS after the lag is computed over the full
    // series (ref gates on split_factor IS NULL OR = 1 in WHERE, not
    // by pre-filtering the lag input — stg_corporate_actions.sql:131)
    bars
      .withColumn("split_factor", factor)
      .filter(col("split_factor").isNotNull && gate)
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

  /** Back-shift authoritative API split dates when raw prices already
    * reflect the split BEFORE the official date (ref
    * stg_corporate_actions.sql:41-83): find the latest bar strictly
    * before the event date; if `split_factor >= minFactor` and the
    * open/prev_close ratio of that bar is within `tolerance` (relative)
    * of 1/split_factor, the split was already effective that day — the
    * event date shifts back to it.
    *
    * `apiEvents` must carry keys :+ dateCol :+ split_factor; `bars`
    * keys :+ dateCol :+ open/close. Scale shape: events are tiny (one
    * row per corporate action) — broadcast them; the fan-out of the
    * inequality join is |bars-per-key| × events-per-key, then a
    * per-event ROW_NUMBER keeps only the latest prior bar, exactly the
    * reference's plan.
    */
  def backShiftApiSplits(
      apiEvents: DataFrame,
      bars: DataFrame,
      keys: Seq[String],
      dateCol: String,
      minFactor: Double = 1.2,
      tolerance: Double = 0.10
  ): DataFrame = {
    val wBar = Window.partitionBy(keys.map(col): _*).orderBy(col(dateCol))
    // rename the prior-bar side: same-lineage column refs degenerate to
    // trivially-true join predicates (see oracle-parity memory rules)
    val priced = bars
      .withColumn("__prev_close", lag(col("close"), 1).over(wBar))
      .select((keys.map(k => col(k).as(s"__p_$k")) :+
        col(dateCol).as("__p_d") :+ col("open").as("__p_open") :+ col("__prev_close")): _*)
    val joined = apiEvents.join(
      priced,
      keys.map(k => col(k) === col(s"__p_$k")).reduce(_ && _) &&
        col("__p_d") < col(dateCol),
      "left"
    )
    val wEvt = Window
      .partitionBy((keys.map(col) :+ col(dateCol)): _*)
      .orderBy(col("__p_d").desc_nulls_last)
    val inv = lit(1.0) / col("split_factor")
    joined
      .withColumn("__rn", row_number().over(wEvt))
      .filter(col("__rn") === 1)
      .withColumn(
        dateCol,
        when(
          col("split_factor") >= minFactor &&
            col("__prev_close").isNotNull && col("__prev_close") > 0 && col("__p_open") > 0 &&
            abs(col("__p_open") / col("__prev_close") - inv) / inv < tolerance,
          col("__p_d")
        ).otherwise(col(dateCol))
      )
      .drop((Seq("__rn", "__p_d", "__p_open", "__prev_close") ++ keys.map(k => s"__p_$k")): _*)
  }

  /** Dividend branch (ref stg_corporate_actions.sql:148-159): every bar
    * with a positive dividend becomes an action row — split_factor 1,
    * action_type 'dividend'; dividends never conflict with splits and
    * pass through the final dedup untouched. */
  def detectDividends(
      bars: DataFrame,
      keys: Seq[String],
      dateCol: String,
      dividendCol: String
  ): DataFrame =
    bars
      .filter(col(dividendCol).isNotNull && col(dividendCol) > 0)
      .select((keys.map(col) :+ col(dateCol) :+
        lit("dividend").as("action_type") :+
        lit(1.0).as("split_factor") :+
        col(dividendCol).as("dividend_amount") :+
        lit("api_reported").as("detection_method")): _*)

  /** Reference-exact final combine (stg_corporate_actions.sql:170-205):
    * back-shifted API splits always win; api_reported and heuristic
    * SPLIT rows are dropped when any API split for the same keys sits
    * within ±`days` (window, not exact date — the back-shift may have
    * moved the authoritative date); dividend rows always pass. Both
    * frames must share the (keys, dateCol, action_type, split_factor,
    * dividend_amount, detection_method) schema. */
  def combineDetections(
      apiAdjusted: DataFrame,
      ohlcBased: DataFrame,
      keys: Seq[String],
      dateCol: String,
      days: Int
  ): DataFrame = {
    val apiSplits = apiAdjusted
      .filter(col("action_type") === "split")
      .select((keys.map(k => col(k).as(s"__a_$k")) :+ col(dateCol).as("__a_d")): _*)
    val cond = keys.map(k => col(k) === col(s"__a_$k")).reduce(_ && _) &&
      col("action_type") === "split" &&
      abs(datediff(col(dateCol), col("__a_d"))) <= days
    apiAdjusted.unionByName(ohlcBased.join(broadcast(apiSplits), cond, "left_anti"))
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

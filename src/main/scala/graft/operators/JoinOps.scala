package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join shapes from SURVEY.md §2.C beyond plain equi-joins. All
  * declarative DataFrame joins: Catalyst/AQE pick broadcast vs
  * shuffle; callers broadcast small sides explicitly.
  */
object JoinOps {

  /** Exact-offset lookback self-join: for each (keys, date) row attach
    * the value exactly `days` calendar days earlier, NULL when that
    * exact date is missing (calendar-day semantics of the reference —
    * ref calculate_market_analysis_return.sql:56-76). Implemented as a
    * projected self-join on (keys, date+days) so it stays a single
    * shuffle-hash join on the same keys at scale.
    */
  def lookbackExact(
      df: DataFrame,
      keys: Seq[String],
      dateCol: String,
      valueCol: String,
      days: Seq[Int]
  ): DataFrame = {
    days.foldLeft(df) { (acc, d) =>
      val prior = df
        .select(
          (keys.map(col) :+
            date_add(col(dateCol), d).as(dateCol) :+
            col(valueCol).as(s"${valueCol}_${d}d_ago")): _*
        )
      acc.join(prior, keys :+ dateCol, "left")
    }
  }

  /** Banded anti-join dedup: drop a row when a "better" row with the
    * same keys exists within ±`days` (ref stg_corporate_actions.sql:
    * 178-205). `better` decides precedence between two candidate rows
    * (left = candidate being tested, right = potential shadow-er); it
    * must be a strict total order to keep the result deterministic.
    */
  def bandedAntiJoin(
      df: DataFrame,
      keys: Seq[String],
      dateCol: String,
      days: Int,
      better: Column
  ): DataFrame = {
    val l    = df.alias("l")
    val r    = df.alias("r")
    val cond = keys.map(k => col(s"l.$k") === col(s"r.$k")).reduce(_ && _) &&
      abs(datediff(col(s"l.$dateCol"), col(s"r.$dateCol"))) <= days &&
      better
    l.join(r, cond, "left_anti")
  }

  /** Latest-row-before lookup: for each left row, the single right row
    * with the greatest `rightDate` strictly before `leftDate` (ref
    * stg_corporate_actions.sql:71-82 — inequality join + ROW_NUMBER
    * dedup). tieBreak columns must make the choice deterministic.
    */
  def latestBefore(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftDate: String,
      rightDate: String,
      tieBreak: Seq[String]
  ): DataFrame = {
    val joined = left.join(
      right,
      keys.map(k => left(k) === right(k)).reduce(_ && _) &&
        right(rightDate) < left(leftDate),
      "left"
    )
    val w = Window
      .partitionBy((keys.map(left(_)) :+ left(leftDate)): _*)
      .orderBy((right(rightDate).desc_nulls_last +: tieBreak.map(right(_).desc)): _*)
    joined
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Variable-length interval overlap self-join via grid bucketing —
    * the scale-safe form of `a.start <= b.end AND b.start <= a.end`.
    * A naive inequality self-join has no equi key, so Spark plans a
    * BroadcastNestedLoopJoin (quadratic). Decomposition: explode each
    * interval to the `bucketWidth`-grid cells it touches, equi-join
    * on the cell, then verify the exact overlap predicate and dedupe
    * (a pair sharing several cells emits once).
    *
    * Cost scales with Σ interval_len/W (explode) + true-concurrency
    * pair count — never with |rows|². Pick W near the median interval
    * length: smaller W = more replication, larger W = fatter cells
    * (the skew valve). Start/end are inclusive integers (any unit).
    *
    * Emits (id_a, id_b, overlap_start, overlap_end) with id_a < id_b.
    */
  def intervalOverlapPairs(
      df: DataFrame,
      idCol: String,
      startCol: String,
      endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val cells = df
      .select(col(idCol).as("__id"), col(startCol).cast("long").as("__st"),
        col(endCol).cast("long").as("__en"))
      .filter(col("__st") <= col("__en"))
      .select(col("__id"), col("__st"), col("__en"),
        explode(sequence(expr(s"__st div $bucketWidth"), expr(s"__en div $bucketWidth")))
          .as("__cell"))
    val a = cells.select(col("__cell"), col("__id").as("id_a"),
      col("__st").as("st_a"), col("__en").as("en_a"))
    val b = cells.select(col("__cell"), col("__id").as("id_b"),
      col("__st").as("st_b"), col("__en").as("en_b"))
    a.join(b, Seq("__cell"))
      .filter(col("id_a") < col("id_b") &&
        col("st_a") <= col("en_b") && col("st_b") <= col("en_a"))
      .select(col("id_a"), col("id_b"),
        greatest(col("st_a"), col("st_b")).as("overlap_start"),
        least(col("en_a"), col("en_b")).as("overlap_end"))
      .distinct()
  }

  /** Point-in-time "latest per group" join: reduce to the row carrying
    * the max order column per key (ref fred_series_latest_aggregates
    * .sql:110-137). Uses max_by-style struct-max — one aggregation, no
    * join, no window sort. */
  def latestPerGroup(df: DataFrame, keys: Seq[String], orderCol: String, valueCols: Seq[String]): DataFrame = {
    val packed = struct((orderCol +: valueCols).map(col): _*)
    df.groupBy(keys.map(col): _*)
      .agg(max(packed).as("__latest"))
      .select((keys.map(col) ++ (orderCol +: valueCols).map(c => col(s"__latest.$c").as(c))): _*)
  }

  /** Generalized as-of join (pandas merge_asof semantics) via the
    * union-spine trick: tag both sides, union, ONE shuffle on the key,
    * then propagate the right-side payload with running
    * last/first(ignoreNulls) frames. Attaches, per left row, BOTH the
    * backward match (greatest right ts <= left ts) and the forward
    * match (least right ts >= left ts), each NULLed when outside
    * `toleranceUs`; callers derive "nearest" by comparing the two
    * deltas (tie -> backward, the pandas rule).
    *
    * Scale rationale: the inequality-join form ([[latestBefore]])
    * fans out by the band width before its row_number dedup — fine
    * for bounded bands, quadratic on hot keys. This form's cost is
    * exactly sort(|L|+|R|) partitioned by key: no join, no fan-out,
    * skew bounded by the largest single key's row count. The two
    * window passes share one hash partitioning (single Exchange;
    * second pass is a re-sort, not a re-shuffle).
    *
    * Determinism: right rows tied on (key, ts) are ordered by
    * `rTieCol`; backward takes the LAST (max tie), forward the FIRST
    * (min tie) — both total orders.
    *
    * Output: all left columns plus, for each payload column `p`,
    * `bw_p` / `fw_p`, and `bw_delta_us` / `fw_delta_us` (non-negative
    * BIGINT microseconds, NULL when unmatched).
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rTieCol: String,
      payload: Seq[String],
      toleranceUs: Long
  ): DataFrame = {
    require(toleranceUs >= 0, s"toleranceUs must be >= 0, got $toleranceUs")
    val payStruct = struct((col(rightTs).cast("timestamp").as("__rts") +:
      payload.map(col)): _*)
    val rSide = right.select(
      (keys.map(col) :+ col(rightTs).cast("timestamp").as("__ts") :+
        lit(0).as("__side") :+ col(rTieCol).cast("long").as("__tie") :+
        payStruct.as("__pay")): _*)
    val leftCols = left.columns.toSeq
    val lSide = left.select(
      (keys.map(col) :+ col(leftTs).cast("timestamp").as("__ts") :+
        lit(1).as("__side") :+ lit(Long.MaxValue).as("__tie") :+
        lit(null).cast(rSide.schema("__pay").dataType).as("__pay")) ++
        leftCols.map(c => col(c).as(s"__l_$c")): _*)
    val rPadded = rSide.select(
      (rSide.columns.map(col) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(s"__l_$c"))).toIndexedSeq: _*)
    val spine = lSide.unionByName(rPadded)

    // backward: right rows sort BEFORE left at equal ts (inclusive <=),
    // ties by __tie asc so last() = max tie. forward: left BEFORE right
    // at equal ts (inclusive >=), ties asc so first() = min tie.
    val kCols  = keys.map(col)
    val wBack  = Window.partitionBy(kCols: _*)
      .orderBy(col("__ts").asc, col("__side").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wFwd   = Window.partitionBy(kCols: _*)
      .orderBy(col("__ts").asc, col("__side").desc, col("__tie").asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val matched = spine
      .withColumn("__bw", last(col("__pay"), ignoreNulls = true).over(wBack))
      .withColumn("__fw", first(col("__pay"), ignoreNulls = true).over(wFwd))
      .filter(col("__side") === 1)
    val bwDelta = unix_micros(col("__ts")) - unix_micros(col("__bw.__rts"))
    val fwDelta = unix_micros(col("__fw.__rts")) - unix_micros(col("__ts"))
    val bwOk    = col("__bw").isNotNull && bwDelta <= toleranceUs
    val fwOk    = col("__fw").isNotNull && fwDelta <= toleranceUs
    matched.select(
      leftCols.map(c => col(s"__l_$c").as(c)) ++
        payload.map(p => when(bwOk, col(s"__bw.$p")).as(s"bw_$p")) ++
        Seq(when(bwOk, bwDelta).as("bw_delta_us")) ++
        payload.map(p => when(fwOk, col(s"__fw.$p")).as(s"fw_$p")) ++
        Seq(when(fwOk, fwDelta).as("fw_delta_us")): _*)
  }
}

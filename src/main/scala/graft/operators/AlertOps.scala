package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Threshold-alert evaluation: comparator checks plus the
  * breach/resolve episode state machine (ref macro_agents/src/
  * macro_agents/defs/alerts/assets.py:131-191 and config.py:35-44).
  *
  * The reference evaluates only the LATEST observation per run and
  * accumulates an append-only event table across scheduled runs
  * (insert on breach while no open event, UPDATE resolved_at on
  * clear). Replayed over the full history in one batch, that protocol
  * is exactly a gaps-and-islands pass: consecutive same-state runs of
  * the breached flag form segments; each breached segment is one
  * event, `breached_at` its first observation date, `resolved_at` the
  * first date of the following clear segment (NULL while still open).
  *
  * Scale: one shuffle by alert_id for the window pass; segment
  * aggregation reuses the same partitioning. The final global
  * `event_id` row_number is bounded by episode count (a few per alert
  * per cycle), not input size — see the WindowOps bounded-global-
  * window invariant.
  */
object AlertOps {

  /** `observed > / < / >= / <= threshold` dispatched on a comparator
    * column holding gt|lt|gte|lte (ref config.py:35-44). */
  def breached(observed: Column, comparator: Column, threshold: Column): Column =
    when(comparator === "gt", observed > threshold)
      .when(comparator === "lt", observed < threshold)
      .when(comparator === "gte", observed >= threshold)
      .otherwise(observed <= threshold)

  /** Breach/resolve event log from an evaluated observation frame.
    *
    * Input columns: `alert_id`, `date` (unique per alert_id),
    * `observed_value`, `breached` (0/1 int), plus the pass-through
    * definition columns `indicator, comparator, threshold, severity,
    * title` (constant within an alert_id).
    *
    * Output: one row per breach episode — event_id, alert_id,
    * definition columns, observed_value (at breach), breached_at,
    * resolved_at (NULL = still open), status, days_open.
    */
  def breachResolveEvents(evaluated: DataFrame): DataFrame = {
    val wAlert = Window.partitionBy(col("alert_id")).orderBy(col("date"))
    val prev = lag(col("breached"), 1).over(wAlert)
    val segs = evaluated
      .withColumn("chg", when(prev.isNull || prev =!= col("breached"), 1).otherwise(0))
      .withColumn("seg", sum(col("chg")).over(wAlert.rowsBetween(Window.unboundedPreceding, 0)))
    val episodes = segs
      .groupBy(col("alert_id"), col("seg"))
      .agg(
        min(col("indicator")).as("indicator"),
        min(col("comparator")).as("comparator"),
        min(col("threshold")).as("threshold"),
        min(col("severity")).as("severity"),
        min(col("title")).as("title"),
        max(col("breached")).as("breached"), // constant within a segment
        min(col("date")).as("breached_at"),
        min_by(col("observed_value"), col("date")).as("observed_value"))
    val wSeg = Window.partitionBy(col("alert_id")).orderBy(col("seg"))
    episodes
      // segments alternate breached/clear, so the NEXT segment's first
      // date is the first clear observation = the resolution instant
      .withColumn("resolved_at", lead(col("breached_at"), 1).over(wSeg))
      .filter(col("breached") === 1)
      .withColumn("event_id",
        row_number().over(Window.orderBy(col("breached_at"), col("alert_id"))).cast("long"))
      .select(
        col("event_id"), col("alert_id"), col("indicator"), col("comparator"),
        col("threshold"), col("observed_value"), col("severity"), col("title"),
        col("breached_at"), col("resolved_at"),
        when(col("resolved_at").isNull, "open").otherwise("resolved").as("status"),
        datediff(col("resolved_at"), col("breached_at")).cast("long").as("days_open"))
  }
}

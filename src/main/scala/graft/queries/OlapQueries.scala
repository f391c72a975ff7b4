package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.QueryDef.dsum
import graft.runtime.Tables

/** Native OLAP operators not exercised elsewhere: session windows
  * (Catalyst `SessionWindow` — Spark's built-in gaps-and-islands) and
  * hierarchical ROLLUP grouping sets. Both are single-shuffle
  * aggregations at any scale: sessionization shuffles by user key,
  * rollup expands grouping sets inside the aggregate (partial
  * aggregation still applies), so neither adds a join or a second
  * exchange at 100 TB.
  */
object OlapQueries {

  private def T(s: SparkSession, dir: String) = Tables(s, dir)

  val defs: Seq[QueryDef] = Seq(
    // Clickstream sessionization via the NATIVE session_window
    // operator (30-minute inactivity gap, per user). Semantics pinned
    // cross-engine: Spark merges an event into the running session
    // while ts < prev_ts + gap, so a gap of EXACTLY 30 minutes starts
    // a new session — the oracle replays `diff >= gap` gaps-and-
    // islands on the same micro-floored timestamps. Session bounds
    // are reported as min/max event time (window.start == min ts;
    // window.end pads the gap, so it is not emitted). total_value
    // folds in exact decimal (order-independent).
    QueryDef(
      "q_sessionize_events",
      (s, dir) => {
        val e = T(s, dir).events
          .select(col("user_id"), col("ts"), col("event_type"), col("value"))
        e.groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
          .agg(
            count(lit(1)).as("n_events"),
            countDistinct(col("event_type")).as("n_event_types"),
            dsum(col("value")).as("total_value"),
            min(col("ts")).as("session_start"),
            max(col("ts")).as("session_end"))
          .select(
            col("user_id"),
            col("session_start"),
            col("session_end"),
            expr("(unix_micros(session_end) - unix_micros(session_start)) div 1000000")
              .as("duration_sec"),
            col("n_events"),
            col("n_event_types"),
            col("total_value"))
      },
      Some("""
        WITH e AS (
          SELECT user_id, ts, epoch_ns(ts) // 1000 AS us, event_type, value FROM events
        ),
        marked AS (
          SELECT *,
            CASE WHEN us - LAG(us) OVER (PARTITION BY user_id ORDER BY us, event_type)
                      >= 1800000000 OR
                 LAG(us) OVER (PARTITION BY user_id ORDER BY us, event_type) IS NULL
                 THEN 1 ELSE 0 END AS is_new
          FROM e
        ),
        sess AS (
          SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY us, event_type
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
          FROM marked
        )
        SELECT user_id,
          make_timestamp(MIN(us)) AS session_start,
          make_timestamp(MAX(us)) AS session_end,
          (MAX(us) - MIN(us)) // 1000000 AS duration_sec,
          COUNT(*) AS n_events,
          CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_event_types,
          CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        FROM sess
        GROUP BY user_id, session_idx
      """)
    ),
    // Hierarchical revenue rollup region -> nation -> grand total via
    // ROLLUP grouping sets with grouping_id. Dims broadcast onto the
    // orders->customer shuffle join; the grouping-set expansion rides
    // the single aggregation (partial agg applies per set).
    QueryDef(
      "q_rollup_region_nation",
      (s, dir) => {
        val t = T(s, dir)
        val joined = t.orders
          .join(t.customer.select(col("c_custkey"), col("c_nationkey")),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(t.nation.select(col("n_nationkey"), col("n_name"), col("n_regionkey"))),
            col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(t.region.select(col("r_regionkey"), col("r_name"))),
            col("n_regionkey") === col("r_regionkey"))
        joined
          .rollup(col("r_name"), col("n_name"))
          .agg(
            grouping_id().cast("long").as("gid"),
            count(lit(1)).as("n_orders"),
            dsum(col("o_totalprice")).as("revenue"))
          .select(col("r_name").as("region_name"), col("n_name").as("nation_name"),
            col("gid"), col("n_orders"), col("revenue"))
      },
      Some("""
        SELECT r.r_name AS region_name, n.n_name AS nation_name,
          CAST(GROUPING(r.r_name, n.n_name) AS BIGINT) AS gid,
          COUNT(*) AS n_orders,
          CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY ROLLUP(r.r_name, n.n_name)
      """)
    )
  )
}

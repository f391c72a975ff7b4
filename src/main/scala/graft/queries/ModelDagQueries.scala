package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.runtime.{ModelRegistry, Tables}
import graft.runtime.ModelRegistry.{Materialization, ModelDef}

/** End-to-end oracle check of the dbt-style model DAG (SURVEY §3.1;
  * ref `dbt_project/dbt_project.yml:30-57` + Dagster's topological
  * execution in `macro_agents/.../transformation/dbt.py:247-253`):
  * staging views feed a Table-tier fact, which feeds an
  * Incremental-tier mart — run TWICE over disjoint date batches so the
  * second run exercises the MERGE path against the first run's
  * materialized table, exactly like an incremental dbt model
  * processing its next partition.
  *
  * The final mart is plain SQL over the inputs (batch-2 rows replace
  * batch-1 rows per customer key), so the whole DAG engine —
  * topological order, per-tier materialization, merge semantics —
  * sits behind the same DuckDB hash gate as any relational operator.
  */
object ModelDagQueries {

  private val Cutoff = "1995-07-01"

  private def dag(s: SparkSession, dir: String, pred: Column): ModelRegistry = {
    val t = Tables(s, dir)
    new ModelRegistry()
      .register(ModelDef("stg_orders", Nil, Materialization.View, _ =>
        t.orders
          .select(col("o_orderkey"), col("o_custkey"),
            to_date(col("o_orderdate")).as("od"))
          .filter(pred)))
      .register(ModelDef("stg_lineitem", Nil, Materialization.View, _ =>
        t.lineitem.select(
          col("l_orderkey"),
          (col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast(DecimalType(18, 6)).as("rev"))))
      .register(ModelDef("fct_order_revenue",
        Seq("stg_orders", "stg_lineitem"), Materialization.Table, deps =>
        deps("stg_orders")
          .join(deps("stg_lineitem"), col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("o_orderkey"), col("o_custkey"), col("od"))
          .agg(sum(col("rev")).as("order_rev"), count(lit(1)).as("n_items"))))
      .register(ModelDef("mart_customer_revenue",
        Seq("fct_order_revenue"),
        Materialization.Incremental(Seq("custkey"), Seq(col("last_order_date").desc)),
        deps =>
          deps("fct_order_revenue")
            .groupBy(col("o_custkey").as("custkey"))
            .agg(
              count(lit(1)).as("n_orders"),
              round(sum(col("order_rev")), 2).cast("double").as("total_revenue"),
              max(col("od")).as("last_order_date"))))
  }

  private def martTwoBatches(s: SparkSession, dir: String): DataFrame = {
    // fresh warehouse per evaluation: the query is pure from the
    // caller's perspective (Bench runs it repeatedly) even though the
    // DAG's Table/Incremental tiers write durable parquet inside
    val wh = java.nio.file.Files.createTempDirectory("graft-dag-").toString
    dag(s, dir, col("od") < to_date(lit(Cutoff))).run(s, wh) // initial full write
    val second = dag(s, dir, col("od") >= to_date(lit(Cutoff))).run(s, wh)
    require(second.order == Seq("stg_lineitem", "stg_orders",
      "fct_order_revenue", "mart_customer_revenue"),
      s"unexpected topological order: ${second.order}")
    second.frames("mart_customer_revenue")
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_model_dag_mart",
      (s, dir) => martTwoBatches(s, dir),
      Some(s"""
        WITH rev AS (
          SELECT l_orderkey,
                 CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)) AS rev
          FROM lineitem
        ),
        fct AS (
          SELECT o.o_orderkey, o.o_custkey, CAST(o.o_orderdate AS DATE) AS od,
                 SUM(rev.rev) AS order_rev
          FROM orders o JOIN rev ON o.o_orderkey = rev.l_orderkey
          GROUP BY 1, 2, 3
        ),
        m1 AS (
          SELECT o_custkey AS custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
                 CAST(ROUND(SUM(order_rev), 2) AS DOUBLE) + 0.0 AS total_revenue,
                 MAX(od) AS last_order_date
          FROM fct WHERE od < DATE '$Cutoff' GROUP BY 1
        ),
        m2 AS (
          SELECT o_custkey AS custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
                 CAST(ROUND(SUM(order_rev), 2) AS DOUBLE) + 0.0 AS total_revenue,
                 MAX(od) AS last_order_date
          FROM fct WHERE od >= DATE '$Cutoff' GROUP BY 1
        )
        SELECT custkey, n_orders, total_revenue, last_order_date FROM m2
        UNION ALL
        SELECT custkey, n_orders, total_revenue, last_order_date FROM m1
        WHERE custkey NOT IN (SELECT custkey FROM m2)
      """)
    )
  )
}

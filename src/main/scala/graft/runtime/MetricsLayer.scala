package graft.runtime

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Declarative metrics/semantic layer (SURVEY.md §1.1, §2.M; refs
  * dbt_project/models/metrics.yml, saved_queries.yml,
  * semantic_layer/semantic_models.yml): named measures over a fact
  * frame, resolved into one groupBy at query time — the thin Scala
  * equivalent of the reference's metric name -> aggregate mapping.
  */
object MetricsLayer {

  final case class Metric(name: String, agg: Column, description: String)

  /** Exact, order-independent money sum (matches QueryDef.dsum). */
  private def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 6))).cast("double")

  /** Metric registry over the lineitem fact grain. */
  val lineitemMetrics: Map[String, Metric] = Seq(
    Metric("gross_revenue", round(dsum(col("l_extendedprice")), 4), "sum of extended price"),
    Metric("net_revenue",
      round(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4),
      "discounted revenue"),
    Metric("total_quantity", round(dsum(col("l_quantity")), 4), "sum of quantity"),
    Metric("order_count", countDistinct(col("l_orderkey")), "distinct orders"),
    Metric("line_count", count(lit(1)), "fact rows"),
    Metric("avg_discount",
      round(dsum(col("l_discount")) / count(col("l_discount")), 4),
      "mean discount rate")
  ).map(m => m.name -> m).toMap

  /** Resolve a saved query: named metrics grouped by dimensions. */
  def query(fact: DataFrame, metricNames: Seq[String], dims: Seq[Column]): DataFrame = {
    val aggs = metricNames.map { n =>
      val m = lineitemMetrics.getOrElse(n, throw new IllegalArgumentException(s"unknown metric: $n"))
      m.agg.as(m.name)
    }
    fact.groupBy(dims: _*).agg(aggs.head, aggs.tail: _*)
  }
}

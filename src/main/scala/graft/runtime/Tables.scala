package graft.runtime

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver-generated parquet corpus (TESTDATA.md).
  *
  * All reads go through `spark.read.parquet` so Catalyst gets full
  * predicate pushdown + column pruning into the vectorized parquet
  * scan. On a real cluster the same API reads a partitioned lake
  * layout unchanged.
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")
  /** events.parquet carries TIMESTAMP(NANOS), which Spark's reader
    * rejects by default; read the raw nanos as long and rebuild a
    * microsecond timestamp (Spark's native resolution). */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t("events").withColumn(
      "ts",
      timestamp_micros(expr("ts div 1000"))
    )
  }
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}

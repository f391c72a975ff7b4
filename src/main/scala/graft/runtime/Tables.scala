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
  /** events.parquet has shipped with two timestamp layouts across
    * corpus drops; normalize either (see [[Tables.normalizeEventTs]]). */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Tables.normalizeEventTs(t("events"))
  }
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}

object Tables {
  import org.apache.spark.sql.types.{LongType, TimestampNTZType}

  /** events.parquet has carried TIMESTAMP(NANOS) — which Spark's
    * reader rejects unless read as raw nanos longs under
    * `spark.sql.legacy.parquet.nanosAsLong` — and, in newer corpus
    * drops, TIMESTAMP(MICROS, isAdjustedToUTC=false) which Spark
    * reads natively as TIMESTAMP_NTZ. Dispatch on the landed type and
    * normalize both to a session-TZ microsecond timestamp (identical
    * wall-clock — all sessions run UTC), so every downstream consumer
    * sees one `ts` contract regardless of which drop it reads. */
  def normalizeEventTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    case TimestampNTZType => df.withColumn("ts", col("ts").cast("timestamp"))
    case _                => df
  }
}

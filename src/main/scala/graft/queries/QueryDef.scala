package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One verifiable engine capability: a Spark query over the testdata
  * tables plus (when SQL-expressible) an equivalent DuckDB oracle.
  *
  * Oracle-parity conventions (both sides!):
  *  - float outputs rounded to 4 decimals;
  *  - large SUMs of doubles routed through DECIMAL(18,6) so the
  *    result is exact and summation-order-independent;
  *  - counts / integer outputs cast to BIGINT;
  *  - every ranking/dedup fully tie-broken by a unique key.
  */
final case class QueryDef(
    name: String,
    query: (SparkSession, String) => DataFrame,
    oracle: Option[String]
)

object QueryDef {

  /** Exact, order-independent sum of a double expression via decimal. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 6))).cast("double")

  /** Exact mean built on the decimal sum. */
  def davg(c: Column): Column =
    sum(c.cast(DecimalType(18, 6))).cast("double") / count(c)

  def r4(c: Column): Column = round(c, 4)

  /** round(x, n) with a DECIMAL(18,6) snap first: values whose intended
    * decimal expansion lands exactly on a half boundary (diffs/halves
    * of round-4 inputs, int/int ratios) round engine-dependently on
    * raw doubles; snapping to 6 decimals (error ≪ 5e-7) makes both
    * engines round the same exact decimal. Pair with [[oSnap]]. */
  def rsnap(c: Column, n: Int): Column =
    round(c.cast(DecimalType(18, 6)), n).cast("double")

  /** Oracle-side mirror of [[rsnap]] (+0.0 normalizes -0.0). */
  def oSnap(x: String, n: Int): String =
    s"CAST(ROUND(CAST($x AS DECIMAL(18,6)), $n) AS DOUBLE) + 0.0"
}

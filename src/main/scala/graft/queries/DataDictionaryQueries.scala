package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.runtime.Tables

/** Data-dictionary builder 1:1 (ref
  * macro_agents/defs/domains/data_infra.py:17-110,164-229 —
  * build_data_dictionary): per (table, column) rows carrying a
  * canonical data type, the additivity classification the semantic
  * layer uses to guard bad SUMs, and a deterministic sample of
  * distinct values (the reference's `sample_column_values` SELECT
  * DISTINCT ... LIMIT, made order-stable by sorting).
  *
  * classify_additivity replicates the reference exactly: DATE /
  * TIMESTAMP → SEMI_ADDITIVE; the additive name-pattern list wins
  * next; then the non-additive list; default NON_ADDITIVE "for
  * safety" (data_infra.py:50-78). Pattern order matters and is
  * preserved.
  *
  * Scale: one pass per table — every column's sorted-distinct sample
  * is computed in a single aggregation (collect_set per column, sort,
  * slice), not a scan per column; the dictionary output is
  * metadata-sized.
  */
object DataDictionaryQueries {

  /** ref data_infra.py:17-25 */
  private val AdditivePatterns = Seq(
    "_days", "_count", "trading_days", "positive_days", "negative_days",
    "neutral_days", "period_diff")

  /** ref data_infra.py:28-37 */
  private val NonAdditivePatterns = Seq(
    "_pct", "_rate", "volatility", "correlation", "_price", "win_rate",
    "avg_", "total_return")

  /** ref data_infra.py:50-78 (Spark-side, driver metadata). */
  def classifyAdditivity(columnName: String, dataType: String): String = {
    val lower = columnName.toLowerCase
    if (Seq("DATE", "TIMESTAMP", "DATETIME").contains(dataType)) "SEMI_ADDITIVE"
    else if (AdditivePatterns.exists(lower.contains)) "ADDITIVE"
    else if (NonAdditivePatterns.exists(lower.contains)) "NON_ADDITIVE"
    else "NON_ADDITIVE"
  }

  /** Spark type → the reference's canonical dictionary type names. */
  def canonicalType(dt: DataType): String = dt match {
    case _: IntegerType | _: LongType | _: ShortType => "INTEGER"
    case _: DoubleType | _: FloatType | _: DecimalType => "FLOAT"
    case _: DateType => "DATE"
    case _: TimestampType | _: TimestampNTZType => "TIMESTAMP"
    case _: ArrayType => "ARRAY"
    case _ => "VARCHAR"
  }

  private val SampleK = 5

  /** One dictionary block per table: a single aggregation computes all
    * columns' sorted-distinct samples, then explodes to one row per
    * column with the classification applied. */
  def dictionaryFor(tableName: String, df: DataFrame): DataFrame = {
    val fields = df.schema.fields.toSeq
    val sampleCols = fields.map { f =>
      array_join(
        slice(array_sort(collect_set(col(f.name).cast("string"))), 1, SampleK),
        ", ").as(s"__s_${f.name}")
    }
    val sampled = df.agg(sampleCols.head, sampleCols.tail: _*)
    val rows = fields.map { f =>
      val ct = canonicalType(f.dataType)
      struct(
        lit(f.name).as("column_name"),
        lit(ct).as("data_type"),
        lit(classifyAdditivity(f.name, ct)).as("additivity"),
        col(s"__s_${f.name}").as("sample_values"))
    }
    sampled
      .select(explode(array(rows: _*)).as("c"))
      .select(lit(tableName).as("table_name"), col("c.column_name"),
        col("c.data_type"), col("c.additivity"), col("c.sample_values"))
  }

  // Static canonical schemas of the dictionary-covered corpus tables
  // (TESTDATA.md); the oracle hardcodes the same triples, so a driver
  // schema drift fails loudly as a hash mismatch.
  private val Corpus: Seq[(String, Seq[(String, String)])] = Seq(
    "region" -> Seq("r_regionkey" -> "INTEGER", "r_name" -> "VARCHAR"),
    "nation" -> Seq("n_nationkey" -> "INTEGER", "n_name" -> "VARCHAR",
      "n_regionkey" -> "INTEGER"),
    "customer" -> Seq("c_custkey" -> "INTEGER", "c_name" -> "VARCHAR",
      "c_nationkey" -> "INTEGER", "c_acctbal" -> "FLOAT",
      "c_mktsegment" -> "VARCHAR"),
    "supplier" -> Seq("s_suppkey" -> "INTEGER", "s_name" -> "VARCHAR",
      "s_nationkey" -> "INTEGER", "s_acctbal" -> "FLOAT"),
    "part" -> Seq("p_partkey" -> "INTEGER", "p_name" -> "VARCHAR",
      "p_brand" -> "VARCHAR", "p_type" -> "VARCHAR", "p_size" -> "INTEGER",
      "p_retailprice" -> "FLOAT"),
    "orders" -> Seq("o_orderkey" -> "INTEGER", "o_custkey" -> "INTEGER",
      "o_orderstatus" -> "VARCHAR", "o_totalprice" -> "FLOAT",
      "o_orderdate" -> "TIMESTAMP", "o_orderpriority" -> "VARCHAR"),
    "lineitem" -> Seq("l_orderkey" -> "INTEGER", "l_partkey" -> "INTEGER",
      "l_suppkey" -> "INTEGER", "l_linenumber" -> "INTEGER",
      "l_quantity" -> "FLOAT", "l_extendedprice" -> "FLOAT",
      "l_discount" -> "FLOAT", "l_tax" -> "FLOAT",
      "l_returnflag" -> "VARCHAR", "l_linestatus" -> "VARCHAR",
      "l_shipdate" -> "TIMESTAMP"),
    "documents" -> Seq("doc_id" -> "INTEGER", "text" -> "VARCHAR",
      "lang" -> "VARCHAR", "source" -> "VARCHAR", "n_chars" -> "INTEGER"))

  private def oracleBlock(table: String, cols: Seq[(String, String)]): String =
    cols.map { case (c, t) =>
      val add = classifyAdditivity(c, t)
      // cast through Spark-compatible string rendering: DOUBLE via
      // CAST .. AS VARCHAR in DuckDB prints like Spark for the raw
      // 2-decimal corpus values; timestamps need the space-separated
      // seconds form Spark uses
      val render =
        if (t == "TIMESTAMP")
          s"STRFTIME($c, '%Y-%m-%d %H:%M:%S')"
        else s"CAST($c AS VARCHAR)"
      s"""SELECT '$table' AS table_name, '$c' AS column_name,
        '$t' AS data_type, '$add' AS additivity,
        (SELECT ARRAY_TO_STRING(LIST(v ORDER BY v), ', ') FROM
          (SELECT DISTINCT $render AS v FROM $table
           WHERE $render IS NOT NULL ORDER BY v LIMIT $SampleK))
          AS sample_values"""
    }.mkString("\n      UNION ALL\n      ")

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_data_dictionary",
      (s, dir) => {
        val t = Tables(s, dir)
        val frames = Map[String, DataFrame](
          "region" -> t.region, "nation" -> t.nation, "customer" -> t.customer,
          "supplier" -> t.supplier, "part" -> t.part, "orders" -> t.orders,
          "lineitem" -> t.lineitem, "documents" -> t.documents)
        Corpus.map { case (name, cols) =>
          // project to the declared columns so schema drift is caught
          dictionaryFor(name, frames(name).select(cols.map(c => col(c._1)): _*))
        }.reduce(_ unionAll _)
      },
      Some(Corpus.map { case (name, cols) => oracleBlock(name, cols) }
        .mkString("\n      UNION ALL\n      "))
    )
  )
}

package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.XmlSources

/** Treasury-feed XML ingestion, oracle-checked by ROUND-TRIP: the
  * engine renders each bar day as the feed's `<m:properties>` fragment
  * (with deterministic missing/blank tenors), parses it back through
  * [[XmlSources.parseTreasuryProperties]], and must land on exactly
  * the values the DuckDB oracle computes relationally — so the XML
  * parse + 13-tenor cast map is precisely what the hash gate checks.
  * Tenor values stay UNROUNDED: Spark's double→string shortest-repr
  * round-trips bit-exactly, so both engines compare raw doubles.
  */
object XmlQueries {

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_treasury_xml_yields",
      (s, dir) => {
        val b = ModelQueries.bars(s, dir).filter(col("symbol") === "A")
        val tenorFrags = XmlSources.TreasuryTenors.zipWithIndex.map { case (t, j) =>
          val tag  = s"d:${t.toUpperCase}"
          val gate = substring(md5(concat_ws("|", col("d").cast("string"), lit(t))), 1, 1)
          when(gate === "0", lit(s"<$tag></$tag>"))       // blank → NULL
            .when(gate === "1", lit(""))                  // missing → NULL
            .otherwise(concat(lit(s"<$tag>"),
              (col("close") / (j + 2)).cast("string"), lit(s"</$tag>")))
        }
        val frag = concat(
          lit("<m:properties><d:NEW_DATE>") +: col("d").cast("string") +:
            lit("T00:00:00</d:NEW_DATE>") +: tenorFrags :+ lit("</m:properties>"): _*)
        XmlSources.parseTreasuryProperties(
          b.select(col("d"), frag.as("xml")), "xml")
      },
      Some {
        val tenorCols = XmlSources.TreasuryTenors.zipWithIndex.map { case (t, j) =>
          s"""CASE WHEN SUBSTR(md5(CAST(d AS VARCHAR) || '|' || '$t'), 1, 1) IN ('0', '1')
              THEN NULL ELSE close / ${j + 2} END AS $t"""
        }.mkString(",\n          ")
        s"""
        WITH ${ModelQueries.barsSqlPublic}
        SELECT d AS date,
          $tenorCols
        FROM bars WHERE symbol = 'A'
      """
      }
    )
  )
}

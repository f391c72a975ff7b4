package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** XML source parsing (SURVEY.md §2.A row 10; ref macro_agents
  * macro.py:110-204 — the Treasury.gov daily yield-curve feed): each
  * `<entry>` carries an OData `<m:properties>` block with
  * `<d:NEW_DATE>` and the 13 `<d:BC_*>` tenor elements; missing or
  * blank elements become NULL, values get a safe float cast.
  *
  * Spark-native: `from_xml` against an explicit schema (namespace
  * prefixes kept verbatim as field names), `cast("double")` as the
  * try-float (non-numeric → NULL, matching the reference's
  * try/except), one codegen'd projection — no UDF, no driver work.
  */
object XmlSources {

  /** The 13 tenors, in feed order (macro.py:35-49). */
  val TreasuryTenors: Seq[String] = Seq(
    "bc_1month", "bc_2month", "bc_3month", "bc_4month", "bc_6month",
    "bc_1year", "bc_2year", "bc_3year", "bc_5year", "bc_7year",
    "bc_10year", "bc_20year", "bc_30year")

  /** Everything parses as string first; the cast map is applied after
    * extraction (the reference's float() with try/except). */
  val treasuryPropertiesSchema: StructType = StructType(
    StructField("d:NEW_DATE", StringType) +:
      TreasuryTenors.map(t => StructField(s"d:${t.toUpperCase}", StringType)))

  /** Parse one `<m:properties>` fragment per row into
    * (date, bc_1month..bc_30year). `try_cast` is the reference's
    * try: float() except: None — blank/malformed → NULL (plain cast
    * throws under ANSI mode). */
  def parseTreasuryProperties(df: DataFrame, xmlCol: String): DataFrame = {
    val parsed = df.withColumn("__p",
      from_xml(col(xmlCol), treasuryPropertiesSchema,
        java.util.Collections.emptyMap[String, String]()))
    parsed.select(
      to_date(split(col("__p.`d:NEW_DATE`"), "T").getItem(0)).as("date") +:
        TreasuryTenors.map(t =>
          col(s"__p.`d:${t.toUpperCase}`").try_cast("double").as(t)): _*)
  }
}

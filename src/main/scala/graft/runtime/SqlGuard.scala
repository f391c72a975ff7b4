package graft.runtime

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.{Command, InsertIntoStatement, LogicalPlan, ParsedStatement}

/** Read-only SQL entry point (SURVEY.md §3.3; ref
  * analysis/ai/nl_to_sql_module.py:100-125 — sqlglot-based validator
  * rejecting non-SELECT / mutating statements before execution).
  *
  * Spark equivalent: parse with Catalyst, reject any Command /
  * insert / mutating node BEFORE analysis or execution, then hand the
  * text to spark.sql. This is the guard an NL->SQL or MCP consumer
  * path calls.
  */
object SqlGuard {

  final class NonSelectStatementException(msg: String) extends IllegalArgumentException(msg)

  private def isMutating(plan: LogicalPlan): Boolean = plan match {
    case _: Command             => true
    case _: InsertIntoStatement => true
    case p: ParsedStatement =>
      // Unresolved DDL/DML statements (CREATE/DROP/MERGE/UPDATE/...)
      // parse to ParsedStatement subclasses other than plain queries.
      !p.nodeName.startsWith("Select")
    case _ => false
  }

  /** Throws [[NonSelectStatementException]] unless `sql` parses to a
    * pure query; otherwise runs it. */
  def readOnly(spark: SparkSession, sql: String): DataFrame = {
    val parsed = spark.sessionState.sqlParser.parsePlan(sql)
    val bad    = parsed.collectFirst { case p if isMutating(p) => p }
    bad.foreach { p =>
      throw new NonSelectStatementException(
        s"read-only SQL entry rejected statement node ${p.nodeName}"
      )
    }
    spark.sql(sql)
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Warehouse-side write semantics from SURVEY.md §2.A: MERGE upsert,
  * SCD Type-2 dimension maintenance, schema-aligned append. On plain
  * parquet these are expressed as dedup-union rewrites (the Delta
  * MERGE fast path is a drop-in swap when a transactional format is
  * available); the transformations themselves are pure DataFrame ops
  * so they distribute and test like any other operator.
  */
object SinkOps {

  /** MERGE upsert semantics (ref bigquery_warehouse.py:124-179):
    * source rows win on key collision; source is first deduped to one
    * row per key by `precedence` (a descending sort spec) so the
    * result is deterministic. Result = matched-updated + unmatched-
    * kept + inserted.
    */
  def mergeUpsert(
      target: DataFrame,
      source: DataFrame,
      keys: Seq[String],
      precedence: Seq[Column]
  ): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(precedence: _*)
    val dedupedSource = source
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
    target.join(dedupedSource, keys, "left_anti").unionByName(dedupedSource)
  }

  /** Schema-aligned append (ref bigquery_warehouse.py:310-349): pad
    * missing columns with NULL on both sides, then append. */
  def alignedUnion(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b, allowMissingColumns = true)

  /** Incremental partition-overwrite write: replaces exactly the
    * partitions present in `updates`, leaving every other partition
    * untouched — the parquet-native fast path for the reference's
    * incremental MERGE story (bigquery_warehouse.py:124-179) when the
    * grain of change is a partition (ingest date, symbol-month, ...).
    * Unlike the dedup-union rewrite this never reads or rewrites the
    * untouched data, and re-running the same batch is idempotent.
    * At cluster scale this is the insert_overwrite strategy every
    * incremental model wants: cost ∝ changed partitions, not table
    * size. The mode is set per-WRITER (DataFrameWriter option takes
    * precedence over the session conf), so concurrent writes on the
    * same session are unaffected — no session-conf mutate/restore.
    */
  def overwritePartitions(
      updates: DataFrame,
      path: String,
      partitionCols: Seq[String]
  ): Unit =
    updates.write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** SCD Type-2 apply (ref markets/assets.py:87-224): given the current
    * dimension (with dateStarted/dateEnded, NULL dateEnded = active)
    * and a fresh full snapshot, close rows whose attributes changed or
    * that left the snapshot, keep unchanged actives, and open new rows.
    *
    * `asOfDate` stamps both closures and openings. Attribute equality
    * is null-safe (<=>).
    */
  def scd2Apply(
      current: DataFrame,
      snapshot: DataFrame,
      keys: Seq[String],
      attrs: Seq[String],
      asOfDate: String,
      dateStarted: String = "date_started",
      dateEnded: String = "date_ended"
  ): DataFrame = {
    val active  = current.filter(col(dateEnded).isNull)
    val closed  = current.filter(col(dateEnded).isNotNull)
    val snap    = snapshot.select((keys ++ attrs).map(col): _*)

    val joined = active.alias("cur").join(
      snap.alias("new"),
      keys.map(k => col(s"cur.$k") === col(s"new.$k")).reduce(_ && _),
      "full_outer"
    )
    val keyPresent  = keys.map(k => col(s"new.$k").isNotNull).reduce(_ && _)
    val curPresent  = keys.map(k => col(s"cur.$k").isNotNull).reduce(_ && _)
    val attrsEqual  =
      if (attrs.isEmpty) lit(true)
      else attrs.map(a => col(s"cur.$a") <=> col(s"new.$a")).reduce(_ && _)

    // unchanged active rows survive as-is
    val unchanged = joined
      .filter(curPresent && keyPresent && attrsEqual)
      .select(active.columns.toIndexedSeq.map(c => col(s"cur.$c").as(c)): _*)
    // changed or departed rows get closed
    val toClose = joined
      .filter(curPresent && (!keyPresent || !attrsEqual))
      .select(active.columns.toIndexedSeq.map(c => col(s"cur.$c").as(c)): _*)
      .withColumn(dateEnded, to_date(lit(asOfDate)))
    // new or changed keys open a fresh active row
    val toOpen = joined
      .filter(keyPresent && (!curPresent || !attrsEqual))
      .select((keys ++ attrs).map(c => col(s"new.$c").as(c)): _*)
      .withColumn(dateStarted, to_date(lit(asOfDate)))
      .withColumn(dateEnded, lit(null).cast("date"))

    val openCols = closed.columns
    closed
      .unionByName(unchanged)
      .unionByName(toClose)
      .unionByName(toOpen.select(openCols.toIndexedSeq.map(c => col(c)): _*))
  }

  // ------------------------------------------------------------------
  // Warehouse hygiene 1:1 (ref resources/bigquery_warehouse.py)
  // ------------------------------------------------------------------

  /** ref bigquery_warehouse.py:21,33-37 — identifier validation before
    * any name is interpolated into SQL; up to three dot-separated
    * plain-identifier segments (project.dataset.table). */
  private val IdentifierRe =
    "^[A-Za-z_][A-Za-z0-9_]*(\\.[A-Za-z_][A-Za-z0-9_]*){0,2}$".r

  def validateIdentifier(name: String, kind: String = "identifier"): String = {
    if (name == null || IdentifierRe.findFirstIn(name).isEmpty)
      throw new IllegalArgumentException(s"Invalid $kind: $name")
    name
  }

  /** ref bigquery_warehouse.py:22-30,40-42 — alias-collapsed canonical
    * type names, used by drift repair below. */
  private val TypeAliases = Map(
    "BOOL" -> "BOOL", "BOOLEAN" -> "BOOL",
    "DOUBLE" -> "FLOAT64", "FLOAT" -> "FLOAT64", "FLOAT64" -> "FLOAT64",
    "INT64" -> "INT64", "INTEGER" -> "INT64", "BIGINT" -> "INT64",
    "LONG" -> "INT64", "STRING" -> "STRING", "VARCHAR" -> "STRING")

  def canonicalType(typeName: String): String = {
    val up = typeName.toUpperCase
    TypeAliases.getOrElse(up, up)
  }

  private val SparkTypeFor = Map(
    "BOOL" -> "boolean", "FLOAT64" -> "double", "INT64" -> "long",
    "STRING" -> "string", "DATE" -> "date", "TIMESTAMP" -> "timestamp")

  /** normalize_column_types 1:1 (ref bigquery_warehouse.py:181-244):
    * repair ONLY the requested columns whose current type drifted from
    * the desired canonical type, via try_cast (the reference's
    * SAFE_CAST — bad cells become NULL, never a failed job), leaving
    * every other column untouched. Returns the repaired frame plus the
    * mismatched column names (empty → frame returned unchanged). */
  def normalizeColumnTypes(df: DataFrame,
                           desired: Map[String, String]): (DataFrame, Seq[String]) = {
    val mismatched = df.schema.fields.collect {
      case f if desired.contains(f.name) &&
        canonicalType(f.dataType.sql) != canonicalType(desired(f.name)) => f.name
    }.toSeq
    if (mismatched.isEmpty) (df, Nil)
    else {
      val repaired = df.select(df.columns.toIndexedSeq.map { c =>
        if (mismatched.contains(c)) {
          val target = SparkTypeFor.getOrElse(canonicalType(desired(c)),
            throw new IllegalArgumentException(
              s"normalizeColumnTypes: unsupported target type '${desired(c)}' for column $c; " +
                s"supported canonical types: ${SparkTypeFor.keys.toSeq.sorted.mkString(", ")}"))
          expr(s"try_cast(`$c` AS $target)").as(c)
        } else col(c)
      }: _*)
      (repaired, mismatched)
    }
  }
}

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

  /** Ingest compaction for the fact tables. The corpus ships each
    * table as ONE parquet file with ONE row group — and a row group is
    * the parquet unit of scan parallelism, so every lineitem pass
    * decodes 600k rows in a single task no matter how many cores the
    * session has (measured 0.85 s vs 0.45 s per aggregate pass at
    * sf0.1). Standard lake maintenance answer: re-layout once on first
    * touch into a multi-file scratch copy and read that — the same
    * compaction pass any warehouse runs after a bulky single-writer
    * ingest. Keyed by source (mtime, size) so a regenerated corpus
    * drop recompacts; written to a temp dir then atomically renamed so
    * concurrent sessions race safely; small sources (every table at
    * sf≤0.01) skip it entirely. At 100 TB this step is moot — the lake
    * writer itself would emit properly sized files/row groups (or
    * bucketed tables; see ScaleSpecs' bucketing gates) — but a reader
    * must not inherit a bad layout it can fix once. */
  private def compacted(name: String): DataFrame = {
    val src = new java.io.File(s"$dir/$name.parquet")
    if (!src.isFile || src.length < Tables.CompactMinBytes) t(name)
    else {
      val key = java.lang.Long.toHexString(src.lastModified() ^ src.length() * 1315423911L)
      val dst = new java.io.File(Tables.compactRoot, s"$name-$key")
      if (!dst.isDirectory) Tables.synchronized {
        if (!dst.isDirectory) {
          val tmp = new java.io.File(dst.getParentFile, s".${dst.getName}.tmp-${ProcessHandle.current.pid}")
          spark.read.parquet(src.getPath)
            .repartition(Tables.CompactFiles)
            .write.mode("overwrite").parquet(tmp.getPath)
          if (!tmp.renameTo(dst)) Tables.deleteRecursively(tmp) // lost a cross-process race: winner's copy is identical
          else Tables.pruneStale(name, dst.getName) // superseded corpus drops + crashed writers
        }
      }
      spark.read.parquet(dst.getPath)
    }
  }

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = compacted("orders")
  def lineitem: DataFrame   = compacted("lineitem")
  /** events.parquet has shipped with two timestamp layouts across
    * corpus drops; normalize either (see [[Tables.normalizeEventTs]]).
    * Compacted like the other fact tables (the nanos layout lands as a
    * plain LONG column in the scratch copy, the NTZ layout as
    * TIMESTAMP_NTZ — normalizeEventTs dispatches on whichever the
    * re-read infers, same as for the raw file). Layout safety: every
    * consumer's result hash-matches a DuckDB oracle that reads the
    * ORIGINAL file in its own order, so results are already proven
    * row-order-independent. */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Tables.normalizeEventTs(compacted("events"))
  }
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}

object Tables {
  import org.apache.spark.sql.types.{LongType, TimestampNTZType}

  /** Compact only sources big enough for layout to matter (below
    * ~1.5 MB a single decode task is already sub-100 ms and the
    * rewrite would cost more than it saves — everything at sf≤0.01
    * skips; at sf0.1 orders/lineitem/events all clear the floor). */
  private val CompactMinBytes = 3L * 512 * 1024
  private val CompactFiles    = 16

  private lazy val compactRoot: java.io.File = {
    val d = new java.io.File(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft-compact")
    d.mkdirs()
    d
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(deleteRecursively)
    f.delete(): Unit
  }

  /** Scratch hygiene, run after a successful compaction (ADVICE r6):
    * the driver regenerates testdata between rounds, so every corpus
    * drop minted a new (mtime, size) key and the old copies — plus
    * any `.tmp-<pid>` debris from crashed writers — accumulated
    * unboundedly. Deletes this table's dirs under any OTHER key, and
    * its tmp dirs older than an hour (a live concurrent writer's tmp
    * is younger; the rename-loser already removes its own). */
  private def pruneStale(name: String, keep: String): Unit = {
    val siblings = compactRoot.listFiles()
    if (siblings == null) return
    val cutoff = System.currentTimeMillis() - 60L * 60 * 1000
    siblings.foreach { f =>
      val n = f.getName
      val superseded = n.startsWith(s"$name-") && n != keep
      val crashedTmp = n.startsWith(s".$name-") && n.contains(".tmp-") &&
        f.lastModified() < cutoff
      if (superseded || crashedTmp) deleteRecursively(f)
    }
  }

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

package graft.runtime

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Local-mode defaults are tuned for the test harness (local[32],
  * 128 GiB single JVM) but every setting is cluster-safe: AQE handles
  * runtime re-planning (skew joins, partition coalescing) on a real
  * 1000-executor deployment, and shuffle partitions are only pinned
  * when the caller runs local mode.
  */
object GraftSession {

  /** Build (or reuse) a SparkSession with graft defaults applied. */
  def get(master: Option[String] = None, shufflePartitions: Int = 32): SparkSession = {
    val b = SparkSession
      .builder()
      .appName("graft")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // Exact ANSI-ish arithmetic disabled: reference (BigQuery) uses
      // SAFE_* everywhere; we map those explicitly via try_* functions.
      .config("spark.sql.ansi.enabled", "false")
      // native vec_dot/vec_cosine expressions (SimilarityOps falls
      // back to the composable form when absent, but library sessions
      // should get the codegen path)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      // keep catalog/warehouse artifacts out of the repo working dir
      .config(
        "spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft-warehouse"
      )
      .config("spark.ui.enabled", "false")
    master.foreach(b.master)
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Local test session (used by ScalaTest suites). */
  lazy val local: SparkSession = get(Some("local[4]"), shufflePartitions = 4)
}

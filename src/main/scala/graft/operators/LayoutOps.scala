package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators for scan pruning at scale — the write-side
  * half of "filters reach the parquet scan". A 100 TB table is pruned
  * by file-level min/max footer stats; those stats only help when the
  * writer CLUSTERED the data. Z-ordering (Morton curve) interleaves
  * the bits of two dimensions so range-partitioning by the z-value
  * keeps BOTH dimensions locally narrow per file — the technique
  * behind Delta/Iceberg OPTIMIZE ZORDER — giving multi-dimensional
  * pruning from one sort key.
  *
  * Everything here is exact integer arithmetic (shifts, masks,
  * fixed-point scaling), bit-identical in any engine — no sketches,
  * no RNG.
  */
object LayoutOps {

  /** Morton z-value from two pre-normalized 16-bit ranks (values in
    * [0, 65535]): interleaves bits, `a` taking the odd (higher)
    * positions. Pure shift/mask arithmetic — whole-stage codegen,
    * replayable in any SQL engine. */
  def zValue16(a: Column, b: Column): Column =
    (0 until 16)
      .map { i =>
        shiftright(a, i).bitwiseAND(lit(1)).cast("long") * lit(1L << (2 * i + 1)) +
          shiftright(b, i).bitwiseAND(lit(1)).cast("long") * lit(1L << (2 * i))
      }
      .reduce(_ + _)

  /** Fixed-point min-max rank of `x` onto [0, 65535]:
    * floor((x − min) · 65535 / (max − min)) — exact integer multiply
    * then integer divide, so every engine lands on the same rank
    * (no double rounding anywhere). Degenerate constant column → 0.
    * min/max ride a global aggregate broadcast back onto the rows.
    * (At extreme scale, swap the exact min/max for approximate bounds
    * or pre-known partition bounds; the z-math is unchanged.) */
  def minMaxRank16(x: Column, xMin: Column, xMax: Column): Column = {
    // Column./ is DOUBLE division; integer-exact floor-div is built as
    // (num - num mod d) / d — the numerator is then an exact multiple
    // of d and the quotient (≤ 65535) is exactly representable, so the
    // one double division is exact. Valid while (x−min)·65535 < 2^53.
    val num = (x - xMin).cast("long") * 65535L
    val d   = (xMax - xMin).cast("long")
    when(xMax > xMin, ((num - pmod(num, d)) / d).cast("long"))
      .otherwise(lit(0L)).cast("int")
  }

  /** Z-order clustering audit: normalize two integer dimensions to
    * 16-bit ranks, z-interleave, bin rows into `nBuckets` equal-WIDTH
    * z ranges (bucket = z·nBuckets >> 32 — pure integer math, no
    * global sort), and report each bin's per-dimension min/max span:
    * the numbers a reader's file-pruning sees. Narrow spans on BOTH
    * dimensions = both predicates prune.
    *
    * Cost shape: one global min/max agg broadcast back, one map to
    * compute z, one groupBy(bucket) — no window, no sort, no skew
    * hazard. A production z-ordered WRITE replaces the groupBy with
    * `repartitionByRange(nBuckets, $"__z")` + sortWithinPartitions
    * before `.write` (equal-depth via range sampling, which is not
    * byte-deterministic — hence the fixed-width audit here). */
  def zorderAudit(
      df: DataFrame,
      dimA: String,
      dimB: String,
      nBuckets: Int): DataFrame = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    val bounds = df.agg(
      min(col(dimA)).as("__amin"), max(col(dimA)).as("__amax"),
      min(col(dimB)).as("__bmin"), max(col(dimB)).as("__bmax"))
    df
      .select(col(dimA).cast("long").as("__a"), col(dimB).cast("long").as("__b"))
      .crossJoin(broadcast(bounds))
      .select(col("__a"), col("__b"),
        zValue16(
          minMaxRank16(col("__a"), col("__amin").cast("long"), col("__amax").cast("long")),
          minMaxRank16(col("__b"), col("__bmin").cast("long"), col("__bmax").cast("long")))
          .as("__z"))
      .withColumn("bucket", expr(s"(__z * $nBuckets) div 4294967296L").cast("long"))
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("n_rows"),
        min(col("__a")).as(s"${dimA}_min"), max(col("__a")).as(s"${dimA}_max"),
        min(col("__b")).as(s"${dimB}_min"), max(col("__b")).as(s"${dimB}_max"),
        min(col("__z")).as("z_min"), max(col("__z")).as("z_max"))
  }
}

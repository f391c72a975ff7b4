package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation join helpers (SURVEY.md §4 / prompt scale notes:
  * "skewed keys -> salting or AQE skew-join"). AQE's skew-join split
  * handles most cases at runtime; explicit salting is for the
  * pathological hot-key joins AQE cannot split (e.g. a single key
  * holding >1 executor's worth of build side).
  */
object SkewOps {

  /** Salted equi-join: the large (skewed) side gets a deterministic
    * per-row salt in [0, buckets); the small side is exploded to every
    * salt value; the join key becomes (key, salt), spreading each hot
    * key over `buckets` reducers. Result equals the plain inner join.
    *
    * The salt must NOT depend on the join key alone (that would keep
    * the hot key on one reducer) — it hashes the large side's whole
    * row.
    */
  def saltedJoin(
      large: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      buckets: Int
  ): DataFrame = {
    val salt = pmod(xxhash64(large.columns.toIndexedSeq.map(col): _*), lit(buckets)).cast("int")
    val saltedLarge = large.withColumn("__salt", salt)
    val explodedSmall = small.withColumn(
      "__salt",
      explode(sequence(lit(0), lit(buckets - 1)))
    )
    saltedLarge
      .join(explodedSmall, keys :+ "__salt")
      .drop("__salt")
  }

  /** Hot-key isolation: split the large side into hot and cold key
    * sets (hot = keys above `threshold` rows), broadcast-join the hot
    * subset, shuffle-join the rest, union. Deterministic alternative
    * when the small side is broadcastable only for the hot keys. */
  def hotKeySplitJoin(
      large: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      threshold: Long
  ): DataFrame = {
    val hotKeys = large
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") > threshold)
      .select(keys.map(col): _*)
    val hotLarge  = large.join(broadcast(hotKeys), keys, "left_semi")
    val coldLarge = large.join(broadcast(hotKeys), keys, "left_anti")
    hotLarge
      .join(broadcast(small), keys)
      .unionByName(coldLarge.join(small, keys))
  }

  /** Bloom-pruned join: build a Bloom filter over the SMALL side's
    * join keys (distributed treeAggregate build via
    * `DataFrameStatFunctions.bloomFilter` — mergeable, one pass), ship
    * it to the fact scan as a broadcast, and drop non-matching fact
    * rows BEFORE the shuffle. The closing exact join clears the false
    * positives, so the result is bit-identical to the plain join — the
    * bloom only moves work off the wire.
    *
    * The 100 TB rationale: when the dim side is selective (a filtered
    * dimension keeping ~1% of keys), the shuffle of the fact side is
    * the dominant cost; an `fpp`-bloom cuts shuffled fact bytes to
    * ~selectivity + fpp of the original. This is exactly what Spark's
    * own runtime row-level bloom filter
    * (`spark.sql.optimizer.runtime.bloomFilter.enabled`) injects for
    * shuffle joins on a cluster; the explicit form here also covers
    * the cases the optimizer's heuristics skip (it requires a
    * creation-side selective filter + size thresholds) and pre-shuffle
    * pruning for repeated reuse of one dim filter across many fact
    * scans. The `mightContain` call is a deterministic driver-built
    * sketch probe — scan-local, no shuffle, no skew.
    */
  def bloomPrunedJoin(
      fact: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String,
      expectedDimKeys: Long,
      fpp: Double
  ): DataFrame = {
    val bf = dim.stat.bloomFilter(dimKey, expectedDimKeys, fpp)
    val bfB = fact.sparkSession.sparkContext.broadcast(bf)
    val mightContain = udf((k: java.lang.Long) => k != null && bfB.value.mightContainLong(k))
    fact
      .filter(col(factKey).isNotNull && mightContain(col(factKey)))
      .join(dim, col(factKey) === col(dimKey))
  }
}

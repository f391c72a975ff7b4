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
}

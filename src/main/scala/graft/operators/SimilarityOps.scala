package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.cosineSimilarity

/** Similarity search over an embedding column (SURVEY.md §2.L; ref
  * macro_agents/.../sec/semantic_search.py:1-70 — ML.DISTANCE COSINE
  * top-k + keyword hybrid).
  *
  * Baseline is brute-force cosine (exact; one pass, no shuffle beyond
  * the final top-k). The scale path is [[lshBucketed]]: sign-random-
  * projection buckets so each query only scans its own bucket —
  * candidate volume drops ~2^planes-fold on 100 TB corpora.
  */
object SimilarityOps {

  /** Cast a float array column to double elements (keeps arithmetic
    * identical to a double-precision oracle). */
  def toDouble(vec: Column): Column = transform(vec, _.cast("double"))

  /** Exact brute-force top-k by cosine similarity against one query
    * vector (broadcast single-row cross join — no shuffle of the big
    * side). Ties broken by id ascending for determinism. */
  def cosineTopK(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      query: DataFrame, // single row: (qvec array<double>)
      k: Int
  ): DataFrame = {
    corpus
      .crossJoin(broadcast(query))
      .select(
        col(idCol),
        cosineSimilarity(toDouble(col(vecCol)), col("qvec")).as("cosine_sim")
      )
      .orderBy(col("cosine_sim").desc, col(idCol).asc)
      .limit(k)
  }

  /** Sign-random-projection bucket id from `planes` hyperplanes.
    * Hyperplane p's component d is a deterministic pseudo-random value
    * in [-0.5, 0.5) derived from md5(p:d) — engine-portable, no RNG
    * state. Vectors in the same bucket are cosine-close candidates. */
  def srpBucket(vec: Column, dim: Int, planes: Int): Column = {
    val bits = (0 until planes).map { p =>
      val dot = (0 until dim)
        .map { d =>
          val h = conv(substring(md5(lit(s"$p:$d")), 1, 6), 16, 10).cast("double")
          element_at(vec, d + 1) * (h / lit(16777216.0) - 0.5)
        }
        .reduce(_ + _)
      when(dot >= 0, lit(1)).otherwise(lit(0)) * lit(1 << p)
    }
    bits.reduce(_ + _)
  }

  /** Approximate top-k: restrict the scan to the query's SRP bucket,
    * then exact cosine within it. */
  def lshBucketedTopK(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      query: DataFrame,
      dim: Int,
      planes: Int,
      k: Int
  ): DataFrame = {
    val bucketed = corpus.withColumn("__bucket", srpBucket(toDouble(col(vecCol)), dim, planes))
    val q        = query.withColumn("__bucket", srpBucket(col("qvec"), dim, planes))
    bucketed
      .join(broadcast(q), Seq("__bucket"))
      .select(
        col(idCol),
        cosineSimilarity(toDouble(col(vecCol)), col("qvec")).as("cosine_sim")
      )
      .orderBy(col("cosine_sim").desc, col(idCol).asc)
      .limit(k)
  }

  /** All-pairs cosine above a threshold within groups (embedding
    * near-dup detection): pairs share a coarse key (e.g. SRP bucket)
    * so the join is band-local, never a full cross join. */
  def cosineNearDupPairs(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      planes: Int,
      minSim: Double
  ): DataFrame = {
    val bucketed = corpus
      .select(col(idCol).as("id"), toDouble(col(vecCol)).as("v"))
      .withColumn("__bucket", srpBucket(col("v"), dim, planes))
    val a = bucketed.select(col("__bucket"), col("id").as("id_a"), col("v").as("va"))
    val b = bucketed.select(col("__bucket"), col("id").as("id_b"), col("v").as("vb"))
    a.join(b, Seq("__bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), cosineSimilarity(col("va"), col("vb")).as("cosine_sim"))
      .filter(col("cosine_sim") >= minSim)
      .distinct()
  }
}

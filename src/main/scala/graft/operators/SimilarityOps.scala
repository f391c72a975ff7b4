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

  /** Cosine similarity, preferring the native codegen expression when
    * [[graft.GraftExtensions]] is installed in the session (fused
    * single-pass loop over the raw float array — no per-row array
    * allocation, stays inside whole-stage codegen). Falls back to the
    * composable zip_with/aggregate form otherwise. Both paths widen
    * float→double per element and accumulate in array order, so the
    * results are bit-identical — oracle hashes cannot depend on which
    * path ran. */
  def cosine(df: DataFrame, vec: Column, qvec: Column): Column =
    if (df.sparkSession.catalog.functionExists("vec_cosine"))
      call_function("vec_cosine", vec, qvec)
    else cosineSimilarity(toDouble(vec), qvec)

  /** Dot product with the same dispatch as [[cosine]]. */
  def dot(df: DataFrame, a: Column, b: Column): Column =
    if (df.sparkSession.catalog.functionExists("vec_dot"))
      call_function("vec_dot", a, b)
    else aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (s, x) => s + x)

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
        cosine(corpus, col(vecCol), col("qvec")).as("cosine_sim")
      )
      .orderBy(col("cosine_sim").desc, col(idCol).asc)
      .limit(k)
  }

  /** Deterministic pseudo-random hyperplanes for sign-random-projection:
    * component (p, d) is md5("p:d")'s first 24 bits mapped to
    * [-0.5, 0.5). Generated driver-side once (data-independent), so an
    * external oracle can inline the identical literals. */
  def hyperplanes(dim: Int, planes: Int): Seq[Seq[Double]] =
    (0 until planes).map { p =>
      (0 until dim).map { d =>
        val digest = java.security.MessageDigest
          .getInstance("MD5")
          .digest(s"$p:$d".getBytes("UTF-8"))
        val hex = digest.take(3).map("%02x".format(_)).mkString
        java.lang.Long.parseLong(hex, 16).toDouble / 16777216.0 - 0.5
      }.toSeq
    }

  /** Sign-random-projection bucket id: bit p = sign of dot(vec, H_p).
    * Dot products are left-associated sums of double products so an
    * external SQL oracle reproduces them bit-for-bit. Vectors in the
    * same bucket are cosine-close candidates. */
  def srpBucket(vec: Column, planes: Seq[Seq[Double]]): Column = {
    val bits = planes.zipWithIndex.map { case (h, p) =>
      val dot = h.zipWithIndex
        .map { case (w, d) => element_at(vec, d + 1).cast("double") * lit(w) }
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
      planes: Seq[Seq[Double]],
      k: Int
  ): DataFrame = {
    val bucketed = corpus.withColumn("__bucket", srpBucket(col(vecCol), planes))
    val q        = query.withColumn("__bucket", srpBucket(col("qvec"), planes))
    bucketed
      .join(broadcast(q), Seq("__bucket"))
      .select(
        col(idCol),
        cosine(corpus, col(vecCol), col("qvec")).as("cosine_sim")
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
      planes: Seq[Seq[Double]],
      minSim: Double
  ): DataFrame = {
    // Norms are computed once per vector BEFORE the pair join: the
    // O(pairs) work is then a single dot product per pair instead of
    // three array folds.
    val bucketed = corpus
      .select(col(idCol).as("id"), col(vecCol).as("__raw"))
      .withColumn("__bucket", srpBucket(col("__raw"), planes))
      .withColumn("v", toDouble(col("__raw")))
      .withColumn("norm", sqrt(dot(corpus, col("v"), col("v"))))
      .drop("__raw")
    val a = bucketed.select(col("__bucket"), col("id").as("id_a"), col("v").as("va"), col("norm").as("na"))
    val b = bucketed.select(col("__bucket"), col("id").as("id_b"), col("v").as("vb"), col("norm").as("nb"))
    val pairDot = dot(corpus, col("va"), col("vb"))
    // No distinct needed: srpBucket assigns each vector exactly ONE
    // cell, so the bucket equi-join emits every unordered pair at most
    // once — a dedup here would re-shuffle the whole pair table for
    // nothing (removing it dropped one exchange from every consumer).
    a.join(b, Seq("__bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        when(col("na") * col("nb") =!= 0.0, pairDot / (col("na") * col("nb"))).as("cosine_sim"))
      .filter(col("cosine_sim") >= minSim)
  }

  /** Int8 max-abs embedding quantization (the symmetric per-vector
    * scheme vector stores use to cut index storage 4×): scale =
    * max|x|/127, q_i = round-half-up(x_i/scale) ∈ [-127, 127].
    * Returns struct(scale DOUBLE, q ARRAY<INT>).
    *
    * Pure per-row map work — no shuffle, embarrassingly parallel at
    * any corpus size. Cross-engine parity: the fold for max|x| uses
    * exact IEEE max/abs; scale is ONE division; rounding is
    * floor(x/scale + 0.5) (identical everywhere, unlike banker's/
    * HALF_UP library rounds); so any engine replaying these ops emits
    * bit-identical q vectors. All-zero vectors get scale 0 and an
    * all-zero q. */
  def int8Quantize(vec: Column): Column = {
    val xd     = toDouble(vec)
    val maxAbs = aggregate(xd, lit(0.0), (a, x) => greatest(a, abs(x)))
    val scale  = maxAbs / lit(127.0)
    val q = transform(xd, x =>
      when(lit(0.0) < scale, floor(x / scale + lit(0.5)).cast("int")).otherwise(lit(0)))
    struct(scale.as("scale"), q.as("q"))
  }

  /** Semantic-dedup pruning decisions (SemDeDup, Abbas et al. 2023:
    * cluster embeddings, then within each cluster drop all but one of
    * every near-duplicate set). Clusters here are SRP cells — the
    * data-independent analogue of the paper's k-means partition, which
    * keeps the whole decision expressible to an external SQL oracle —
    * and the keep rule is greedy-by-id: a vector is dropped iff some
    * SMALLER id in its cell is cosine-≥-τ similar. The rule keeps
    * every vector with no cosine-similar smaller id in its cell — at
    * least one survivor per similarity component (a star component
    * 1–3, 2–3 keeps both 1 and 2), unlike SemDeDup's kept-set greedy
    * which would also prune within the kept set. The id order is
    * total, so decisions are partition-invariant.
    *
    * Returns one row per vector: its cell, the keep/drop verdict, how
    * many smaller near-dups it had, and the max similarity to one.
    *
    * Scale: the pair join is cell-local (candidate volume bounded by
    * cell population, never corpus²), the verdict join is keyed by id
    * — two shuffles total. More planes → smaller cells → tighter
    * bound, at the usual LSH recall cost across cell boundaries.
    */
  def semanticDedupDecisions(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      planes: Seq[Seq[Double]],
      minSim: Double
  ): DataFrame = {
    val pairs = cosineNearDupPairs(corpus, idCol, vecCol, planes, minSim)
    val dupStats = pairs
      .groupBy(col("id_b").as("__id"))
      .agg(
        count(lit(1)).as("n_dups_smaller"),
        max(col("cosine_sim")).as("max_sim_smaller"))
    corpus
      .select(col(idCol).as("vec_id"),
        srpBucket(col(vecCol), planes).cast("long").as("cell"))
      .join(dupStats, col("vec_id") === col("__id"), "left")
      .select(
        col("vec_id"),
        col("cell"),
        col("__id").isNull.as("kept"),
        coalesce(col("n_dups_smaller"), lit(0L)).as("n_dups_smaller"),
        round(col("max_sim_smaller"), 4).as("max_sim_smaller"))
  }
}

package graft.operators

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hashed-n-gram linear text classifier (the fastText / CCNet-style
  * curation scorer): distill a cheap rule "teacher" into a hashed
  * char-trigram logistic-regression "student", then score the whole
  * corpus with one narrow pass. This is the standard pretraining-data
  * pattern (GPT-3's WebText-similarity filter, CCNet's LM filter,
  * DoReMi's domain tagger): the teacher is only computable on some
  * slice (or is expensive), the student generalizes it corpus-wide at
  * scan speed.
  *
  * Scale shape:
  *  - `featurize` is one narrow pass (no shuffle): hashing trick into
  *    a FIXED dims-bucket space, so the feature schema is independent
  *    of corpus vocabulary — no dictionary build, no global state.
  *  - each training iteration is one explode + one map-side-combined
  *    hash shuffle of (bucket, contribution) rows, collecting dims+1
  *    partial sums to the driver (bounded by dims, not corpus) — the
  *    classic broadcast-weights/aggregate-gradient Spark loop.
  *  - scoring broadcasts the finished dims+1 weight vector; no shuffle.
  *
  * Determinism (stored-golden discipline): gradient contributions are
  * cast to DECIMAL(38,18) before summing, so the per-bucket sums are
  * exact and partitioning/merge-order independent (spec-asserted:
  * retraining on a repartitioned corpus yields the bit-identical
  * weight vector); per-row math (margin dot product over the
  * idx-sorted feature list, Math.exp) is fixed-order.
  * `tools/check_domain_lr.py` retrains the whole model in numpy and
  * must agree to float tolerance, with label/prediction counts
  * matching exactly.
  */
object TextClassifierOps {

  /** Feature scale: l1-normalized trigram frequencies are ~1/dims each
    * while the bias input is 1.0 — rescaling the text features toward
    * the bias's magnitude conditions plain gradient descent (measured:
    * unscaled never leaves the majority-class plateau; ×16 reaches
    * ~89% teacher agreement in 20 iterations). */
  val FeatureScale = 16.0

  private def bucketOf(tg: String, dims: Int): Int = {
    val md = MessageDigest.getInstance("MD5")
    val hex = md.digest(tg.getBytes(StandardCharsets.UTF_8))
      .take(6).map(b => f"$b%02x").mkString // first 12 hex chars = 48 bits
    (java.lang.Long.parseLong(hex, 16) % dims).toInt
  }

  /** Per-task memo over the (small) distinct-trigram space so the md5
    * runs once per trigram, not once per occurrence — the closure map
    * lives for the task and is a pure cache (same key → same bucket),
    * so it cannot affect results. */
  private def cachedBucketOf(cache: scala.collection.mutable.HashMap[String, Int], dims: Int)(
      tg: String): Int =
    cache.getOrElseUpdate(tg, bucketOf(tg, dims))

  /** One-pass featurization: lowercased [a-z0-9]+ pre-tokens joined by
    * single spaces, char trigrams of that normal form, md5-bucketed
    * counts l1-normalized and rescaled; the bias enters as feature
    * index `dims` with value 1.0 so one aggregation covers it. The
    * rule teacher (`keywords` density >= thresholdPct/100, exact
    * integer comparison) rides along as `label`. Features land as two
    * parallel arrays (`fidx` ascending, `fval`). */
  def featurize(
      docs: DataFrame,
      textCol: String,
      keywords: Set[String],
      thresholdPct: Int,
      dims: Int): DataFrame = {
    val b = docs.sparkSession.sparkContext.broadcast(keywords)
    val memo = scala.collection.mutable.HashMap.empty[String, Int]
    val feat = udf { (text: String) =>
      val ws = "[a-z0-9]+".r.findAllIn(text.toLowerCase).toArray
      val kw = ws.count(b.value.contains)
      val label = if (ws.nonEmpty && 100L * kw >= thresholdPct.toLong * ws.length) 1.0 else 0.0
      val s = ws.mkString(" ")
      val counts = scala.collection.mutable.HashMap.empty[Int, Long]
      val bucket = cachedBucketOf(memo, dims) _
      var i = 0
      while (i + 3 <= s.length) {
        val bk = bucket(s.substring(i, i + 3))
        counts.update(bk, counts.getOrElse(bk, 0L) + 1L)
        i += 1
      }
      val tot = counts.valuesIterator.sum.toDouble
      val feats = counts.toArray.sortBy(_._1)
        .map { case (idx, c) => (idx, FeatureScale * c / tot) } :+ ((dims, 1.0))
      (label, feats.map(_._1), feats.map(_._2))
    }
    docs
      .withColumn("_f", feat(col(textCol)))
      .withColumn("label", col("_f._1"))
      .withColumn("fidx", col("_f._2"))
      .withColumn("fval", col("_f._3"))
      .drop("_f")
  }

  private def dotUdf(bw: org.apache.spark.broadcast.Broadcast[Array[Double]]) =
    udf { (idx: Seq[Int], v: Seq[Double]) =>
      var m = 0.0
      var i = 0
      while (i < idx.length) { m += bw.value(idx(i)) * v(i); i += 1 }
      1.0 / (1.0 + math.exp(-m))
    }

  /** Full-batch logistic-regression GD: broadcast weights, per-
    * partition EXACT BigDecimal gradient accumulation into a dense
    * dims+1 vector, driver-side exact combine — the treeAggregate
    * shape every distributed linear trainer uses (gradient size is
    * bounded by dims, so NO shuffle is needed at all; shipping
    * n×nnz (bucket, contribution) rows through an exchange per
    * iteration would scale with the corpus instead). Contributions
    * are quantized to scale 18 HALF_UP — the same rounding as a
    * Catalyst double→DECIMAL(38,18) cast — before the exact sums, so
    * the result is bit-identical under any partitioning (decimal
    * addition is associative/commutative). */
  def trainLogReg(
      features: DataFrame,
      dims: Int,
      lr: Double,
      iters: Int): Array[Double] = {
    val spark = features.sparkSession
    val rdd = features.select(col("label"), col("fidx"), col("fval")).rdd
      .map { row =>
        (row.getDouble(0), row.getSeq[Int](1).toArray, row.getSeq[Double](2).toArray)
      }
      .persist()
    val n = rdd.count().toDouble
    val w = new Array[Double](dims + 1)
    for (_ <- 0 until iters) {
      val bw = spark.sparkContext.broadcast(w.clone())
      val parts = rdd.mapPartitions { it =>
        val acc = Array.fill(dims + 1)(java.math.BigDecimal.ZERO)
        it.foreach { case (y, idx, v) =>
          var m = 0.0
          var i = 0
          while (i < idx.length) { m += bw.value(idx(i)) * v(i); i += 1 }
          val g = 1.0 / (1.0 + math.exp(-m)) - y
          i = 0
          while (i < idx.length) {
            acc(idx(i)) = acc(idx(i)).add(
              new java.math.BigDecimal(g * v(i)).setScale(18, java.math.RoundingMode.HALF_UP))
            i += 1
          }
        }
        Iterator.single(acc)
      }.collect()
      // exact decimal combine across partitions FIRST, then one
      // double conversion per bucket — a per-partition double update
      // would re-round partition-count-dependently
      val total = Array.fill(dims + 1)(java.math.BigDecimal.ZERO)
      parts.foreach { acc =>
        var i = 0
        while (i <= dims) { total(i) = total(i).add(acc(i)); i += 1 }
      }
      var i = 0
      while (i <= dims) {
        if (total(i).signum != 0) w(i) -= lr * total(i).doubleValue() / n
        i += 1
      }
      bw.destroy()
    }
    rdd.unpersist()
    w
  }

  /** Score with a trained weight vector: one narrow pass, broadcast
    * weights, fixed-order dot product. */
  def score(features: DataFrame, weights: Array[Double]): DataFrame = {
    val bw = features.sparkSession.sparkContext.broadcast(weights)
    features.withColumn("score", dotUdf(bw)(col("fidx"), col("fval")))
  }
}

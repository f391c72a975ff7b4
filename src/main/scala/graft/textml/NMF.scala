package graft.textml

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Distributed non-negative matrix factorization via alternating local
  * multiplicative updates (true NMF for sec_document_topics.yml:8-25 —
  * replaces the earlier LDA stand-in).
  *
  * Factorizes the docs × terms TF-IDF matrix V ≈ W H:
  *
  *  - H (k × vocab) lives on the driver and is broadcast per outer
  *    iteration — k is small and vocab bounded (document the ≤ ~1e6
  *    term budget); this is the same shape constraint every
  *    broadcast-side model has.
  *  - W is never materialized globally: each outer iteration
  *    re-derives every doc's row w_i from a DETERMINISTIC init by
  *    `innerSteps` Lee-Seung multiplicative updates against fixed H —
  *    fully local per doc (V_i Hᵀ and H Hᵀ precomputed), so the only
  *    distributed work per iteration is one treeAggregate of
  *    A = Wᵀ V (k × vocab) and B = Wᵀ W (k × k), after which H takes
  *    one MU step on the driver: H ← H ∘ A / (B H).
  *
  * Everything is deterministic given the data: inits come from a
  * splitmix-style integer mix of (doc_id | topic) and
  * (topic | termHash), per-doc dot products run in ascending
  * term-index order, and the only cross-partition float sums are the
  * commutative A/B adds (noise ~1e-12, far under the checker's
  * tolerance). No RNG, no collect of per-doc state.
  */
object NMF {

  val Eps = 1e-12

  /** Deterministic double in [1e-3, 1+1e-3): splitmix64 finalizer over
    * two integer streams. Mirrored bit-for-bit by tools/check_numeric
    * .py (64-bit wrapping arithmetic). */
  def mix(a: Long, b: Long): Double = {
    var z = a * 0x9E3779B97F4A7C15L + b * 0xBF58476D1CE4E5B9L + 0x94D049BB133111EBL
    z ^= (z >>> 30); z *= 0xBF58476D1CE4E5B9L
    z ^= (z >>> 27); z *= 0x94D049BB133111EBL
    z ^= (z >>> 31)
    (z >>> 11).toDouble / (1L << 53).toDouble + 1e-3
  }

  /** Java-String.hashCode of a term (32-bit wrap), widened to Long —
    * trivially mirrored in Python. Keyed by the TERM STRING so the
    * factorization is independent of vocabulary ordering. */
  def termHash(t: String): Long = t.hashCode.toLong

  /** One doc's W row: deterministic init + `innerSteps` MU updates
    * against fixed H. `numer` = V_i Hᵀ (constant while H is fixed). */
  private def docRow(
      docId: Long,
      terms: Array[(Int, Double)],
      h: Array[Array[Double]],
      hht: Array[Array[Double]],
      k: Int,
      innerSteps: Int
  ): Array[Double] = {
    val numer = Array.tabulate(k) { t =>
      var s = 0.0
      var i = 0
      while (i < terms.length) { s += terms(i)._2 * h(t)(terms(i)._1); i += 1 }
      s
    }
    val w = Array.tabulate(k)(t => mix(docId, t.toLong))
    var step = 0
    while (step < innerSteps) {
      // Jacobi-style MU: every denominator reads the PREVIOUS w so the
      // update is the standard Lee-Seung step (and order-independent)
      val denom = Array.tabulate(k) { t =>
        var s = 0.0
        var b = 0
        while (b < k) { s += w(b) * hht(b)(t); b += 1 }
        s
      }
      var t = 0
      while (t < k) {
        w(t) = w(t) * numer(t) / math.max(denom(t), Eps)
        t += 1
      }
      step += 1
    }
    w
  }

  /** Fit NMF on (doc, term, value) triples. Returns (per-doc weights
    * DataFrame: docCol, w_0..w_{k-1}; term → topic loadings map).
    */
  def fit(
      triples: DataFrame,
      docCol: String,
      termCol: String,
      valCol: String,
      k: Int,
      outerIters: Int = 10,
      innerSteps: Int = 5
  ): (DataFrame, Map[String, Array[Double]]) = {
    val spark = triples.sparkSession
    // null doc/term/value triples would MatchError the RDD extractor
    // below (and a null term NPEs the vocabulary sort) — drop them up
    // front; the reference's vectorizer likewise never emits them
    val clean = triples.na.drop(Seq(docCol, termCol, valCol))
    // vocabulary sorted by term string: index is deterministic and the
    // factorization itself is order-independent (hash-keyed init)
    val vocab = clean.select(termCol).distinct()
      .collect().map(_.getString(0)).sorted
    val m        = vocab.length
    val termIdx  = vocab.zipWithIndex.toMap
    val termIdxB = spark.sparkContext.broadcast(termIdx)

    val docsRdd = clean
      .select(col(docCol).cast("long"), col(termCol), col(valCol).cast("double"))
      .rdd
      .map { case Row(d: Long, t: String, v: Double) => (d, (termIdxB.value(t), v)) }
      .groupByKey()
      .mapValues(_.toArray.sortBy(_._1))
      .cache()

    var h = Array.tabulate(k, m)((t, j) => mix(t.toLong, termHash(vocab(j))))

    for (_ <- 0 until outerIters) {
      val hB   = spark.sparkContext.broadcast(h)
      val hhtB = spark.sparkContext.broadcast(gram(h, k, m))
      val (aAgg, bAgg) = docsRdd
        .treeAggregate((Array.fill(k, m)(0.0), Array.fill(k, k)(0.0)))(
          seqOp = { case ((a, b), (docId, terms)) =>
            val w = docRow(docId, terms, hB.value, hhtB.value, k, innerSteps)
            var t = 0
            while (t < k) {
              var i = 0
              while (i < terms.length) { a(t)(terms(i)._1) += w(t) * terms(i)._2; i += 1 }
              var b2 = 0
              while (b2 < k) { b(t)(b2) += w(t) * w(b2); b2 += 1 }
              t += 1
            }
            (a, b)
          },
          combOp = { case ((a1, b1), (a2, b2)) =>
            var t = 0
            while (t < k) {
              var j = 0
              while (j < m) { a1(t)(j) += a2(t)(j); j += 1 }
              var c = 0
              while (c < k) { b1(t)(c) += b2(t)(c); c += 1 }
              t += 1
            }
            (a1, b1)
          }
        )
      // H ← H ∘ A / (B H)
      val next = Array.tabulate(k, m) { (t, j) =>
        var bh = 0.0
        var b  = 0
        while (b < k) { bh += bAgg(t)(b) * h(b)(j); b += 1 }
        h(t)(j) * aAgg(t)(j) / math.max(bh, Eps)
      }
      h = next
      hB.destroy(); hhtB.destroy()
    }

    val hFinal   = h
    val hB       = spark.sparkContext.broadcast(hFinal)
    val hhtB     = spark.sparkContext.broadcast(gram(hFinal, k, m))
    val weightRows = docsRdd.map { case (docId, terms) =>
      Row.fromSeq(docId +: docRow(docId, terms, hB.value, hhtB.value, k, innerSteps).toSeq)
    }
    val schema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField(docCol, org.apache.spark.sql.types.LongType) +:
        (0 until k).map(t =>
          org.apache.spark.sql.types.StructField(s"w_$t", org.apache.spark.sql.types.DoubleType))
    )
    val wDf = spark.createDataFrame(weightRows, schema)
    (wDf, vocab.zipWithIndex.map { case (t, j) => t -> Array.tabulate(k)(hFinal(_)(j)) }.toMap)
  }

  private def gram(h: Array[Array[Double]], k: Int, m: Int): Array[Array[Double]] =
    Array.tabulate(k, k) { (a, b) =>
      var s = 0.0
      var j = 0
      while (j < m) { s += h(a)(j) * h(b)(j); j += 1 }
      s
    }
}

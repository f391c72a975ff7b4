package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product-quantization ANN — the memory-bound production vector
  * index (ref sec/search.py's cosine search is brute-force; IVF and
  * int8 cover the compute-bound and 4× paths; PQ is the 32× path:
  * a 64-dim float32 vector becomes m=8 one-byte codes).
  *
  * Pipeline (all deterministic, no library RNG):
  *  1. TRAIN: a BOUNDED deterministic sample (vec_id <= sampleMax —
  *     bounded by construction at any corpus scale, the standard
  *     codebook practice) is collected and each of the m subspaces
  *     gets a ks-centroid codebook from seedless Lloyd iterations:
  *     init = first ks sample subvectors in vec_id order, argmin ties
  *     to the lower centroid index, empty clusters keep their
  *     previous centroid. Identical input -> identical codebooks,
  *     bit-for-bit, on any partitioning.
  *  2. ENCODE: one scan maps every vector to its m nearest-centroid
  *     codes (broadcast codebooks; write-side one-off, like the
  *     int8 quantizer).
  *  3. QUERY: asymmetric distance — the query stays full-precision;
  *     a driver-built m×ks lookup table of per-subspace squared
  *     distances turns each corpus row's score into m array reads.
  *     The ADC shortlist is re-ranked by EXACT cosine, so emitted
  *     similarities are exact; PQ only decides membership.
  *
  * Scale: codebooks are m×ks×dsub floats (8×16×8 here — KBs at any
  * corpus size); encoded corpus is m bytes/vector (32× smaller than
  * float32, 4× smaller than int8); the ADC scan reads codes only.
  * At cluster scale the shortlist re-rank touches full vectors for
  * candidateK rows, not the corpus.
  */
object PqOps {

  final case class Codebooks(m: Int, ks: Int, dsub: Int, cents: Array[Array[Array[Double]]])

  /** Deterministic per-subspace Lloyd codebooks from a bounded sample. */
  def pqTrain(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      m: Int,
      ks: Int,
      sampleMax: Long = 1024L,
      iters: Int = 10
  ): Codebooks = {
    val sample = embeddings
      .filter(col(idCol) <= sampleMax)
      .orderBy(col(idCol))
      .select(col(vecCol))
      .collect()
      .map(_.getSeq[Float](0).toArray.map(_.toDouble))
    require(sample.nonEmpty, "empty training sample")
    val d = sample.head.length
    require(d % m == 0, s"dim $d not divisible by m=$m")
    val dsub = d / m
    val cents = Array.tabulate(m) { j =>
      val sub = sample.map(v => java.util.Arrays.copyOfRange(v, j * dsub, (j + 1) * dsub))
      lloyd(sub, ks, iters)
    }
    Codebooks(m, ks, dsub, cents)
  }

  private def lloyd(xs: Array[Array[Double]], ks: Int, iters: Int): Array[Array[Double]] = {
    val k     = math.min(ks, xs.length)
    var cents = Array.tabulate(k)(i => xs(i).clone())
    var it    = 0
    while (it < iters) {
      val sums   = Array.fill(k)(new Array[Double](xs.head.length))
      val counts = new Array[Long](k)
      xs.foreach { x =>
        val a = argmin(x, cents)
        counts(a) += 1
        var i = 0
        while (i < x.length) { sums(a)(i) += x(i); i += 1 }
      }
      cents = Array.tabulate(k) { c =>
        if (counts(c) == 0) cents(c) // empty cluster keeps its centroid
        else sums(c).map(_ / counts(c))
      }
      it += 1
    }
    cents
  }

  private def argmin(x: Array[Double], cents: Array[Array[Double]]): Int = {
    var best = 0
    var bd   = Double.MaxValue
    var c    = 0
    while (c < cents.length) {
      var dd = 0.0
      var i  = 0
      val ce = cents(c)
      while (i < x.length) { val t = x(i) - ce(i); dd += t * t; i += 1 }
      if (dd < bd) { bd = dd; best = c } // strict < ties to the LOWER index
      c += 1
    }
    best
  }

  /** Encode vectors to m nearest-centroid codes (broadcast codebooks). */
  def pqEncode(embeddings: DataFrame, vecCol: String, cb: Codebooks): DataFrame = {
    val bc = embeddings.sparkSession.sparkContext.broadcast(cb)
    val enc = udf { (v: Seq[Float]) =>
      val b = bc.value
      Array.tabulate(b.m) { j =>
        val sub = Array.tabulate(b.dsub)(i => v(j * b.dsub + i).toDouble)
        argmin(sub, b.cents(j))
      }
    }
    embeddings.withColumn("pq_codes", enc(col(vecCol)))
  }

  /** ADC score column: Σ_j lut(j)(code_j) for a query-specific lookup
    * table (built on the driver from the full-precision query). */
  def adcScore(cb: Codebooks, qvec: Array[Double], codesCol: Column): Column = {
    val lut = Array.tabulate(cb.m) { j =>
      val qs = java.util.Arrays.copyOfRange(qvec, j * cb.dsub, (j + 1) * cb.dsub)
      cb.cents(j).map { ce =>
        var dd = 0.0
        var i  = 0
        while (i < qs.length) { val t = qs(i) - ce(i); dd += t * t; i += 1 }
        dd
      }
    }
    val score = udf { (codes: Seq[Int]) =>
      var s = 0.0
      var j = 0
      while (j < codes.length) { s += lut(j)(codes(j)); j += 1 }
      s
    }
    score(codesCol)
  }
}

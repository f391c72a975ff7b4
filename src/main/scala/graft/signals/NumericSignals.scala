package graft.signals

import breeze.linalg.{eigSym, pinv, DenseMatrix, DenseVector}
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

/** Numeric research-signal operators (SURVEY.md §2.K; refs
  * macro_agents/.../signals/turbulence_index.py, absorption_ratio.py,
  * entropy_complexity.py, network_correlation.py).
  *
  * Shape: the rolling matrix windows are materialized per row with
  * `collect_list` over a trailing frame (windows are small by
  * construction — hundreds of rows × a handful of assets), then the
  * linear algebra runs inside executors via Breeze UDFs. Each row is
  * independent, so the computation distributes with the window
  * shuffle; no driver-side collect anywhere.
  */
object NumericSignals {

  /** Rolling Mahalanobis turbulence: distance of today's return
    * vector from the trailing-window distribution (pinv-covariance;
    * ref turbulence_index.py:80-127). hist = window INCLUDING current
    * row; the distribution excludes nothing (reference behavior). */
  val mahalanobis: UserDefinedFunction = udf { (cur: Seq[Double], hist: Seq[Seq[Double]]) =>
    val k = cur.length
    val n = hist.length
    if (n < k + 2) None
    else {
      val m  = DenseMatrix(hist.map(_.toArray): _*)
      val mu = DenseVector.tabulate(k)(j => breeze.linalg.sum(m(::, j)) / n.toDouble)
      val centered = DenseMatrix.tabulate(n, k)((i, j) => m(i, j) - mu(j))
      val cov      = (centered.t * centered) / (n - 1).toDouble
      val icov     = pinv(cov)
      val x        = DenseVector(cur.toArray) - mu
      val d2       = x.t * (icov * x)
      Some(math.sqrt(math.max(d2, 0.0)))
    }
  }

  /** Absorption ratio: share of variance captured by the top
    * ceil(fraction*K) eigenvalues of the window correlation matrix
    * (ref absorption_ratio.py:49-112). */
  def absorptionRatio(fraction: Double): UserDefinedFunction = udf { (hist: Seq[Seq[Double]]) =>
    val n = hist.length
    val k = if (n == 0) 0 else hist.head.length
    if (n < k + 2) None
    else {
      val m    = DenseMatrix(hist.map(_.toArray): _*)
      val corr = correlationMatrix(m)
      val ev   = eigSym(corr).eigenvalues
      val top  = math.max(1, math.ceil(fraction * k).toInt)
      val sorted = ev.toArray.sorted(Ordering[Double].reverse)
      val total  = sorted.sum
      if (total <= 0) None else Some(sorted.take(top).sum / total)
    }
  }

  /** Normalized permutation entropy of ordinal patterns of `order`
    * consecutive values (ref entropy_complexity.py:31-58). */
  def permutationEntropy(order: Int): UserDefinedFunction = udf { (window: Seq[Double]) =>
    if (window.length < order + 1) None
    else {
      val counts = scala.collection.mutable.Map.empty[Seq[Int], Int]
      window.sliding(order).foreach { pat =>
        val ranks = pat.zipWithIndex.sortBy(x => (x._1, x._2)).map(_._2)
        counts(ranks) = counts.getOrElse(ranks, 0) + 1
      }
      val total = counts.values.sum.toDouble
      val h     = -counts.values.map { c => val p = c / total; p * math.log(p) }.sum
      val hMax  = math.log((1 to order).product.toDouble)
      if (hMax <= 0) None else Some(h / hMax)
    }
  }

  /** MST metrics over the window correlation matrix: distance
    * sqrt(2(1-rho)), Prim's MST, then (total length, max degree,
    * avg path length over all pairs, max betweenness share)
    * (ref network_correlation.py:60-156). */
  val mstMetrics: UserDefinedFunction = udf { (hist: Seq[Seq[Double]]) =>
    val n = hist.length
    val k = if (n == 0) 0 else hist.head.length
    if (n < 10 || k < 2) None
    else {
      val corr = correlationMatrix(DenseMatrix(hist.map(_.toArray): _*))
      val dist = Array.tabulate(k, k)((i, j) =>
        math.sqrt(math.max(0.0, 2.0 * (1.0 - corr(i, j)))))
      // Prim's MST
      val inTree  = Array.fill(k)(false)
      val minEdge = Array.fill(k)(Double.MaxValue)
      val parent  = Array.fill(k)(-1)
      minEdge(0) = 0.0
      var total = 0.0
      val adj   = Array.fill(k)(List.empty[Int])
      for (_ <- 0 until k) {
        val u = (0 until k).filter(!inTree(_)).minBy(minEdge)
        inTree(u) = true
        if (parent(u) >= 0) {
          total += dist(parent(u))(u)
          adj(u) ::= parent(u); adj(parent(u)) ::= u
        }
        for (v <- 0 until k if !inTree(v) && dist(u)(v) < minEdge(v)) {
          minEdge(v) = dist(u)(v); parent(v) = u
        }
      }
      val maxDegree = adj.map(_.size).max
      // all-pairs path lengths on the tree via BFS per node (k small)
      var pathSum = 0.0
      var pairs   = 0
      val between = Array.fill(k)(0)
      for (s <- 0 until k) {
        val hops = Array.fill(k)(-1)
        val par  = Array.fill(k)(-1)
        hops(s) = 0
        var q = List(s)
        while (q.nonEmpty) {
          val u = q.head; q = q.tail
          for (v <- adj(u) if hops(v) < 0) { hops(v) = hops(u) + 1; par(v) = u; q = q :+ v }
        }
        for (t <- s + 1 until k) {
          pathSum += hops(t); pairs += 1
          var x = par(t)
          while (x != -1 && x != s) { between(x) += 1; x = par(x) }
        }
      }
      val avgPath        = if (pairs > 0) pathSum / pairs else 0.0
      val maxBetweenness = if (pairs > 0) between.max.toDouble / pairs else 0.0
      Some((total, maxDegree, avgPath, maxBetweenness))
    }
  }

  private def correlationMatrix(m: DenseMatrix[Double]): DenseMatrix[Double] = {
    val n  = m.rows
    val k  = m.cols
    val mu = DenseVector.tabulate(k)(j => breeze.linalg.sum(m(::, j)) / n.toDouble)
    val sd = DenseVector.tabulate(k) { j =>
      var s = 0.0
      var i = 0
      while (i < n) { val d = m(i, j) - mu(j); s += d * d; i += 1 }
      math.sqrt(s / (n - 1).toDouble)
    }
    DenseMatrix.tabulate(k, k) { (a, b) =>
      if (sd(a) <= 0 || sd(b) <= 0) { if (a == b) 1.0 else 0.0 }
      else {
        var s = 0.0
        var i = 0
        while (i < n) { s += (m(i, a) - mu(a)) * (m(i, b) - mu(b)); i += 1 }
        val r = s / ((n - 1).toDouble * sd(a) * sd(b))
        math.max(-1.0, math.min(1.0, r))
      }
    }
  }
}

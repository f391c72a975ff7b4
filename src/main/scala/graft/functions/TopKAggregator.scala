package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Exact top-k per group as a typed [[Aggregator]] — the §2.O UDAF
  * surface done the way a 100 TB top-k has to be done.
  *
  * The window form (`row_number() OVER (PARTITION BY g ORDER BY s
  * DESC) <= k`) sorts EVERY row of every group; this aggregator keeps
  * a k-bounded buffer per group instead: `reduce` inserts into a
  * sorted pair-of-arrays buffer only when the candidate beats the
  * current cutoff, `merge` combines two bounded buffers — so partial
  * aggregation (map-side combine) ships at most k entries per group
  * per task, and no executor ever holds more than k rows of state per
  * group. For k ≪ group size that's the difference between shuffling
  * the fact table and shuffling k·|groups| rows.
  *
  * Determinism: total order (score DESC, id ASC) — ties at the cutoff
  * always resolve the same way regardless of partitioning or merge
  * order (spec-asserted against the window form).
  *
  * Scores/ids are BIGINT: callers map monetary doubles to exact
  * scaled longs first (same discipline as the sketch operators — the
  * buffer compare must be exact or merge order leaks into the cut).
  */
object TopKAggregator {

  /** k-bounded buffer: parallel arrays sorted best-first by
    * (score DESC, id ASC). Product-encodable (no kryo, stays inside
    * the ObjectHashAggregate path). */
  final case class TopBuf(scores: Array[Long], ids: Array[Long])

  final class TopK(k: Int) extends Aggregator[(Long, Long), TopBuf, TopBuf] {
    require(k > 0, s"k must be positive, got $k")

    private def beats(s1: Long, i1: Long, s2: Long, i2: Long): Boolean =
      s1 > s2 || (s1 == s2 && i1 < i2)

    override def zero: TopBuf = TopBuf(Array.emptyLongArray, Array.emptyLongArray)

    override def reduce(buf: TopBuf, in: (Long, Long)): TopBuf = {
      val n = buf.scores.length
      if (n >= k && !beats(in._1, in._2, buf.scores(n - 1), buf.ids(n - 1))) buf
      else {
        var i = 0
        while (i < n && !beats(in._1, in._2, buf.scores(i), buf.ids(i))) i += 1
        val m  = math.min(n + 1, k)
        val ss = new Array[Long](m)
        val is = new Array[Long](m)
        System.arraycopy(buf.scores, 0, ss, 0, i)
        System.arraycopy(buf.ids, 0, is, 0, i)
        ss(i) = in._1
        is(i) = in._2
        val tail = m - i - 1
        if (tail > 0) {
          System.arraycopy(buf.scores, i, ss, i + 1, tail)
          System.arraycopy(buf.ids, i, is, i + 1, tail)
        }
        TopBuf(ss, is)
      }
    }

    override def merge(a: TopBuf, b: TopBuf): TopBuf = {
      var acc = a
      var i   = 0
      while (i < b.scores.length) {
        acc = reduce(acc, (b.scores(i), b.ids(i)))
        i += 1
      }
      acc
    }

    override def finish(buf: TopBuf): TopBuf = buf

    override def bufferEncoder: Encoder[TopBuf] = Encoders.product[TopBuf]
    override def outputEncoder: Encoder[TopBuf] = Encoders.product[TopBuf]
  }

  /** Untyped column form for DataFrame groupBy: pass `(score, id)` as
    * two BIGINT columns. Returns a struct of two k-bounded arrays
    * (scores, ids), best first — posexplode + arrays_zip unpacks it. */
  def topK(k: Int, score: Column, id: Column): Column =
    udaf(new TopK(k), Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))(score, id)
}

package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Space-Saving / Misra-Gries heavy hitters as a typed mergeable
  * [[Aggregator]] — the frequency complement to the engine's
  * cardinality (KMV, HLL) and point-count (count-min) sketches.
  *
  * State is HARD-BOUNDED at k (item, count, err) counters per group
  * per task regardless of key cardinality; `merge` combines two
  * bounded summaries (Agarwal et al., "Mergeable Summaries": shared
  * items add counts and errors, one-sided items absorb the other
  * side's eviction floor, then trim to k) — so map-side combine ships
  * k counters, never the keys.
  *
  * Guarantees (and how they are gated): for every tracked item,
  * `count - err <= true <= count`; and ANY item with true frequency
  * > N/k is guaranteed to be tracked. Estimates themselves are
  * merge-order-dependent (inherent to the sketch), so the oracle
  * query follows the percentile_approx discipline: it outputs the
  * EXACT counts of the deterministically-defined heavy-hitter set
  * (64·count > N) plus presence/bound flags the sketch must satisfy —
  * a violated guarantee flips a flag and fails the hash gate, while
  * the noisy estimates never enter the compare.
  */
object SpaceSavingAggregator {

  /** Bounded summary: parallel arrays, no order invariant (the trim
    * and the query impose their own total orders). Product-encodable
    * — stays on the ObjectHashAggregate path. */
  final case class SsBuf(items: Array[String], counts: Array[Long], errs: Array[Long])

  final class SpaceSaving(k: Int) extends Aggregator[String, SsBuf, SsBuf] {
    require(k > 0, s"k must be positive, got $k")

    override def zero: SsBuf = SsBuf(Array.empty, Array.emptyLongArray, Array.emptyLongArray)

    /** Victim = (count ASC, item ASC) — any victim is sound; a total
      * order keeps single-partition runs reproducible. */
    private def victim(b: SsBuf): Int = {
      var m = 0
      var i = 1
      while (i < b.items.length) {
        if (b.counts(i) < b.counts(m) ||
          (b.counts(i) == b.counts(m) && b.items(i) < b.items(m))) m = i
        i += 1
      }
      m
    }

    override def reduce(b: SsBuf, item: String): SsBuf = {
      var i = 0
      while (i < b.items.length && b.items(i) != item) i += 1
      if (i < b.items.length) { b.counts(i) += 1; b }
      else if (b.items.length < k)
        SsBuf(b.items :+ item, b.counts :+ 1L, b.errs :+ 0L)
      else {
        val v = victim(b)
        val floor = b.counts(v)
        b.items(v) = item
        b.counts(v) = floor + 1
        b.errs(v) = floor
        b
      }
    }

    override def merge(a: SsBuf, b: SsBuf): SsBuf = {
      if (a.items.isEmpty) return b
      if (b.items.isEmpty) return a
      // eviction floor of a FULL summary = its min count (an unseen
      // item could have been counted up to that many times); a
      // non-full summary saw everything -> floor 0
      def floor(x: SsBuf): Long =
        if (x.items.length < k) 0L else x.counts.min
      val fa = floor(a)
      val fb = floor(b)
      val m = scala.collection.mutable.LinkedHashMap.empty[String, (Long, Long)]
      var i = 0
      while (i < a.items.length) { m(a.items(i)) = (a.counts(i), a.errs(i)); i += 1 }
      i = 0
      while (i < b.items.length) {
        val (c, e) = m.getOrElse(b.items(i), (fa, fa))
        m(b.items(i)) = (c + b.counts(i), e + b.errs(i))
        i += 1
      }
      // items only in a absorb b's floor
      a.items.foreach { it =>
        if (!b.items.contains(it)) {
          val (c, e) = m(it)
          m(it) = (c + fb, e + fb)
        }
      }
      val kept = m.toArray
        .sortBy { case (it, (c, _)) => (-c, it) }
        .take(k)
      SsBuf(kept.map(_._1), kept.map(_._2._1), kept.map(_._2._2))
    }

    override def finish(b: SsBuf): SsBuf = b

    override def bufferEncoder: Encoder[SsBuf] = Encoders.product[SsBuf]
    override def outputEncoder: Encoder[SsBuf] = Encoders.product[SsBuf]
  }

  /** Untyped column form: aggregate a STRING key column into the
    * k-bounded summary struct (items, counts, errs). */
  def spaceSaving(k: Int, key: Column): Column =
    udaf(new SpaceSaving(k), Encoders.STRING)(key)
}

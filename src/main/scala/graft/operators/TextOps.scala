package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline:
  * token statistics, quality scoring, language-ID heuristic, document
  * fingerprinting (SURVEY.md §2.L + training-data extensions). Pure
  * Catalyst expressions — everything stays inside whole-stage codegen.
  */
object TextOps {

  def tokens(text: Column): Column = DedupOps.tokens(text)

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  def charCount(text: Column): Column = length(text).cast("long")

  /** Whitespace-token + BPE-ish estimate: max(word pieces, chars/4) —
    * the standard cheap proxy when no tokenizer is available. */
  def estBpeTokens(text: Column): Column =
    greatest(tokenCount(text), ceil(length(text) / 4.0).cast("long"))

  def avgTokenLen(text: Column): Column = {
    val t = tokens(text)
    when(size(t) > 0,
      aggregate(t, lit(0.0), (acc, x) => acc + length(x)) / size(t))
  }

  /** Fraction of characters that are punctuation (explicit class so an
    * external SQL oracle matches byte-for-byte). */
  def punctRatio(text: Column): Column = {
    val punct = length(text) - length(regexp_replace(text, "[.,!?;:'\"()\\[\\]-]", ""))
    when(length(text) > 0, punct.cast("double") / length(text)).otherwise(lit(0.0))
  }

  /** Fraction of tokens found in a stopword list (duplicates counted —
    * matches a streaming counter, not a set intersection). */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val t    = tokens(text)
    val hits = size(filter(t, tok => stopwords.map(w => tok === lit(w)).reduce(_ || _)))
    when(size(t) > 0, hits.cast("double") / size(t)).otherwise(lit(0.0))
  }

  /** Composite quality score in [0,1]: length band + non-degenerate
    * token mix (distinct/total ratio) + bounded avg token length.
    * Heuristic mirrors reference-style feature engineering
    * (stg_reddit_posts.sql:24-41 engagement/quality features). */
  def qualityScore(text: Column): Column = {
    val t         = tokens(text)
    val n         = size(t).cast("double")
    val distinctR = when(n > 0, size(array_distinct(t)) / n).otherwise(lit(0.0))
    val lenScore = when(charCount(text).between(100, 10000), 1.0)
      .when(charCount(text) < 100, charCount(text) / 100.0)
      .otherwise(lit(0.5))
    val atl      = coalesce(avgTokenLen(text), lit(0.0))
    val atlScore = when(atl.between(3.0, 10.0), 1.0).otherwise(lit(0.5))
    round((lenScore + distinctR + atlScore) / 3.0, 4)
  }

  /** Language-ID by marker-list voting: score per language = count of
    * tokens in that language's marker list (duplicates counted; all
    * candidates share the doc's token count, so hit-count order equals
    * hit-ratio order). Argmax wins, ties broken by lexicographically
    * greatest language code, "und" when every score is zero. */
  def langIdHeuristic(text: Column, markers: Seq[(String, Seq[String])]): Column = {
    val t = tokens(text)
    val scored = markers.map { case (langCode, words) =>
      val hits = size(filter(t, tok => words.map(w => tok === lit(w)).reduce(_ || _)))
      struct(hits.as("hits"), lit(langCode).as("lang"))
    }
    val best = greatest(scored: _*)
    when(best.getField("hits") > 0, best.getField("lang")).otherwise("und")
  }

  /** VADER-style sentiment scorer (ref social_sentiment.py:15-41 +
    * stg_reddit_sentiment.sql:27-35): per-token lexicon valences,
    * VADER's pos/neg/neu mass split (v+1 for positive hits, |v-1| for
    * negative hits, 1 per neutral token), alpha-15 compound
    * normalization s/sqrt(s²+15), ±0.05 labels and the 5-bucket
    * strength column. Valences are INTEGER ×10 (2.1 → 21) so every sum
    * is exact integer arithmetic — order-independent and bit-identical
    * across engines; only the final ratios touch floats. The booster /
    * negation / punctuation heuristics of full VADER are out of scope
    * (documented simplification — the lexicon is caller-supplied).
    */
  def vaderSentiment(text: Column, lexicon10: Seq[(String, Int)]): Column = {
    val t = tokens(text)
    val v = transform(t, tok =>
      lexicon10.foldRight(lit(0)) { case ((w, s), acc) => when(tok === w, lit(s)).otherwise(acc) })
    def asum(f: Column => Column) = aggregate(v, lit(0L), (a, x) => a + f(x))
    val s10   = asum(_.cast("long"))
    val pos10 = asum(x => when(x > 0, (x + 10).cast("long")).otherwise(lit(0L)))
    val neg10 = asum(x => when(x < 0, (lit(10) - x).cast("long")).otherwise(lit(0L)))
    val neu10 = asum(x => when(x === 0, lit(10L)).otherwise(lit(0L)))
    val tot   = pos10 + neg10 + neu10
    val sD    = s10.cast("double") / 10.0
    val compound = when(tot > 0, round(sD / sqrt(sD * sD + 15.0), 4)).otherwise(lit(0.0))
    def ratio(m: Column) = when(tot > 0, round(m.cast("double") / tot, 3)).otherwise(lit(0.0))
    val label = when(compound >= 0.05, "positive")
      .when(compound <= -0.05, "negative")
      .otherwise("neutral")
    val strength = when(compound >= 0.5, "very_positive")
      .when(compound >= 0.05, "positive")
      .when(compound <= -0.5, "very_negative")
      .when(compound <= -0.05, "negative")
      .otherwise("neutral")
    struct(
      compound.as("compound"),
      ratio(pos10).as("positive"),
      ratio(neg10).as("negative"),
      ratio(neu10).as("neutral"),
      label.as("sentiment_label"),
      strength.as("sentiment_strength"),
      abs(compound).as("sentiment_intensity")
    )
  }

  /** Hawkish/dovish policy-lexicon scorer (ref fed_sentiment/lexicon.py
    * :116-167): weighted word-boundary phrase counts (multi-word
    * phrases supported, non-overlapping), net = (H-D)/(H+D) in [-1,1]
    * (0 when no hits), per-side scores normalized by the lexicon's
    * total weight and capped at 1. Weights are INTEGER ×10; phrases
    * must be regex-safe ([a-z ] only). */
  def policySentiment(
      text: Column,
      hawkish10: Seq[(String, Int)],
      dovish10: Seq[(String, Int)]
  ): Column = {
    val lowered = lower(text)
    def cnt(p: String): Column = regexp_count(lowered, lit("\\b" + p + "\\b"))
    def total(lex: Seq[(String, Int)]) =
      lex.map { case (p, w) => (cnt(p) * w).cast("long") }.reduce(_ + _)
    def hits(lex: Seq[(String, Int)]) =
      lex.map { case (p, _) => cnt(p).cast("long") }.reduce(_ + _)
    val h10   = total(hawkish10)
    val d10   = total(dovish10)
    val maxH  = hawkish10.map(_._2).sum
    val maxD  = dovish10.map(_._2).sum
    def capped(t: Column, mx: Int) = round(least(t.cast("double") / mx, lit(1.0)), 3)
    val net = when(h10 + d10 > 0, round((h10 - d10).cast("double") / (h10 + d10), 3))
      .otherwise(lit(0.0))
    struct(
      capped(h10, maxH).as("hawkish_score"),
      capped(d10, maxD).as("dovish_score"),
      net.as("net_sentiment_score"),
      hits(hawkish10).as("total_hawkish_keywords"),
      hits(dovish10).as("total_dovish_keywords")
    )
  }

  /** Normalized document fingerprint: md5 over the sorted distinct
    * token set — robust to word order and duplication, cheap to
    * group on for fuzzy-exact dedup. */
  def normalizedFingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(text)))))
}

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

  /** Normalized document fingerprint: md5 over the sorted distinct
    * token set — robust to word order and duplication, cheap to
    * group on for fuzzy-exact dedup. */
  def normalizedFingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(text)))))
}

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

  /** PII patterns for training-data scrubbing. Conservative regexes
    * that behave identically under Java regex (Spark) and RE2
    * (DuckDB, Go scrubbers): no lookaround, explicit classes.
    * Replacement order is fixed (email, ssn, phone, ip) and the
    * patterns are mutually non-overlapping on digit-group shape
    * (3-2-4 ssn vs 3-3-4 phone vs 4-octet ip), so chained
    * replacement equals simultaneous replacement. */
  val PiiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ssn", "\\b\\d{3}-\\d{2}-\\d{4}\\b", "[SSN]"),
    ("phone", "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b", "[PHONE]"),
    ("ip", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "[IP]"))

  /** Per-kind PII match count (before redaction). */
  def piiCount(text: Column, kind: String): Column =
    regexp_count(text, lit(PiiPatterns.find(_._1 == kind).get._2)).cast("long")

  /** Text with every PII pattern replaced by its placeholder. */
  def redactPii(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (acc, (_, rx, tag)) =>
      regexp_replace(acc, rx, tag)
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

  /** VADER scorer WITH the reference library's heuristics (ref
    * social_sentiment.py uses the real vaderSentiment package;
    * published VADER constants: Hutto & Gilbert 2014):
    *
    *  - booster/dampener words in the 3 preceding tokens shift the
    *    valence by ±0.293 toward/away from its sign, scaled 1.0 /
    *    0.95 / 0.9 by distance;
    *  - a negator in the 3 preceding tokens multiplies the (boosted)
    *    valence by −0.74;
    *  - exclamation emphasis: min(#!, 4) × 0.292 added to the
    *    compound sum toward its sign; question emphasis: 2-3 "?" →
    *    #? × 0.18, ≥4 → 0.96;
    *  - the punctuation emphasis also joins the dominant pole of the
    *    pos/neg/neu mass split (VADER's _sift_sentiment_scores).
    *
    * ALL-CAPS emphasis is inapplicable (the token pipeline lowercases)
    * and the but-clause/idiom rules are out of scope — documented.
    * Arithmetic is integer in valence×10⁶ units (0.293 → 293000;
    * distance-scaled boosts 293000/278350/263700; the ×(−0.74) product
    * stays integral because every reachable valence is a multiple of
    * 50, so truncating and flooring division agree) — sums are exact
    * and order-independent on both engines.
    */
  def vaderSentimentFull(
      df: org.apache.spark.sql.DataFrame,
      text: Column,
      lexicon10: Seq[(String, Int)],
      boosters: Seq[String],
      dampeners: Seq[String],
      negators: Seq[String],
      outCol: String = "sent"
  ): org.apache.spark.sql.DataFrame = {
    val t = tokens(text)
    // base valence in 1e-6 units. Interpreted-HOF discipline: the
    // lexicon fold and role lookup run exactly ONCE per token, the
    // four sums come from ONE aggregate pass with a struct
    // accumulator, and the sums land in their OWN projection so the
    // output fields can reference them without re-evaluating the
    // array pipeline (CollapseProject keeps multi-referenced non-cheap
    // aliases in their own stage).
    def base(tok: Column): Column =
      lexicon10.foldRight(lit(0L)) { case ((w, s), acc) =>
        when(tok === w, lit(s.toLong * 100000L)).otherwise(acc)
      }
    def isIn(tok: Column, words: Seq[String]): Column =
      words.map(tok === lit(_)).reduce(_ || _)
    val distBoost = Seq(293000L, 278350L, 263700L)
    val bArr = transform(t, tok => base(tok))
    val roleArr = transform(t, tok =>
      when(isIn(tok, boosters), 1).when(isIn(tok, dampeners), 2)
        .when(isIn(tok, negators), 3).otherwise(0))
    val v = transform(bArr, (b, i) => {
      val sign = when(b > 0, 1L).otherwise(-1L)
      def role(d: Int) = when(i + lit(1) - lit(d) >= 1,
        element_at(roleArr, i + lit(1) - lit(d))).otherwise(lit(0))
      val boosted = (1 to 3).foldLeft(b) { (acc, d) =>
        when(b =!= 0 && role(d) === 1, acc + sign * distBoost(d - 1))
          .when(b =!= 0 && role(d) === 2, acc - sign * distBoost(d - 1))
          .otherwise(acc)
      }
      val negated = (1 to 3).map(d => role(d) === 3).reduce(_ || _)
      when(b =!= 0 && negated, (-boosted * 74L / 100L).cast("long")).otherwise(boosted)
    })
    val unit = 1000000L
    val acc0 = struct(lit(0L).as("s"), lit(0L).as("p"), lit(0L).as("n"), lit(0L).as("u"))
    val sums = aggregate(v, acc0, (a, x) => struct(
      (a.getField("s") + x).as("s"),
      (a.getField("p") + when(x > 0, x + lit(unit)).otherwise(0L)).as("p"),
      (a.getField("n") + when(x < 0, lit(unit) - x).otherwise(0L)).as("n"),
      (a.getField("u") + when(x === 0, lit(unit)).otherwise(0L)).as("u")))
    val nEx  = least(length(text) - length(regexp_replace(text, "!", "")), lit(4))
    val nQm  = length(text) - length(regexp_replace(text, "\\?", ""))
    val ep   = nEx.cast("long") * 292000L
    val qp = when(nQm > 3, 960000L)
      .when(nQm > 1, nQm.cast("long") * 180000L)
      .otherwise(0L)

    val staged = df
      .withColumn("__vs", sums)
      .withColumn("__vp", ep + qp)
    val sRaw  = col("__vs.s")
    val punct = col("__vp")
    val s   = when(sRaw > 0, sRaw + punct).when(sRaw < 0, sRaw - punct).otherwise(sRaw)
    val pos = col("__vs.p") + when(sRaw > 0, punct).otherwise(0L)
    val neg = col("__vs.n") + when(sRaw < 0, punct).otherwise(0L)
    val neu = col("__vs.u")
    val tot = pos + neg + neu
    val sD  = s.cast("double") / unit.toDouble
    val compound = when(tot > 0, round(sD / sqrt(sD * sD + 15.0), 4)).otherwise(lit(0.0))
    def ratio(m: Column) = when(tot > 0, round(m.cast("double") / tot, 3)).otherwise(lit(0.0))
    staged
      .withColumn(outCol, struct(
        compound.as("compound"),
        ratio(pos).as("positive"),
        ratio(neg).as("negative"),
        ratio(neu).as("neutral"),
        when(compound >= 0.05, "positive")
          .when(compound <= -0.05, "negative")
          .otherwise("neutral").as("sentiment_label")))
      .drop("__vs", "__vp")
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

  // ------------------------------------------------------------------
  // Repetition signals (Gopher-style repetition filters,
  // Rae et al. 2021 "Scaling Language Models" Table A1)
  // ------------------------------------------------------------------

  /** Per-distinct-gram (count, char-length) stats over a gram array.
    * O(|distinct|·|grams|) per ROW — bounded by document length, zero
    * shuffle; at 100 TB this is embarrassingly parallel map work. */
  private def occStats(grams: Column): Column =
    transform(array_distinct(grams), g =>
      struct(
        size(filter(grams, x => x === g)).cast("long").as("c"),
        length(g).cast("long").as("l")))

  /** Characters covered by the single most frequent gram:
    * max over distinct g of count(g)·len(g). All integer arithmetic —
    * exact in any engine. */
  def topGramChars(grams: Column): Column =
    aggregate(occStats(grams), lit(0L),
      (a, s) => greatest(a, s.getField("c") * s.getField("l")))

  /** Characters inside grams occurring at least twice:
    * Σ over distinct g with count(g) ≥ 2 of count(g)·len(g). */
  def dupGramChars(grams: Column): Column =
    aggregate(occStats(grams), lit(0L),
      (a, s) => a + when(s.getField("c") >= 2, s.getField("c") * s.getField("l"))
        .otherwise(lit(0L)))

  /** Total characters across all gram occurrences (the fraction
    * denominator Gopher uses). */
  def allGramChars(grams: Column): Column =
    aggregate(grams, lit(0L), (a, g) => a + length(g).cast("long"))

  /** Fixed-width pseudo-lines: consecutive `lineLen`-token groups
    * joined by single spaces. The documents fixture carries no real
    * newlines, so the line-based Gopher signals (duplicate-line
    * fraction) run over this deterministic segmentation; on a real
    * corpus pass `split(text, "\n")` instead. */
  def tokenLines(toks: Column, lineLen: Int): Column =
    when(size(toks) > 0,
      transform(sequence(lit(0), ((size(toks) - 1) / lineLen).cast("int")),
        i => concat_ws(" ", slice(toks, i * lineLen + 1, lit(lineLen)))))
      .otherwise(array().cast("array<string>"))
}

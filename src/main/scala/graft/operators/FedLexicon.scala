package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Monetary-policy sentiment lexicon: the reference's weighted
  * hawkish/dovish phrase dictionary and its dictionary-based scorer
  * (ref macro_agents/src/macro_agents/defs/analysis/fed_sentiment/
  * lexicon.py:11-166), re-expressed as a pure Catalyst expression
  * chain so the scoring runs distributed inside whole-stage codegen —
  * no UDF, no driver loop.
  *
  * Scoring contract (lexicon.py:116-166):
  *   - each phrase is counted with word-boundary regex matching over
  *     the lowercased text (`\b<phrase>\b`, non-overlapping);
  *   - hawkish_total = Σ weight×count over hawkish phrases (dovish
  *     likewise); phrases are counted INDEPENDENTLY, so "elevated
  *     inflation" also feeds the bare "inflation" count — faithful to
  *     the reference's per-keyword loop;
  *   - net = (hawkish − dovish) / (hawkish + dovish), 0 when no hits;
  *   - hawkish_score = min(hawkish_total / Σ all hawkish weights, 1),
  *     rounded to 3 decimals (dovish likewise).
  *
  * Exactness: every weight is a multiple of 0.1, so totals are
  * computed in integer TENTHS (`h10 = Σ w10×count`, a LONG) and the
  * final scores are exact integer ratios — both engines round the
  * same rational via the [[graft.queries.QueryDef.rdiv]]/`oDivRound`
  * discipline, no float-parity wobble.
  *
  * Scale: ~66 `regexp_count` expressions per row, all codegen'd; cost
  * is linear in text size with zero shuffles — the shape that survives
  * a 100 TB transcript corpus untouched.
  */
object FedLexicon {

  /** A lexicon phrase with its weight in tenths (0.8 → 8). */
  final case class Term(phrase: String, w10: Int)

  /** Hawkish phrases, reference order (lexicon.py:11-47). */
  val hawkish: Seq[Term] = Seq(
    Term("inflation", 3), Term("inflationary", 5), Term("overheating", 8),
    Term("price pressures", 6), Term("price stability", 4),
    Term("upside risks to inflation", 9), Term("above target", 6),
    Term("elevated inflation", 7),
    Term("tighten", 8), Term("tightening", 8), Term("restrictive", 7),
    Term("sufficiently restrictive", 8), Term("raise rates", 9),
    Term("rate increase", 8), Term("further firming", 7),
    Term("remove accommodation", 8), Term("normalize", 5), Term("normalization", 5),
    Term("tight labor market", 5), Term("labor shortage", 5),
    Term("wage pressures", 6), Term("wage growth", 4),
    Term("strong demand", 4), Term("robust growth", 4), Term("overheated", 7),
    Term("vigilant", 6), Term("attentive to inflation risks", 7),
    Term("prepared to adjust", 5), Term("data do not support", 5), Term("premature", 6))

  /** Dovish phrases, reference order (lexicon.py:50-93). */
  val dovish: Seq[Term] = Seq(
    Term("accommodate", 7), Term("accommodative", 7), Term("supportive", 5),
    Term("support the economy", 6), Term("support growth", 5), Term("stimulus", 7),
    Term("ease", 8), Term("easing", 8), Term("cut rates", 9), Term("rate cut", 9),
    Term("rate reduction", 8), Term("lower rates", 7), Term("reduce the target", 8),
    Term("transitory", 6), Term("temporary", 4), Term("well anchored", 5),
    Term("anchored expectations", 5), Term("below target", 6),
    Term("subdued inflation", 6), Term("disinflation", 5),
    Term("slack", 6), Term("underemployment", 5), Term("maximum employment", 4),
    Term("labor market weakness", 6),
    Term("downside risks", 6), Term("headwinds", 5), Term("uncertainty", 3),
    Term("global risks", 4), Term("fragile", 5), Term("soft landing", 4),
    Term("patient", 6), Term("gradual", 5), Term("data-dependent", 3),
    Term("wait and see", 5), Term("appropriate", 2), Term("monitoring", 2))

  /** Frequency-tracked phrases NOT already in either dictionary
    * (lexicon.py:96-113 minus dictionary keys) — appended to
    * keyword_counts when matched, per score_text's tracked loop. */
  val trackedExtra: Seq[String] = Seq(
    "data dependent", "substantial progress", "inflation expectations",
    "labor market", "financial conditions")

  /** Σ weights ×10 — the score normalizers (lexicon.py:156-157). */
  val maxH10: Long = hawkish.map(_.w10.toLong).sum
  val maxD10: Long = dovish.map(_.w10.toLong).sum

  /** Matched phrases in weight-descending order (ties: hawkish-then-
    * dovish definition order — Python's stable sort on the same list,
    * lexicon.py:177-182); used for the key_phrases digest. */
  val byWeightDesc: Seq[Term] = (hawkish ++ dovish).sortBy(-_.w10)

  private def rx(phrase: String): String = "\\b" + phrase + "\\b"

  /** Non-overlapping word-boundary count of `phrase` in `lowerText`.
    * Spark's Java regex and DuckDB's RE2 agree on `\b` + literal
    * phrases (no metacharacters in the lexicon). */
  def phraseCount(lowerText: Column, phrase: String): Column =
    regexp_count(lowerText, lit(rx(phrase)))

  /** DuckDB mirror of [[phraseCount]] over a lowercased text expr. */
  def oPhraseCount(lowerTextSql: String, phrase: String): String =
    s"LEN(REGEXP_EXTRACT_ALL($lowerTextSql, '${rx(phrase)}'))"
}

package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{CurationOps, TextOps}
import graft.runtime.Tables

/** Corpus-curation stage of the training-data pipeline (the steps
  * between dedup and the tokenizer): benchmark decontamination,
  * temperature-weighted source mixing, and sequence-packing manifests
  * — all over the documents fixture, all DuckDB-oracle-checked.
  * Operators in [[graft.operators.CurationOps]] (parity + scale notes
  * there).
  */
object CurationQueries {

  private def T(s: SparkSession, dir: String) = Tables(s, dir)

  /** doc_id, source, tokens, est-BPE tokens — shared CTE base. */
  private val tokSql =
    """toks AS (
      SELECT doc_id, lang, source,
             list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS t,
             text
      FROM documents
    ),
    per_doc AS (
      SELECT doc_id, source,
        GREATEST(len(t), CAST(CEIL(len(text) / 4.0) AS BIGINT)) AS tok
      FROM toks
    )"""

  private def estBpe = TextOps.estBpeTokens(col("text"))

  val defs: Seq[QueryDef] = Seq(
    // Benchmark decontamination: training docs sharing >=2 distinct
    // word trigrams with the held-out suite (source 'src0' plays the
    // benchmark), scored by the fraction of the bench doc covered.
    QueryDef(
      "q_benchmark_contamination",
      (s, dir) =>
        CurationOps.contaminationPairs(T(s, dir).documents, "doc_id", "text",
          isBench = col("source") === "src0", shingleN = 3,
          minShared = 2, minBenchFrac = 0.2),
      Some(s"""
        WITH $tokSql,
        sh AS (
          SELECT doc_id, source,
            list_distinct(list_transform(range(1, len(t) - 1),
              i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
          FROM toks WHERE len(t) >= 3
        ),
        bex AS (
          SELECT doc_id AS bench_id, CAST(len(s) AS BIGINT) AS bench_ngrams,
                 UNNEST(s) AS g
          FROM sh WHERE source = 'src0'
        ),
        tex AS (
          SELECT doc_id AS train_id, UNNEST(s) AS g
          FROM sh WHERE source <> 'src0'
        ),
        shared AS (
          SELECT train_id, bench_id, bench_ngrams, COUNT(*) AS n_shared
          FROM tex JOIN bex USING (g)
          GROUP BY 1, 2, 3
        )
        SELECT train_id, bench_id, bench_ngrams, n_shared,
          ROUND(CAST(n_shared AS DOUBLE) / bench_ngrams, 4) + 0.0 AS bench_frac,
          CAST(n_shared AS DOUBLE) / bench_ngrams >= 0.2 AS contaminated
        FROM shared WHERE n_shared >= 2
      """)
    ),
    // Temperature-weighted source mixing: sampling rates per source
    // proportional to tokens^0.5, budgeted to half the corpus tokens;
    // deterministic per-doc copy counts (upsampling allowed).
    QueryDef(
      "q_training_mix_sampling",
      (s, dir) =>
        CurationOps.temperatureMixSampling(T(s, dir).documents, "doc_id", "source",
          estBpe, budgetNum = 1, budgetDen = 2),
      Some(s"""
        WITH $tokSql,
        per_src AS (
          SELECT source, SUM(tok) AS src_tokens, COUNT(*) AS n_docs
          FROM per_doc GROUP BY 1
        ),
        wts AS (
          SELECT *, CAST(FLOOR(SQRT(CAST(src_tokens AS DOUBLE)) * 1000) AS BIGINT) AS w
          FROM per_src
        ),
        tot AS (SELECT SUM(w) AS sum_w, SUM(src_tokens) AS total_tokens FROM wts),
        rates AS (
          SELECT source,
            CAST(((total_tokens * 1) // 2) * w AS DOUBLE)
              / CAST(sum_w * src_tokens AS DOUBLE) AS rate
          FROM wts, tot
        )
        SELECT d.doc_id, d.source, d.tok AS est_tokens,
          r.rate AS sample_rate,
          CAST(FLOOR(r.rate) AS BIGINT)
            + CASE WHEN CAST(d.doc_id * 2654435761 % 1000000 AS DOUBLE) / 1000000.0
                        < r.rate - FLOOR(r.rate)
                   THEN 1 ELSE 0 END AS n_copies
        FROM per_doc d JOIN rates r USING (source)
      """)
    ),
    // Sequence-packing manifest: concat-then-chunk into 512-token
    // training sequences per source shard; per-doc chunk range/offset.
    QueryDef(
      "q_sequence_packing",
      (s, dir) =>
        CurationOps.sequencePackingManifest(T(s, dir).documents, "doc_id", "source",
          estBpe, seqLen = 512),
      Some(s"""
        WITH $tokSql,
        packed AS (
          SELECT source AS shard, doc_id, tok,
            SUM(tok) OVER (PARTITION BY source ORDER BY doc_id
              ROWS UNBOUNDED PRECEDING) AS end_tok
          FROM per_doc WHERE tok > 0
        )
        SELECT shard, doc_id, tok AS n_tokens,
          (end_tok - tok) % 512 AS chunk_offset,
          (end_tok - tok) // 512 AS first_chunk,
          (end_tok - 1) // 512 AS last_chunk,
          (end_tok - 1) // 512 - (end_tok - tok) // 512 + 1 AS chunks_spanned
        FROM packed
      """)
    )
  )
}

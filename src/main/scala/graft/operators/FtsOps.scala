package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Full-text search over a documents table (ref macro_agents sec/fts.py
  * :27-80): a denormalized posting-list index + Okapi BM25 keyword
  * ranking (the Spark-native equivalent of the reference's BigQuery
  * SEARCH INDEX + SEARCH() pair).
  *
  * Scale posture: the index build is one explode + hash aggregation
  * (shuffle on (term, doc)); a query touches only the postings of its
  * terms — filter pushdown on `term` prunes the scan when the index is
  * stored partitioned/bucketed by term. Doc-count and average-length
  * scalars ride along as a broadcast single-row frame.
  */
object FtsOps {

  /** Posting-list index: one row per (term, doc) with the term
    * frequency. Store partitioned by term for pruned keyword scans. */
  def postingsIndex(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol), explode(DedupOps.tokens(col(textCol))).as("term"))
      .groupBy(col("term"), col(idCol))
      .agg(count(lit(1)).as("tf"))

  /** Per-doc token counts (BM25 length normalization). */
  def docLengths(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), size(DedupOps.tokens(col(textCol))).cast("long").as("dl"))

  /** Impact-ordered index statistics: per term, document frequency,
    * collection frequency, the max term frequency, and the ids of the
    * `topK` highest-impact postings (tf DESC, id ASC — the block-max /
    * WAND layout a search index stores so scoring can skip low-impact
    * blocks). Terms with df < `minDf` are dropped (singleton terms
    * carry no ranking signal and dominate the vocabulary).
    *
    * One shuffle: the per-term window and the per-term aggregation
    * share the `term` partitioning. Top-k is collected via rank-tagged
    * structs under the k-bound, never the full posting list. */
  def postingStats(postings: DataFrame, idCol: String, topK: Int, minDf: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("term")).orderBy(col("tf").desc, col(idCol).asc)
    postings
      .withColumn("__rk", row_number().over(w))
      .groupBy(col("term"))
      .agg(
        count(lit(1)).as("df"),
        sum(col("tf")).as("cf"),
        max(col("tf")).as("max_tf"),
        array_join(
          transform(
            array_sort(collect_list(when(col("__rk") <= topK,
              struct(col("__rk").as("r"), col(idCol).cast("string").as("d"))))),
            x => x.getField("d")),
          ",").as("top_docs"))
      .filter(col("df") >= minDf)
  }

  /** Okapi BM25 over the posting-list index for a bag of query terms.
    * idf = ln(1 + (N - df + 0.5)/(df + 0.5));
    * contribution = idf * tf*(k1+1) / (tf + k1*(1-b + b*dl/avgdl)).
    * Per-term contributions are snapped to DECIMAL(18,6) and summed
    * exactly (order-independent across engines); `bm25_exact` (the
    * decimal sum) is the ranking key, `bm25` the round-4 display
    * value. Returns (id, n_hits, bm25, rank).
    */
  def bm25Search(
      postings: DataFrame,
      lengths: DataFrame,
      idCol: String,
      queryTerms: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75
  ): DataFrame = {
    val stats = lengths.agg(
      count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val matched = postings.filter(col("term").isin(queryTerms: _*))
    val docFreq = matched.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5))
    val contrib = idf * (col("tf") * (k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))
    val scored = matched
      .join(broadcast(docFreq), Seq("term"))
      .join(lengths, Seq(idCol))
      .crossJoin(broadcast(stats))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_hits"),
        sum(contrib.cast(DecimalType(18, 6))).as("bm25_exact")
      )
    // The matched-doc set grows with the corpus (every doc holding >=1
    // query term) — the GlobalWindowAudit sf0.1->sf1 run measured it at
    // 9.8x over 10x data, the fleet's ONE genuinely unbounded ranking —
    // so the global rank is computed distributed (range partition +
    // per-partition offsets), never through a single-partition window.
    // Total order: exact decimal score desc, unique doc id asc.
    WindowOps.distributedRowNumber(scored,
      Seq(col("bm25_exact").desc, col(idCol).asc), "rank")
      .select(col(idCol), col("n_hits"),
        round(col("bm25_exact").cast("double"), 4).as("bm25"), col("rank"))
  }
}

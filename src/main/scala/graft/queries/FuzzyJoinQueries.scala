package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.FuzzyJoinOps
import graft.runtime.Tables

/** Record-linkage query over the SymSpell fuzzy join: customer names
  * are deterministically corrupted (every non-multiple-of-5 key loses
  * the character at position key % len), then re-linked to the clean
  * roster WITHOUT the key — candidates from the deletion-neighborhood
  * equi-join, exact levenshtein verify, ties resolved by
  * (distance ASC, key ASC) in exact integer arithmetic. The output is
  * the linkage-quality table a dedup/ER pipeline reports: per
  * candidate-multiplicity bucket, how many records resolved and how
  * many resolved to the true identity (the all-zero digit runs in the
  * synthetic names make high-multiplicity buckets genuinely ambiguous
  * — the honest failure mode of ER on low-entropy keys).
  *
  * Fully DuckDB-oracle-checked: both engines implement `levenshtein`
  * and replay the same corruption, neighborhood, and tie-break.
  */
object FuzzyJoinQueries {

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_symspell_linkage",
      (s, dir) => {
        val clean = Tables(s, dir).customer.select(col("c_custkey"), col("c_name"))
        val dirty = clean.select(
          col("c_custkey").as("truth"),
          when(col("c_custkey") % 5 === 0, col("c_name"))
            .otherwise(expr(
              """concat(substring(c_name, 1, CAST(c_custkey % length(c_name) AS INT)),
                        substring(c_name, CAST(c_custkey % length(c_name) AS INT) + 2,
                                  length(c_name)))"""))
            .as("dname"))
        FuzzyJoinOps
          .symspellJoin(dirty, "truth", "dname", clean, "c_custkey", "c_name", maxDist = 1)
          .groupBy(col("truth"), col("dname"))
          .agg(
            count(lit(1)).as("n_candidates"),
            min(col("dist")).as("best_dist"),
            (min(col("dist") * 1000000L + col("c_custkey")) % 1000000L).as("best_key"))
          .groupBy(col("n_candidates").as("candidate_multiplicity"))
          .agg(
            count(lit(1)).as("n_records"),
            sum(when(col("best_key") === col("truth"), 1L).otherwise(0L)).as("n_correct_links"),
            sum(when(col("best_dist") === 0, 1L).otherwise(0L)).as("n_exact"))
      },
      Some("""
        WITH clean AS (SELECT c_custkey AS k, c_name AS name FROM customer),
        dirty AS (
          SELECT k AS truth,
            CASE WHEN k % 5 = 0 THEN name
                 ELSE substr(name, 1, CAST(k % length(name) AS INT))
                      || substr(name, CAST(k % length(name) AS INT) + 2) END AS dname
          FROM clean
        ),
        lvar AS (
          SELECT truth, dname, dname AS variant FROM dirty
          UNION ALL
          SELECT truth, dname,
            substr(dname, 1, CAST(i AS INT)) || substr(dname, CAST(i AS INT) + 2) AS variant
          FROM dirty, RANGE(0, 64) t(i) WHERE i < length(dname)
        ),
        rvar AS (
          SELECT k, name, name AS variant FROM clean
          UNION ALL
          SELECT k, name,
            substr(name, 1, CAST(i AS INT)) || substr(name, CAST(i AS INT) + 2) AS variant
          FROM clean, RANGE(0, 64) t(i) WHERE i < length(name)
        ),
        cand AS (
          SELECT DISTINCT l.truth, l.dname, r.k AS cand_key, r.name AS cand_name
          FROM lvar l JOIN rvar r ON l.variant = r.variant
        ),
        verified AS (
          SELECT truth, dname, cand_key, levenshtein(dname, cand_name) AS dist
          FROM cand WHERE levenshtein(dname, cand_name) <= 1
        ),
        resolved AS (
          SELECT truth, dname, COUNT(*) AS n_candidates, MIN(dist) AS best_dist,
            MIN(dist * 1000000 + cand_key) % 1000000 AS best_key
          FROM verified GROUP BY 1, 2
        )
        SELECT n_candidates AS candidate_multiplicity,
          CAST(COUNT(*) AS BIGINT) AS n_records,
          CAST(SUM(CASE WHEN best_key = truth THEN 1 ELSE 0 END) AS BIGINT) AS n_correct_links,
          CAST(SUM(CASE WHEN best_dist = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_exact
        FROM resolved GROUP BY 1
      """)
    )
  )
}

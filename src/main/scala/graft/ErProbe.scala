package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Entity-resolution scale probe (VERDICT r9 #1): measures WHERE
  * q_entity_resolution's cost lives at a given scale factor, so its
  * sf1→sf10 decade growth (16.74× over 10× data in the committed
  * records) is adjudicated from data, not guessed at.
  *
  * Prints, per stage:
  *  - records / variant rows / distinct fingerprints (the SymSpell
  *    index size — linear in records by construction, O(len) per row);
  *  - the per-fingerprint collision histogram and Σ c·(c−1)/2 =
  *    candidate-pair OCCURRENCES the self-join emits (this is the
  *    quantity that would be super-linear if variant collisions grew
  *    with the corpus — the r9 hypothesis);
  *  - verified distinct pairs (CC input) and CC rounds;
  *  - wall time per stage, so algorithmic growth (row counts) and
  *    execution growth (spill/GC at fixed heap) are separable.
  *
  * Usage: runMain graft.ErProbe <sfDir> [shufflePartitions]
  */
object ErProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val shuffle = if (args.length > 1) args(1) else "32"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label%-38s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // Rebuild the exact q_entity_resolution record feed (FuzzyJoinQueries).
    val base = graft.runtime.Tables(spark, dir).customer
      .select(col("c_custkey").as("k"))
      .withColumn("nm", md5(col("k").cast("string")))
    def feed(prefix: String, posSql: String, sys: String) =
      base.select(
        concat(lit(prefix), col("k")).as("rid"),
        expr(s"concat(substring(nm, 1, CAST($posSql AS INT)), " +
          s"substring(nm, CAST($posSql AS INT) + 2, 32))").as("name"),
        lit(sys).as("src_sys"))
    val records = base
      .select(concat(lit("c"), col("k")).as("rid"), col("nm").as("name"),
        lit("master").as("src_sys"))
      .unionByName(feed("d1x", "k % 32", "feed1"))
      .unionByName(feed("d2x", "(k * 7 + 5) % 32", "feed2"))

    val nRecords = t("records.count")(records.count())

    // The variant index exactly as FuzzyJoinOps.withVariants builds it.
    val variants = records
      .select(col("rid"), col("name"), col("name").as("variant"))
      .unionByName(records
        .withColumn("i", explode(sequence(lit(0), length(col("name")) - 1)))
        .select(col("rid"), col("name"),
          expr("concat(substring(name, 1, i), substring(name, i + 2, length(name)))")
            .as("variant")))
      .select(col("rid"), col("name"), xxhash64(col("variant")).as("__vfp"))

    val nVariants = t("variants.count")(variants.count())

    // Collision structure: per-fingerprint multiplicity c. Candidate
    // OCCURRENCES of the self-join = Σ c² (both orientations + self
    // matches, which the rid_a<rid_b filter prunes). If this is linear
    // in records, the algorithm is linear and any wall-time decade
    // blow-up is execution (memory), not candidates.
    val hist = variants.groupBy(col("__vfp")).count()
      .groupBy(col("count").as("multiplicity"))
      .agg(count(lit(1)).as("n_fingerprints"))
      .orderBy(desc("multiplicity"))
    val rows = t("collision histogram")(hist.collect())
    val sumC2 = rows.map(r => r.getLong(0) * r.getLong(0) * r.getLong(1)).sum
    val distinctFps = rows.map(_.getLong(1)).sum
    println(s"PROBE distinct fingerprints = $distinctFps")
    println(s"PROBE candidate occurrences (sum c^2) = $sumC2  (${sumC2.toDouble / nRecords}%/record)")
    println("PROBE multiplicity histogram (top 12):")
    rows.take(12).foreach(r => println(s"PROBE   c=${r.getLong(0)}  fingerprints=${r.getLong(1)}"))

    // The production pair path, staged: persist index → self-join →
    // verify → distinct (exactly FuzzyJoinOps.symspellSelfJoin).
    val vt = variants.persist()
    t("variant index persist+count")(vt.count())
    val joined = vt.select(col("rid").as("rid_a"), col("name").as("name_a"), col("__vfp"))
      .join(vt.select(col("rid").as("rid_b"), col("name").as("name_b"), col("__vfp")), "__vfp")
      .filter(col("rid_a") =!= col("rid_b"))
    val pairs = joined
      .select(col("rid_a"), col("rid_b"),
        levenshtein(col("name_a"), col("name_b")).as("dist"))
      .filter(col("dist") <= 1)
      .filter(col("rid_a") < col("rid_b"))
      .select(col("rid_a"), col("rid_b"))
      .distinct()
      .persist()
    val nPairs = t("verified distinct pairs (CC input)")(pairs.count())
    println(s"PROBE verified pairs = $nPairs (${nPairs.toDouble / nRecords} per record)")

    val (labels, ccRounds) =
      t("connected components")(
        graft.operators.DedupOps.connectedComponentsWithRounds(pairs, "rid_a", "rid_b"))
    println(s"PROBE cc rounds = $ccRounds, labeled nodes = ${labels.count()}")

    // A/B: the narrow pair path (VERDICT r9 #1 fix) — only (rid, vfp)
    // rides the exchange, strings re-join onto the candidate set.
    pairs.unpersist()
    vt.unpersist()
    val narrow = graft.operators.FuzzyJoinOps
      .symspellSelfPairs(records, "rid", "name", "rid_a", "rid_b")
    val narrowPlan = narrow.queryExecution.executedPlan.toString
    println(s"PROBE narrow plan reuses exchange = ${narrowPlan.contains("ReusedExchange")}")
    val nNarrow = t("NARROW verified pairs (A/B)")(narrow.count())
    println(s"PROBE narrow pairs = $nNarrow (old path = $nPairs)")

    val ents = t("final entity aggregation")({
      records
        .join(labels.select(col("node").as("rid"), col("lbl")), Seq("rid"), "left")
        .withColumn("entity_id", coalesce(col("lbl"), col("rid")))
        .groupBy(col("entity_id"))
        .agg(count(lit(1)).as("n_records"),
          countDistinct(col("src_sys")).as("n_feeds"),
          max(when(col("rid") === col("entity_id"), col("name"))).as("canonical_name"))
        .count()
    })
    println(s"PROBE entities = $ents  records=$nRecords variants=$nVariants")
    spark.stop()
  }
}

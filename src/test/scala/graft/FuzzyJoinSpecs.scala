package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.FuzzyJoinOps
import graft.runtime.GraftSession

/** SymSpell fuzzy join: the depth-1 deletion neighborhood must catch
  * every edit type at distance 1 (deletion, insertion, substitution),
  * reject distance 2, survive empty strings, and achieve exact recall
  * re-linking deterministically corrupted customer names.
  */
class FuzzyJoinSpecs extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.get(Some("local[2]"), 4)
  import spark.implicits._

  override def afterAll(): Unit = spark.stop()

  test("catches deletion, insertion, substitution at dist 1; rejects dist 2") {
    val left  = Seq((1L, "abc"), (2L, "")).toDF("lk", "ls")
    val right = Seq((10L, "abc"), (11L, "ab"), (12L, "abcd"), (13L, "abd"),
      (14L, "abde"), (15L, "a")).toDF("rk", "rs")
    val out = FuzzyJoinOps.symspellJoin(left, "lk", "ls", right, "rk", "rs")
      .select("lk", "rk", "dist").as[(Long, Long, Int)].collect().toSet
    // "abc": exact 0; "ab" deletion 1; "abcd" insertion 1; "abd" substitution 1
    assert(out == Set((1L, 10L, 0), (1L, 11L, 1), (1L, 12L, 1), (1L, 13L, 1), (2L, 15L, 1)))
    // "" matched "a" (insertion); "abde" (dist 2 from abc) correctly absent
  }

  test("exact recall on corrupted customer names (every truth pair survives)") {
    val clean = runtime.Tables(spark, "/root/testdata/sf0.001").customer
      .select(col("c_custkey"), col("c_name"))
    val dirty = clean.select(
      col("c_custkey").as("truth"),
      when(col("c_custkey") % 5 === 0, col("c_name"))
        .otherwise(expr(
          """concat(substring(c_name, 1, CAST(c_custkey % length(c_name) AS INT)),
                    substring(c_name, CAST(c_custkey % length(c_name) AS INT) + 2,
                              length(c_name)))"""))
        .as("dname"))
    val n = clean.count()
    val recalled = FuzzyJoinOps
      .symspellJoin(dirty, "truth", "dname", clean, "c_custkey", "c_name")
      .filter(col("truth") === col("c_custkey"))
      .count()
    assert(recalled == n) // the true identity is always among verified candidates
  }

  test("symspellSelfJoin equals the two-sided self call minus self-pairs") {
    val recs = runtime.Tables(spark, "/root/testdata/sf0.001").customer
      .select(col("c_custkey").cast("string").as("rid"), md5(col("c_custkey").cast("string")).as("name"))
      .limit(300)
    val twoSided = FuzzyJoinOps.symspellJoin(
        recs.select(col("rid").as("a"), col("name").as("na")), "a", "na",
        recs.select(col("rid").as("b"), col("name").as("nb")), "b", "nb")
      .filter(col("a") =!= col("b"))
      .select("a", "b", "dist").collect().map(_.toString).sorted.toSeq
    val self = FuzzyJoinOps.symspellSelfJoin(recs, "rid", "name", "a", "na", "b", "nb")
      .select("a", "b", "dist").collect().map(_.toString).sorted.toSeq
    assert(self == twoSided)
    spark.catalog.clearCache()
  }

  test("symspellSelfPairs equals the selfJoin-derived undirected pair set (narrow ER path)") {
    // The VERDICT r9 #1 rewrite: pairs generated through the narrow
    // (key, fingerprint) exchange + post-join verify must be the
    // EXACT same undirected set the name-carrying selfJoin produced.
    // Fixture reuses the ER shape (master + two corrupted feeds) so
    // multi-variant collisions and dist-0/1 mixes are all present.
    val base = runtime.Tables(spark, "/root/testdata/sf0.001").customer
      .select(col("c_custkey").as("k"))
      .withColumn("nm", md5(col("k").cast("string")))
    def feed(prefix: String, posSql: String) =
      base.select(
        concat(lit(prefix), col("k")).as("rid"),
        expr(s"concat(substring(nm, 1, CAST($posSql AS INT)), " +
          s"substring(nm, CAST($posSql AS INT) + 2, 32))").as("name"))
    val records = base.select(concat(lit("c"), col("k")).as("rid"), col("nm").as("name"))
      .unionByName(feed("d1x", "k % 32"))
      .unionByName(feed("d2x", "(k * 7 + 5) % 32"))
    val old = FuzzyJoinOps.symspellSelfJoin(records, "rid", "name", "a", "na", "b", "nb")
      .filter(col("a") < col("b"))
      .select("a", "b").collect().map(_.toString).sorted.toSeq
    val narrow = FuzzyJoinOps.symspellSelfPairs(records, "rid", "name", "a", "b")
      .select("a", "b").collect().map(_.toString).sorted.toSeq
    assert(narrow == old)
    assert(narrow.nonEmpty)
    spark.catalog.clearCache()
  }

  test("fingerprint keying: variant join key is the 8-byte xxhash64, and ER CC converges in O(log) rounds") {
    // plan-level check: the candidate join must key on the hash, not
    // the variant string (shuffle-width claim in the docstring)
    val left  = Seq((1L, "abc")).toDF("lk", "ls")
    val right = Seq((10L, "abd")).toDF("rk", "rs")
    val plan = FuzzyJoinOps.symspellJoin(left, "lk", "ls", right, "rk", "rs")
      .queryExecution.executedPlan.toString
    assert(plan.contains("__vfp"), "candidate join must key on the xxhash64 fingerprint")
    assert(!plan.contains("[variant"), "the raw variant string must not survive into the join")

    // measured CC rounds on the entity-resolution shape (3-record
    // star clusters): pointer jumping closes them in <= 3 rounds —
    // the SCALE.md dossier cites this measurement
    val base = runtime.Tables(spark, "/root/testdata/sf0.001").customer
      .select(col("c_custkey").as("k"))
      .withColumn("nm", md5(col("k").cast("string")))
    def feed(prefix: String, posSql: String) =
      base.select(
        concat(lit(prefix), col("k")).as("rid"),
        expr(s"concat(substring(nm, 1, CAST($posSql AS INT)), " +
          s"substring(nm, CAST($posSql AS INT) + 2, 32))").as("name"))
    val records = base.select(concat(lit("c"), col("k")).as("rid"), col("nm").as("name"))
      .unionByName(feed("d1x", "k % 32"))
      .unionByName(feed("d2x", "(k * 7 + 5) % 32"))
    val pairs = FuzzyJoinOps.symspellJoin(
        records.select(col("rid").as("rid_a"), col("name").as("name_a")), "rid_a", "name_a",
        records.select(col("rid").as("rid_b"), col("name").as("name_b")), "rid_b", "name_b")
      .filter(col("rid_a") < col("rid_b"))
      .select(col("rid_a"), col("rid_b"))
    val (labels, rounds) =
      graft.operators.DedupOps.connectedComponentsWithRounds(pairs, "rid_a", "rid_b")
    assert(labels.count() > 0)
    assert(rounds <= 3, s"ER star clusters should close in <= 3 pointer-jump rounds, took $rounds")
    info(s"entity-resolution CC rounds at sf0.001: $rounds")
  }
}

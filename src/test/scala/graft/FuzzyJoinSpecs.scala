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
}

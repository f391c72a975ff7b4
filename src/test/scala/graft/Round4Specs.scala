package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DedupOps

/** Round-4 additions: the inverted-index n-gram Jaccard join. */
class Round4Specs extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.ui.enabled", "false")
    .appName("round4-specs")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def fixture = {
    import spark.implicits._
    def doc(seed: Int, len: Int): Seq[String] =
      (0 until len).map(i => s"w${(seed * 31 + i * 7) % 97}_$seed")
    (0 until 10).flatMap { s =>
      val base = doc(s, 30)
      Seq(
        (s * 3L, base.mkString(" ")),
        (s * 3L + 1, (base.dropRight(3) ++ Seq(s"x${s}a", s"x${s}b", s"x${s}c")).mkString(" ")),
        (s * 3L + 2, doc(s + 50, 30).mkString(" "))
      )
    }.toDF("id", "text")
  }

  test("ngramJaccardPairs recalls exactly the brute-force pairs when no shingle is df-capped") {
    val df = fixture
    val sh  = DedupOps.shingleTable(df, "id", "text", 3)
    val lhs = sh.select(col("id").as("id_a"), col("__sh").as("sh_a"))
    val rhs = sh.select(col("id").as("id_b"), col("__sh").as("sh_b"))
    val truth = lhs.crossJoin(rhs).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), DedupOps.jaccard(col("sh_a"), col("sh_b")).as("j"))
      .filter(col("j") >= 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.size >= 10, s"fixture must plant near-dup pairs, got ${truth.size}")

    // maxDf far above any real df on this fixture → candidate
    // generation is complete, so the result equals brute force.
    val got = DedupOps.ngramJaccardPairs(df, "id", "text", shingleN = 3, maxDf = 1000, minJaccard = 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == truth, s"missing=${truth -- got} extra=${got -- truth}")
  }

  test("ngramJaccardPairs df cap drops stop-shingle-only candidates") {
    // maxDf = 1 excludes every shared shingle (shared => df >= 2),
    // so no candidates survive.
    val got = DedupOps.ngramJaccardPairs(fixture, "id", "text", shingleN = 3, maxDf = 1, minJaccard = 0.0)
    assert(got.count() == 0)
  }
}

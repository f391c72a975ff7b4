package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.{JoinOps, SimilarityOps, TextOps, TimeSeriesOps}
import graft.runtime.{GraftSession, MetricsLayer}

/** Specs for library operators not exercised by a declared query. */
class LibrarySpecs extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.get(Some("local[2]"), 4)
  import spark.implicits._

  override def afterAll(): Unit = spark.stop()

  test("latestBefore picks the most recent right row strictly before the left date") {
    val left = Seq(("S", "2020-03-10"), ("S", "2020-01-05"))
      .toDF("sym", "ds").select(col("sym"), to_date(col("ds")).as("event_date"))
    val right = Seq(("S", "2020-01-01", 1.0), ("S", "2020-02-01", 2.0), ("S", "2020-03-10", 3.0))
      .toDF("sym", "ds", "px").select(col("sym"), to_date(col("ds")).as("bar_date"), col("px"))
    val out = JoinOps
      .latestBefore(left, right, Seq("sym"), "event_date", "bar_date", Seq("px"))
      .select(col("event_date").cast("string"), col("px"))
      .as[(String, Option[Double])]
      .collect()
      .toMap
    assert(out("2020-03-10") == Some(2.0)) // 03-10 bar excluded (strictly before)
    assert(out("2020-01-05") == Some(1.0))
  }

  test("dateSpine generates the inclusive daily range") {
    val n = TimeSeriesOps.dateSpine(spark, "2020-02-27", "2020-03-02").count()
    assert(n == 5) // leap year: 27,28,29,1,2
  }

  test("cosineTopK returns k nearest with deterministic tie-break") {
    val corpus = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.9f, 0.1f)), (3L, Seq(0.0f, 1.0f)), (4L, Seq(-1.0f, 0.0f))
    ).toDF("id", "vec")
    val query = Seq(Tuple1(Seq(1.0, 0.0))).toDF("qvec")
    val out = SimilarityOps
      .cosineTopK(corpus, "id", "vec", query, 2)
      .select("id")
      .as[Long]
      .collect()
      .toSeq
    assert(out == Seq(1L, 2L))
  }

  test("lshBucketedTopK finds the exact neighbor inside the probed bucket") {
    val planes = SimilarityOps.hyperplanes(2, 2)
    val corpus = Seq(
      (1L, Seq(1.0f, 0.01f)), (2L, Seq(0.99f, 0.02f)), (3L, Seq(-1.0f, -0.01f))
    ).toDF("id", "vec")
    val query = Seq(Tuple1(Seq(1.0, 0.0))).toDF("qvec")
    val out = SimilarityOps
      .lshBucketedTopK(corpus, "id", "vec", query, planes, 1)
      .select("id")
      .as[Long]
      .collect()
      .toSeq
    assert(out == Seq(1L)) // same-side vectors share the query's bucket
  }

  test("punctRatio and stopwordRatio count as specified") {
    val df = Seq(Tuple1("the cat, the hat!")).toDF("text")
    val out = df
      .select(
        TextOps.punctRatio(col("text")).as("p"),
        TextOps.stopwordRatio(col("text"), Seq("the")).as("s"),
        TextOps.estBpeTokens(col("text")).as("b")
      )
      .as[(Double, Double, Long)]
      .head()
    assert(math.abs(out._1 - 2.0 / 17.0) < 1e-12) // ',' and '!'
    assert(math.abs(out._2 - 2.0 / 4.0) < 1e-12)  // 'the' twice of 4 tokens
    assert(out._3 == math.ceil(17 / 4.0).toLong.max(4L))
  }

  test("langIdHeuristic: argmax wins, ties break to greatest code, zero hits -> und") {
    val markers = Seq("aa" -> Seq("x"), "bb" -> Seq("y"), "cc" -> Seq("z"))
    val df = Seq(("x x y", 1), ("x y", 2), ("q q q", 3)).toDF("text", "id")
    val out = df
      .select(col("id"), TextOps.langIdHeuristic(col("text"), markers).as("pred"))
      .as[(Int, String)]
      .collect()
      .toMap
    assert(out(1) == "aa") // 2 x-hits beat 1 y-hit
    assert(out(2) == "bb") // tie 1-1 -> lexicographically greatest of the tied
    assert(out(3) == "und")
  }

  test("MetricsLayer rejects unknown metrics, resolves known ones") {
    val fact = Seq((1L, 10.0, 0.1, 5.0)).toDF("l_orderkey", "l_extendedprice", "l_discount", "l_quantity")
    intercept[IllegalArgumentException] {
      MetricsLayer.query(fact, Seq("nope"), Seq(lit(1).as("g")))
    }
    val out = MetricsLayer
      .query(fact, Seq("gross_revenue", "line_count"), Seq(lit(1).as("g")))
      .select("gross_revenue", "line_count")
      .as[(Double, Long)]
      .head()
    assert(out == ((10.0, 1L)))
  }
}

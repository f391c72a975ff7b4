package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextClassifierOps
import graft.runtime.GraftSession

/** Hashed-trigram logistic classifier: featurization invariants, exact
  * bit-determinism of the decimal-aggregated training under
  * repartitioning, and actual learning on a separable toy corpus.
  */
class TextClassifierSpecs extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.get(Some("local[2]"), 4)
  import spark.implicits._

  override def afterAll(): Unit = spark.stop()

  private val Dims = 64

  test("featurize: teacher label rule and l1-scaled feature mass") {
    val docs = Seq((1L, "spark spark the"), (2L, "the the the the the the the spark"))
      .toDF("doc_id", "text")
    val f = TextClassifierOps.featurize(docs, "text", Set("spark"), 13, Dims)
      .select("doc_id", "label", "fidx", "fval")
      .collect().map(r => r.getLong(0) -> r).toMap
    // doc 1: kw=2, n=3 -> 200 >= 39 -> 1; doc 2: kw=1, n=8 -> 100 < 104 -> 0
    assert(f(1L).getDouble(1) == 1.0 && f(2L).getDouble(1) == 0.0)
    val idx = f(1L).getSeq[Int](2)
    val v   = f(1L).getSeq[Double](3)
    assert(idx.last == Dims && v.last == 1.0) // bias rides as feature `dims`
    assert(idx.dropRight(1) == idx.dropRight(1).sorted) // ascending buckets
    // trigram mass sums to FeatureScale exactly up to float assembly
    assert(math.abs(v.dropRight(1).sum - TextClassifierOps.FeatureScale) < 1e-9)
  }

  test("training is bit-deterministic under repartitioning (decimal gradient sums)") {
    val docs = runtime.Tables(spark, "/root/testdata/sf0.001").documents.limit(120)
    val kw = Set("spark", "query", "join", "hash")
    val f1 = TextClassifierOps.featurize(docs, "text", kw, 13, Dims)
    val f2 = TextClassifierOps.featurize(docs.repartition(7), "text", kw, 13, Dims)
    val w1 = TextClassifierOps.trainLogReg(f1, Dims, lr = 2.0, iters = 5)
    val w2 = TextClassifierOps.trainLogReg(f2, Dims, lr = 2.0, iters = 5)
    assert(w1.toSeq == w2.toSeq) // EXACT equality, not tolerance
    assert(w1.exists(_ != 0.0))
  }

  test("learns a separable toy teacher to full agreement") {
    // positive docs saturated with the keyword, negatives without it
    val docs = (0 until 40).map { i =>
      val t = if (i % 2 == 0) "spark spark spark join query" else "table row value line sort"
      (i.toLong, t)
    }.toDF("doc_id", "text")
    val f = TextClassifierOps.featurize(docs, "text", Set("spark"), 13, Dims)
    val w = TextClassifierOps.trainLogReg(f, Dims, lr = 2.0, iters = 20)
    val agree = TextClassifierOps.score(f, w)
      .select(((col("score") >= 0.5) === (col("label") === 1.0)).cast("int").as("a"))
      .agg(sum("a")).as[Long].head()
    assert(agree == 40L)
  }
}

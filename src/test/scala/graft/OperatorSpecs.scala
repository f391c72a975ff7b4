package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.functions.GraftFunctions._
import graft.operators._
import graft.runtime.GraftSession

/** Operator unit specs on tiny hand-checked frames — covers the
  * pieces the DuckDB oracle can't (sinks, sequential EMA numerics,
  * SCD2, interpolation edge cases).
  */
class OperatorSpecs extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.get(Some("local[2]"), 4)
  import spark.implicits._

  override def afterAll(): Unit = spark.stop()

  test("recursiveEma matches a hand-rolled sequential fold") {
    val df = Seq(
      ("a", 1L, 10.0), ("a", 2L, 20.0), ("a", 3L, 30.0),
      ("b", 1L, 5.0), ("b", 2L, 15.0)
    ).toDF("k", "o", "v")
    val out = TimeSeriesOps
      .recursiveEma(df, "k", "o", "v", alpha = 0.5, outCol = "ema")
      .orderBy("k", "o")
      .select("k", "o", "ema")
      .as[(String, Long, Double)]
      .collect()
    // a: 10, .5*20+.5*10=15, .5*30+.5*15=22.5 ; b: 5, 10
    assert(out.toSeq == Seq(("a", 1L, 10.0), ("a", 2L, 15.0), ("a", 3L, 22.5), ("b", 1L, 5.0), ("b", 2L, 10.0)))
  }

  test("gapFillInterpolate reference semantics: single-neighbor only") {
    val actuals = Seq(("s", "2020-01-01", 10.0), ("s", "2020-01-04", 40.0), ("s", "2020-01-08", 80.0))
      .toDF("k", "ds", "v")
      .select(col("k"), to_date(col("ds")).as("d"), col("v"))
    val spine = TimeSeriesOps.keyedDateSpine(actuals, Seq("k"), "d")
    val out = TimeSeriesOps
      .gapFillInterpolate(spine, actuals, Seq("k"), "d", "v")
      .orderBy("d")
      .select(col("d").cast("string"), col("imputed_value"), col("data_source"))
      .as[(String, Option[Double], String)]
      .collect()
      .toSeq
    // 01-02: prev=10 (actual), next=null (01-03 is a gap) -> Forward Filled 10
    assert(out(1) == (("2020-01-02", Some(10.0), "Forward Filled")))
    // 01-03: prev=null (01-02 missing), next=40 -> Backward Filled 40
    assert(out(2) == (("2020-01-03", Some(40.0), "Backward Filled")))
    // 01-05..07: middle of a 3-day gap -> the middle one is fully Missing
    assert(out(5)._3 == "Missing")
    assert(out(0)._3 == "Actual" && out(3)._3 == "Actual" && out(7)._3 == "Actual")
  }

  test("mergeUpsert: source wins, unmatched kept, dedup by precedence") {
    val target = Seq((1, "old", 1L), (2, "keep", 1L)).toDF("id", "val", "ver")
    val source = Seq((1, "newer", 2L), (1, "newest", 3L), (3, "insert", 1L)).toDF("id", "val", "ver")
    val out = SinkOps
      .mergeUpsert(target, source, Seq("id"), Seq(col("ver").desc))
      .orderBy("id")
      .as[(Int, String, Long)]
      .collect()
      .toSeq
    assert(out == Seq((1, "newest", 3L), (2, "keep", 1L), (3, "insert", 1L)))
  }

  test("scd2Apply closes changed rows, opens new, keeps unchanged") {
    val current = Seq(
      (1, "acme", "2020-01-01", None: Option[String]),
      (2, "beta", "2020-01-01", None: Option[String]),
      (3, "gone-before", "2019-01-01", Some("2019-06-01"))
    ).toDF("id", "name", "ds", "de")
      .select(col("id"), col("name"), to_date(col("ds")).as("date_started"), to_date(col("de")).as("date_ended"))
    val snapshot = Seq((1, "acme"), (2, "beta-renamed"), (4, "delta")).toDF("id", "name")
    val out = SinkOps.scd2Apply(current, snapshot, Seq("id"), Seq("name"), "2021-01-01")

    val active = out.filter(col("date_ended").isNull).select("id", "name").as[(Int, String)].collect().toSet
    assert(active == Set((1, "acme"), (2, "beta-renamed"), (4, "delta")))
    val closed = out.filter(col("date_ended").isNotNull).select("id").as[Int].collect().toSeq.sorted
    assert(closed == Seq(2, 3)) // beta closed (renamed); historical row untouched
  }

  test("safeDivide and safeCastDouble sentinel handling") {
    val df  = Seq(("1.5", 2.0, 1.0), (".", 0.0, 2.0)).toDF("s", "den", "num")
    val out = df
      .select(
        safeCastDouble(col("s")).as("cast"),
        safeDivide(col("num"), col("den")).as("div")
      )
      .as[(Option[Double], Option[Double])]
      .collect()
      .toSeq
    assert(out == Seq((Some(1.5), Some(0.5)), (None, None)))
  }

  test("ewm equals explicit weighted mean on a toy series") {
    import org.apache.spark.sql.expressions.Window
    val df = Seq(("a", 1, 10.0), ("a", 2, 20.0), ("a", 3, 40.0)).toDF("k", "t", "v")
    val w  = Window.partitionBy("k").orderBy("t")
    val out = df
      .withColumn("pos", row_number().over(w).cast("double"))
      .withColumn("e", WindowOps.ewm(col("v"), col("pos"), w, 3, alpha = 0.5))
      .orderBy("t")
      .select("e")
      .as[Double]
      .collect()
    // t3: (40*1 + 20*.5 + 10*.25)/(1+.5+.25) = 52.5/1.75 = 30
    assert(math.abs(out(2) - 30.0) < 1e-12)
    assert(math.abs(out(0) - 10.0) < 1e-12)
  }

  test("alignedUnion pads missing columns with nulls") {
    val a   = Seq((1, "x")).toDF("id", "a_only")
    val b   = Seq((2, 9.9)).toDF("id", "b_only")
    val out = SinkOps.alignedUnion(a, b)
    assert(out.columns.toSet == Set("id", "a_only", "b_only"))
    assert(out.count() == 2)
    assert(out.filter(col("id") === 2 && col("a_only").isNull).count() == 1)
  }

  test("jaccard + shingles on known strings") {
    val df = Seq((1, "a b c d"), (2, "a b c e")).toDF("id", "text")
    val sh = df.select(col("id"), array_distinct(DedupOps.shingles(col("text"), 2)).as("s"))
    val pair = sh.filter(col("id") === 1)
      .crossJoin(sh.filter(col("id") === 2).select(col("s").as("s2")))
      .select(DedupOps.jaccard(col("s"), col("s2")).as("j"))
      .as[Double]
      .collect()
      .head
    // shingles1 = {ab, bc, cd}, shingles2 = {ab, bc, ce}: 2 common / 4 union
    assert(math.abs(pair - 0.5) < 1e-12)
  }

  test("cosineSimilarity known vectors") {
    val df = Seq((Seq(1.0, 0.0), Seq(0.0, 1.0)), (Seq(1.0, 1.0), Seq(1.0, 1.0)))
      .toDF("a", "b")
    val out = df.select(cosineSimilarity(col("a"), col("b")).as("c")).as[Double].collect()
    assert(math.abs(out(0) - 0.0) < 1e-12)
    assert(math.abs(out(1) - 1.0) < 1e-12)
  }

  test("latestPerGroup picks max order row without a join") {
    val df  = Seq((1, 10, "a"), (1, 20, "b"), (2, 5, "c")).toDF("k", "ord", "payload")
    val out = JoinOps.latestPerGroup(df, Seq("k"), "ord", Seq("payload"))
      .orderBy("k")
      .as[(Int, Int, String)]
      .collect()
      .toSeq
    assert(out == Seq((1, 20, "b"), (2, 5, "c")))
  }
}

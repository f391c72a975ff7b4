package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.{TimeSeriesOps, WindowOps}
import graft.queries.{CrossAssetQueries, FredSignalQueries, TechnicalSignalQueries}
import graft.runtime.GraftSession

/** Round-3 operator specs: the pow-ratio EWM identity, the literal-
  * coefficient recursive EMA behind McClellan/Zweig, the 14-entry
  * portable signal registry, per-code staging grains, and the
  * as_of_date parameterization of the cross-asset entry points.
  */
class Round3Specs extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.get(Some("local[2]"), 4)
  import spark.implicits._

  override def afterAll(): Unit = spark.stop()

  val sf = "/root/testdata/sf0.001"

  test("pow-ratio ewm equals the weight-normalized array definition") {
    val vals = Seq(3.0, 1.5, 4.25, 2.0, 6.5, 5.75, 0.5, 2.25)
    val df = vals.zipWithIndex.map { case (v, i) => (i + 1L, v) }.toDF("o", "v")
    val w = Window.orderBy(col("o"))
    val out = df
      .withColumn("pos", row_number().over(w).cast("double"))
      .withColumn("e", WindowOps.ewm(col("v"), col("pos"), w, window = 4, alpha = 0.3))
      .orderBy("o").select("e").as[Double].collect()
    // brute-force definition: sum(v_i * 0.7^(last-i)) / sum(0.7^(last-i))
    vals.indices.foreach { last =>
      val lo  = math.max(0, last - 3)
      val ws  = (lo to last).map(i => math.pow(0.7, last - i))
      val ref = (lo to last).zip(ws).map { case (i, wt) => vals(i) * wt }.sum / ws.sum
      assert(math.abs(out(last) - ref) < 1e-9, s"row $last")
    }
  }

  test("recursiveEmaCoef honors a non-complementary literal pair") {
    val df = Seq(("m", 1L, 100.0), ("m", 2L, 50.0), ("m", 3L, 80.0)).toDF("k", "o", "v")
    val out = TimeSeriesOps
      .recursiveEmaCoef(df, "k", "o", "v", 0.1818181818, 0.8181818182, "e")
      .orderBy("o").select("e").as[Double].collect()
    val e2 = 0.1818181818 * 50.0 + 0.8181818182 * 100.0
    val e3 = 0.1818181818 * 80.0 + 0.8181818182 * e2
    assert(out(0) == 100.0 && math.abs(out(1) - e2) < 1e-12 && math.abs(out(2) - e3) < 1e-12)
  }

  test("signal registry: 14 entries, portable SQL parses to the right types") {
    assert(TechnicalSignalQueries.Registry.size == 14)
    assert(TechnicalSignalQueries.Registry.map(_.name).distinct.size == 14)
    val cols = Seq("close", "sma_50", "sma_200", "rsi_14", "macd_line", "macd_signal",
      "macd_histogram", "stoch_k_14", "stoch_d_3", "bb_upper_20", "bb_lower_20",
      "bb_bandwidth_pctile_126", "donchian_high_20", "donchian_low_20")
    val prevs = Seq("close", "sma_50", "sma_200", "rsi_14", "macd_line", "macd_signal",
      "macd_histogram", "stoch_k_14", "stoch_d_3", "bb_bandwidth_pctile_126")
      .map(c => s"prev_$c")
    val row = (cols ++ prevs).map(_ => 1.0)
    val dummy = Seq(row).map(r => r.head -> r).toDF("x", "arr")
      .select((cols ++ prevs).zipWithIndex.map { case (c, i) =>
        element_at(col("arr"), i + 1).as(c)
      }: _*)
    TechnicalSignalQueries.Registry.foreach { sg =>
      val out = dummy.select(
        expr(sg.setup).cast("boolean").as("s"),
        expr(sg.trigger).cast("boolean").as("t"),
        expr(sg.value).cast("double").as("v"))
      assert(out.count() == 1, sg.name) // parses + evaluates
    }
  }

  test("fred staging grains: KCFSI monthly starts, GDPC1 quarterly starts") {
    val stg = FredSignalQueries.stgFred(spark, sf, Seq("KCFSI", "GDPC1", "UNRATE"))
    val k = stg.filter(col("series_code") === "KCFSI")
      .filter(dayofmonth(col("date")) =!= 1).count()
    assert(k == 0, "KCFSI observations must land on month starts")
    val g = stg.filter(col("series_code") === "GDPC1")
      .filter(dayofmonth(col("date")) =!= 1 || !month(col("date")).isin(1, 4, 7, 10))
      .count()
    assert(g == 0, "GDPC1 observations must land on quarter starts")
    spark.catalog.clearCache()
  }

  test("cross-asset as_of_date var pins the trailing-window start like dbt --vars") {
    // the reference cutoff is `date >= as_of - 3 YEAR` (a lower bound)
    val pinned = CrossAssetQueries.factorSignals(spark, sf, Some("1995-06-30"))
    val mind = pinned.agg(min(col("date"))).as[java.sql.Date].collect().head
    assert(!mind.toLocalDate.isBefore(java.time.LocalDate.parse("1992-06-30")))
    // the default (corpus-max) anchor starts its window strictly later
    val dflt = CrossAssetQueries.factorSignals(spark, sf, None)
    val minDflt = dflt.agg(min(col("date"))).as[java.sql.Date].collect().head
    assert(minDflt.toLocalDate.isAfter(mind.toLocalDate))
  }
}

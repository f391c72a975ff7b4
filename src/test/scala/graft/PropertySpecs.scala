package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.{CorporateActions, SinkOps, TimeSeriesOps, WindowOps}
import graft.runtime.GraftSession

/** Algebraic property tests (SURVEY.md §5): EWM weight normalization,
  * split-adjustment round-trip, interpolation idempotence, merge
  * idempotence — checked over seeded generated inputs.
  */
class PropertySpecs extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.get(Some("local[2]"), 4)
  import spark.implicits._

  override def afterAll(): Unit = spark.stop()

  private val rng = new scala.util.Random(42)

  test("EWM of a constant series equals the constant (weight normalization)") {
    for (trial <- 1 to 5) {
      val c    = rng.nextDouble() * 100 + 1
      val n    = 30 + rng.nextInt(50)
      val span = 2 + rng.nextInt(20)
      val df   = (1 to n).map(i => ("k", i, c)).toDF("k", "t", "v")
      val w    = Window.partitionBy("k").orderBy("t")
      val out = df
        .withColumn("pos", row_number().over(w).cast("double"))
        .withColumn("e", WindowOps.ewm(col("v"), col("pos"), w, 20, 2.0 / (span + 1.0)))
        .select(max(abs(col("e") - c)))
        .as[Double]
        .head()
      assert(out < 1e-9, s"trial $trial: constant-series EWM drifted by $out")
    }
  }

  test("split adjustment round-trip: adj_price * cum_factor == raw price") {
    for (_ <- 1 to 3) {
      val n = 50 + rng.nextInt(50)
      val bars = (1 to n).map { i =>
        val base = 100.0 + rng.nextDouble() * 10
        ("S", java.sql.Date.valueOf(java.time.LocalDate.of(2020, 1, 1).plusDays(i)),
          base, base + 1, base - 1, base + rng.nextDouble(), 1000.0 + i)
      }.toDF("symbol", "d", "open", "high", "low", "close", "volume")
      val events = Seq(
        ("S", java.sql.Date.valueOf("2020-01-20"), 2.0),
        ("S", java.sql.Date.valueOf("2020-02-10"), 4.0)
      ).toDF("symbol", "d", "split_factor")
      val out = CorporateActions
        .applySplitAdjustment(bars, events, Seq("symbol"), "d")
        .select(max(abs(col("adj_close") * col("cum_future_factor") - col("close"))))
        .as[Double]
        .head()
      assert(out < 1e-9, s"round-trip drift $out")
    }
  }

  test("split adjustment with no events is the identity") {
    val bars = (1 to 20).map { i =>
      ("S", java.sql.Date.valueOf(java.time.LocalDate.of(2020, 1, 1).plusDays(i)),
        1.0, 2.0, 0.5, 1.5, 100.0)
    }.toDF("symbol", "d", "open", "high", "low", "close", "volume")
    val empty = Seq.empty[(String, java.sql.Date, Double)].toDF("symbol", "d", "split_factor")
    val out = CorporateActions
      .applySplitAdjustment(bars, empty, Seq("symbol"), "d")
      .select(max(abs(col("adj_close") - col("close"))), max(abs(col("cum_future_factor") - 1.0)))
      .as[(Double, Double)]
      .head()
    assert(out._1 == 0.0 && out._2 == 0.0)
  }

  test("gap interpolation is the identity on a dense series") {
    for (_ <- 1 to 3) {
      val n = 10 + rng.nextInt(30)
      val actuals = (1 to n).map { i =>
        ("k", java.sql.Date.valueOf(java.time.LocalDate.of(2021, 3, 1).plusDays(i)), rng.nextDouble() * 50)
      }.toDF("k", "d", "v")
      val spine = TimeSeriesOps.keyedDateSpine(actuals, Seq("k"), "d")
      val out = TimeSeriesOps
        .gapFillInterpolate(spine, actuals, Seq("k"), "d", "v")
        .agg(
          sum(when(col("data_source") =!= "Actual", 1).otherwise(0)),
          max(abs(col("imputed_value") - col("v")))
        )
        .as[(Long, Double)]
        .head()
      assert(out._1 == 0L, "dense series must be all Actual")
      assert(out._2 == 0.0, "imputed must equal actual on dense series")
    }
  }

  test("mergeUpsert is idempotent: merging the same source twice == once") {
    for (_ <- 1 to 3) {
      val target = (1 to 20).map(i => (i.toLong, s"v$i", 1L)).toDF("id", "v", "ver")
      val source = (10 to 30).map(i => (i.toLong, s"new$i", 2L)).toDF("id", "v", "ver")
      val once  = SinkOps.mergeUpsert(target, source, Seq("id"), Seq(col("ver").desc))
      val twice = SinkOps.mergeUpsert(once, source, Seq("id"), Seq(col("ver").desc))
      assert(once.exceptAll(twice).count() == 0 && twice.exceptAll(once).count() == 0)
    }
  }

  test("extractTickers: never emits blocklisted or lowercase symbols; stable under repetition") {
    val block = graft.queries.RedditStagingQueries.TickerBlocklist.toSet
    for (_ <- 1 to 5) {
      val toks = (1 to 30).map { _ =>
        rng.nextInt(4) match {
          case 0 => "$" + ('A' + rng.nextInt(26)).toChar.toString * (1 + rng.nextInt(5))
          case 1 => "$" + block.toSeq(rng.nextInt(block.size))
          case 2 => "$" + ('a' + rng.nextInt(26)).toChar.toString * 3
          case _ => "word" + rng.nextInt(100)
        }
      }
      val text  = toks.mkString(" ")
      val df    = Seq(text, text + " " + text).toDF("t") // doubled text too
      val outs = df
        .select(graft.queries.RedditStagingQueries.extractTickers(col("t")).as("x"))
        .collect().map(_.getSeq[String](0).toList)
      outs.foreach { out =>
        assert(out.forall(t => t.nonEmpty && t.length <= 5 && t.forall(_.isUpper)))
        assert(out.forall(t => !block.contains(t)))
        assert(out.distinct == out)
      }
      // dedup makes repetition of the text a no-op on the mention set
      assert(outs(0).toSet == outs(1).toSet)
    }
  }

  test("checkWeeklyCoverage: empty for a complete daily series, non-empty after removing a week") {
    val days = (0 until 400).map(i =>
      ("s", java.sql.Date.valueOf(java.time.LocalDate.of(2023, 1, 2).plusDays(i))))
    val full = days.toDF("k", "d")
    assert(graft.queries.DataTestQueries.checkWeeklyCoverage(full, "k", "d").count() == 0)
    val holed = full.filter(!col("d").between("2023-06-05", "2023-06-11"))
    val missing = graft.queries.DataTestQueries.checkWeeklyCoverage(holed, "k", "d")
      .select("week_start").as[java.sql.Date].collect().toSet
    assert(missing == Set(java.sql.Date.valueOf("2023-06-05")))
  }

  test("normalizeColumnTypes is idempotent and canonical-type closed") {
    val df = Seq(("1", 1.5), ("2", 2.5), ("x", 3.5)).toDF("id", "v")
    val (once, m1)  = SinkOps.normalizeColumnTypes(df, Map("id" -> "INT64"))
    val (twice, m2) = SinkOps.normalizeColumnTypes(once, Map("id" -> "INT64"))
    assert(m1 == Seq("id") && m2.isEmpty)
    assert(once.schema("id").dataType.typeName == "long")
    assert(once.exceptAll(twice).count() == 0)
  }

  test("asofJoin equals a reference in-memory as-of on random clustered timelines") {
    // Randomized semantics check over adversarial shapes the fixture
    // can't produce on demand: duplicate timestamps on both sides,
    // empty keys, matches exactly ON the tolerance boundary.
    import graft.operators.JoinOps
    for (trial <- 1 to 3) {
      val nKeys = 4
      val tol   = 1000L // microseconds
      def ts(us: Long) = new java.sql.Timestamp(us / 1000) // ms precision keeps micros exact*1000
      val rights = (1 to 120).map { i =>
        (i.toLong, rng.nextInt(nKeys).toLong, rng.nextInt(40).toLong * 500L)
      } // (id, key, us) — coarse grid forces ts collisions
      val lefts = (1 to 80).map { i =>
        (1000L + i, rng.nextInt(nKeys + 1).toLong, rng.nextInt(40).toLong * 500L)
      } // key nKeys has no right rows
      val rdf = rights.map { case (id, k, us) => (id, k, ts(us * 1000)) }.toDF("rid", "k", "ts")
      val ldf = lefts.map { case (id, k, us) => (id, k, ts(us * 1000)) }.toDF("lid", "k", "ts")

      val out = JoinOps.asofJoin(ldf, rdf, Seq("k"), "ts", "ts",
        rTieCol = "rid", payload = Seq("rid"), toleranceUs = tol * 1000)
        .select("lid", "bw_rid", "fw_rid")
        .collect().map(r => r.getLong(0) -> (Option(r.get(1)), Option(r.get(2)))).toMap

      lefts.foreach { case (lid, k, us) =>
        val cands = rights.filter(_._2 == k)
        val bw = cands.filter(c => c._3 <= us && us - c._3 <= tol)
          .sortBy(c => (-c._3, -c._1)).headOption.map(_._1)
        val fw = cands.filter(c => c._3 >= us && c._3 - us <= tol)
          .sortBy(c => (c._3, c._1)).headOption.map(_._1)
        assert(out(lid) == ((bw, fw)),
          s"trial $trial lid=$lid k=$k us=$us: got ${out(lid)}, want ($bw, $fw)")
      }
    }
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.queries.{DataTestQueries, DocumentExtractionQueries}
import graft.runtime.GraftSession

/** Unit specs for the dbt-test / asset-check operators and the SEC
  * envelope transform (fixture-independent behavior). */
class DataTestSpecs extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.get(Some("local[2]"), 4)
  import spark.implicits._

  override def afterAll(): Unit = spark.stop()

  test("ohlcConsistency flags each violation class and passes clean rows") {
    val df = Seq(
      // symbol, date, open, high, low, close, adj_close
      ("OK", "2024-01-02", 10.0, 12.0, 9.0, 11.0, 5.5),
      ("HLV", "2024-01-02", 10.0, 8.0, 9.0, 7.9, 4.0),    // high < low
      ("NEG", "2024-01-02", -1.0, 12.0, -2.0, 11.0, 5.5), // open <= 0
      ("ADJ", "2024-01-02", 10.0, 12.0, 9.0, 11.0, 0.05)  // adj < close*0.01
    ).toDF("symbol", "ds", "open", "high", "low", "close", "adj_close")
      .withColumn("date", to_date(col("ds")))
    val bad = DataTestQueries.ohlcConsistency(df).select("symbol").as[String].collect().toSet
    assert(bad == Set("HLV", "NEG", "ADJ"))
  }

  test("uniqueCombination returns only duplicated grain keys with counts") {
    val df = Seq(("A", 1), ("A", 1), ("A", 2), ("B", 1))
      .toDF("sym", "d")
    val dups = DataTestQueries.uniqueCombination(df, Seq("sym", "d"))
      .as[(String, Int, Long)].collect().toSet
    assert(dups == Set(("A", 1, 2L)))
  }

  test("valueInRange honors one-sided and two-sided bounds, skips NULLs") {
    val df = Seq(Some(-0.5), Some(0.5), Some(1.5), None).toDF("v")
    assert(DataTestQueries.valueInRange(df, "v", Some(0.0), Some(1.0)).count() == 2)
    assert(DataTestQueries.valueInRange(df, "v", None, Some(1.0)).count() == 1)
    assert(DataTestQueries.valueInRange(df, "v", Some(0.0), None).count() == 1)
  }

  test("usdCurrencyOnly allows NULL and usd in any case") {
    val df = Seq(("A", "2024-01-02", Some("USD")), ("B", "2024-01-02", Some("usd")),
      ("C", "2024-01-02", Some("EUR")), ("D", "2024-01-02", None))
      .toDF("symbol", "ds", "ccy").withColumn("date", to_date(col("ds")))
    val bad = DataTestQueries.usdCurrencyOnly(df, "ccy")
      .select("symbol").as[String].collect().toSet
    assert(bad == Set("C"))
  }

  test("checkWeeklyCoverage finds exactly the missing (partition, week) pairs") {
    // s1 weekly-complete over 3 weeks; s2 observed only in week 1 and 3
    val rows = Seq(
      ("s1", "2024-01-01"), ("s1", "2024-01-08"), ("s1", "2024-01-15"),
      ("s2", "2024-01-01"), ("s2", "2024-01-15"))
    val df = rows.toDF("series", "ds").withColumn("d", to_date(col("ds")))
    val missing = DataTestQueries.checkWeeklyCoverage(df, "series", "d")
      .select("series", "week_start")
      .as[(String, java.sql.Date)].collect().toSet
    // spine spans the trailing year from max(d): s2 misses 2024-01-08;
    // both series miss every earlier spine week (anchor - 365d onward)
    assert(missing.contains(("s2", java.sql.Date.valueOf("2024-01-08"))))
    assert(!missing.exists { case (s, w) => s == "s1" && w.toString >= "2024-01-01" })
    // week_range label shape
    val lbl = DataTestQueries.checkWeeklyCoverage(df, "series", "d")
      .filter(col("series") === "s2" && col("week_start") === "2024-01-08")
      .select("week_range").as[String].head()
    assert(lbl == "2024-01-08 to 2024-01-14")
  }

  test("extractTickers matches cashtags, honors blocklist, dedups, needs word boundary") {
    val df = Seq(
      ("a", "buy $AAPL and $AAPL again, maybe $MSFT"),
      ("b", "$GDP is macro, $YOLO is slang, $abc is lowercase"),
      ("c", "$401K patterns and $TOOLONGG"),
      ("d", "no tickers here")).toDF("id", "txt")
    val out = df.select(col("id"),
        graft.queries.RedditStagingQueries.extractTickers(col("txt")).as("t"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    assert(out("a") == List("AAPL", "MSFT")) // deduped, order preserved
    assert(out("b") == Nil)                  // blocklist + case
    assert(out("c") == Nil)                  // $401K: K blocklisted; >5 letters no match
    assert(out("d") == Nil)
  }

  test("validateIdentifier accepts dotted identifiers, rejects injection shapes") {
    import graft.operators.SinkOps
    assert(SinkOps.validateIdentifier("events_raw") == "events_raw")
    assert(SinkOps.validateIdentifier("proj.ds.table") == "proj.ds.table")
    intercept[IllegalArgumentException](SinkOps.validateIdentifier("a.b.c.d"))
    intercept[IllegalArgumentException](SinkOps.validateIdentifier("t; DROP TABLE x"))
    intercept[IllegalArgumentException](SinkOps.validateIdentifier("1table"))
  }

  test("normalizeColumnTypes repairs only requested drifted columns via try_cast") {
    import graft.operators.SinkOps
    val df = Seq(("1", "x", 2.0), ("oops", "y", 3.0)).toDF("id", "tag", "v")
    val (fixed, mismatched) = SinkOps.normalizeColumnTypes(df,
      Map("id" -> "INT64", "v" -> "FLOAT64"))
    assert(mismatched == Seq("id")) // v already canonical FLOAT64 (double)
    val out = fixed.collect().map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)), r.getString(1)))
    assert(out.contains((Some(1L), "x")))
    assert(out.contains((None, "y"))) // bad cell -> NULL, never a failed job
    assert(fixed.schema("tag").dataType.typeName == "string") // untouched
    // no drift -> unchanged frame, empty report
    assert(SinkOps.normalizeColumnTypes(df, Map("tag" -> "STRING"))._2.isEmpty)
  }

  test("envelopeText strips markup, extracts metadata, prefers symbol-layout paths") {
    val registry = Seq(
      // same content under legacy + symbol layout -> keep symbol layout
      ("doc-1", "SYMA/1.json", "<html><body><p>Alpha  beta</p></body></html>",
        """{"filing_id": "F1", "symbol": "SYMA", "form_type": "10-K"}""", "h1"),
      ("doc-1", "10-K/1.json", "<html><body><p>Alpha  beta</p></body></html>",
        """{"filing_id": "F1", "symbol": "SYMA", "form_type": "10-K"}""", "h1"),
      ("doc-2", "10-Q/2.json", "<p>Solo legacy</p>",
        """{"filing_id": "F2", "symbol": "SYMB", "form_type": "10-Q"}""", "h2"))
      .toDF("document_id", "source_path", "content", "metadata", "content_hash")
      .withColumn("source_uri", concat(lit("mem://"), col("source_path")))
      .withColumn("extracted_at", lit("2024-02-01 00:00:00").cast("timestamp"))
    val byHash = DocumentExtractionQueries.envelopeText(registry)
      .select("content_hash", "source_path", "text", "form_type")
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getString(2), r.getString(3))).toMap
    assert(byHash.size == 2) // dedup by content_hash
    assert(byHash("h1")._1 == "SYMA/1.json") // symbol layout wins
    assert(byHash("h1")._2 == "Alpha beta")  // tags stripped, whitespace collapsed
    assert(byHash("h2")._3 == "10-Q")        // json field extraction
  }
}

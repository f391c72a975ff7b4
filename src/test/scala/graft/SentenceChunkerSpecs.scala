package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.runtime.GraftSession
import graft.textml.SentenceChunker

/** Reference-semantics specs for the sentence-aware chunker
  * (sec/search.py:30-119). */
class SentenceChunkerSpecs extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.get(Some("local[2]"), 4)
  import spark.implicits._

  override def afterAll(): Unit = spark.stop()

  test("sentence split honors boundaries, paragraph breaks, abbreviation rejoin") {
    val s = SentenceChunker.splitIntoSentences(
      "Dr. Smith met Mr. Jones. They talked.\n\nNew paragraph here. the end stays attached")
    // "Dr." and "Mr." fragments rejoin (abbreviation rule); "Jones." is
    // a real boundary; lowercase continuation never splits
    assert(s == Vector(
      "Dr. Smith met Mr. Jones.",
      "They talked.",
      "New paragraph here. the end stays attached"))
  }

  test("short text returns a single chunk unchanged") {
    val t = "One. Two. Three."
    assert(SentenceChunker.splitTextIntoChunks(t, targetWords = 500) == Vector(t))
  }

  test("chunks overlap by N sentences and small tails merge") {
    val sentences = (1 to 12).map(i => s"Sentence number $i has five words.")
    val text = sentences.mkString(" ")
    // each sentence = 6 words; target 18 → chunks of 3 sentences,
    // overlap 1 sentence
    val chunks = SentenceChunker.splitTextIntoChunks(text, targetWords = 18,
      overlapSentences = 1)
    assert(chunks.nonEmpty)
    // consecutive chunks share their boundary sentence
    chunks.sliding(2).foreach {
      case Vector(a, b) =>
        val lastOfA = a.split("(?<=\\.)\\s+").last
        assert(b.startsWith(lastOfA.take(12)),
          s"chunk must start with the overlap sentence: '$b' vs '$lastOfA'")
      case _ => ()
    }
    // every source sentence appears in at least one chunk
    sentences.foreach(s => assert(chunks.exists(_.contains(s))))
  }

  test("chunk ids are content-addressed and stable; table form explodes per chunk") {
    assert(SentenceChunker.chunkId("F1", "risk", 0) ==
      SentenceChunker.chunkId("F1", "risk", 0))
    assert(SentenceChunker.chunkId("F1", "risk", 0) !=
      SentenceChunker.chunkId("F1", "risk", 1))
    val df = Seq(("d1", "body", ((1 to 40).map(i => s"Word salad item $i here.")).mkString(" ")))
      .toDF("doc", "section", "text")
    val out = SentenceChunker.chunkTable(df, "doc", col("section"), col("text"),
      targetWords = 30, overlapSentences = 2)
    assert(out.count() > 1)
    assert(out.select("chunk_id").distinct().count() == out.count())
    assert(out.filter(col("word_count") <= 0).count() == 0)
  }
}

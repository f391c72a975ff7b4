package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BpeOps
import graft.operators.BpeOps.BpeMerge
import graft.runtime.GraftSession

/** BPE tokenizer semantics pinned on the Sennrich-style textbook
  * corpus (merge sequence hand-derived, including the freq/lex
  * tie-break ladder), the greedy rank-order encode, the lossless
  * round-trip property, and partitioning invariance of the distributed
  * word-counting stage.
  */
class BpeSpecs extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.get(Some("local[2]"), 4)
  import spark.implicits._

  override def afterAll(): Unit = spark.stop()

  private val textbook = Seq(
    "low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)

  test("trainFromCounts reproduces the hand-derived textbook merge sequence") {
    val merges = BpeOps.trainFromCounts(textbook, numMerges = 60)
    val expected = Seq(
      // (freq DESC, left ASC, right ASC): the 9-tie resolves e<s<t,
      // then each fused symbol re-enters the lexicographic order
      (0, "e", "s", 9L), (1, "es", "t", 9L), (2, "est", "</w>", 9L),
      (3, "l", "o", 7L), (4, "lo", "w", 7L),
      (5, "e", "w", 6L), (6, "ew", "est</w>", 6L), (7, "n", "ewest</w>", 6L),
      (8, "low", "</w>", 5L),
      (9, "d", "est</w>", 3L), (10, "i", "dest</w>", 3L), (11, "w", "idest</w>", 3L),
      (12, "e", "r", 2L), (13, "er", "</w>", 2L), (14, "low", "er</w>", 2L)
    ).map { case (k, l, r, c) => BpeMerge(k, l, r, c) }
    assert(merges == expected) // stops at 15: no pair left with freq >= 2
  }

  test("encodeWord: greedy lowest-rank apply; unseen words segment into learned subwords") {
    val merges = BpeOps.trainFromCounts(textbook, numMerges = 60).toIndexedSeq
    val ranks = merges.map(m => (m.lhs, m.rhs) -> m.rank).toMap
    def enc(w: String) = BpeOps.encodeWord(w, merges, ranks).toSeq
    assert(enc("low") == Seq("low</w>"))
    assert(enc("newest") == Seq("newest</w>"))
    // "lowest" is NOT in the training set: stem + suffix compose
    assert(enc("lowest") == Seq("low", "est</w>"))
    // unknown chars fall through as singletons
    assert(enc("lox") == Seq("lo", "x", "</w>"))
  }

  test("round-trip: concat(tokens) == word + </w> for every corpus word") {
    val docs = runtime.Tables(spark, "/root/testdata/sf0.001").documents
    val merges = BpeOps.train(docs, "text", numMerges = 60, minCount = 2L)
    val table = merges.toIndexedSeq
    val ranks = table.map(m => (m.lhs, m.rhs) -> m.rank).toMap
    val words = docs.limit(50).collect().flatMap(r =>
      BpeOps.WordPattern.r.findAllIn(r.getAs[String]("text").toLowerCase))
    assert(words.nonEmpty)
    words.foreach { w =>
      val toks = BpeOps.encodeWord(w, table, ranks)
      assert(toks.mkString == w + BpeOps.Eow, s"lossy encode of '$w'")
    }
  }

  test("maxVocab cap: generous cap leaves the merge table unchanged; tight cap keeps top-freq words") {
    val docs = runtime.Tables(spark, "/root/testdata/sf0.001").documents
    val uncapped = BpeOps.train(docs, "text", numMerges = 40, minCount = 2L)
    // the default cap (1M) is far above this corpus's vocabulary, so
    // it must be a no-op on the trained table
    val capped = BpeOps.train(docs, "text", numMerges = 40, minCount = 2L, maxVocab = 1000000)
    assert(uncapped == capped)
    // a vocabulary-sized cap is also a no-op (boundary: cap == |vocab|)
    val vocabN = BpeOps.wordCounts(docs, "text").filter($"freq" >= 2L).count().toInt
    assert(BpeOps.train(docs, "text", numMerges = 40, minCount = 2L, maxVocab = vocabN) == uncapped)
    // a tight cap trains only on the highest-frequency words: every
    // surviving merge frequency is explainable from the kept table
    val tight = BpeOps.trainFromCounts(
      BpeOps.wordCounts(docs, "text").filter($"freq" >= 2L)
        .orderBy($"freq".desc, $"word".asc).limit(50)
        .as[(String, Long)].collect().toSeq, numMerges = 40)
    assert(BpeOps.train(docs, "text", numMerges = 40, minCount = 2L, maxVocab = 50) == tight)
  }

  test("training is invariant to input partitioning; tokenize counts match encodeText") {
    val docs = runtime.Tables(spark, "/root/testdata/sf0.001").documents
    val a = BpeOps.train(docs, "text", numMerges = 40, minCount = 2L)
    val b = BpeOps.train(docs.repartition(7), "text", numMerges = 40, minCount = 2L)
    assert(a == b)
    val sample = docs.orderBy("doc_id").limit(3).collect()
    val counted = BpeOps.tokenize(docs.orderBy("doc_id").limit(3), "text", a)
      .select("doc_id", "n_tokens").as[(Long, Long)].collect().toMap
    sample.foreach { r =>
      val expect = BpeOps.encodeText(r.getAs[String]("text"), a).length.toLong
      assert(counted(r.getAs[Long]("doc_id")) == expect)
    }
  }
}

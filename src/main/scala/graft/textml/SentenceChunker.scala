package graft.textml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sentence-aware overlapping chunker 1:1 (ref
  * macro_agents/defs/domains/sec/search.py:30-119): sentence
  * boundaries at `[.!?] + whitespace + uppercase` or paragraph
  * breaks, abbreviation fragments rejoined (Mr/Inc/etc...), sentences
  * grouped into ~targetWords chunks with an overlapSentences-sentence
  * carry-over, and a small tail (< target/4 words) merged into the
  * previous chunk.
  *
  * The per-document grouping loop is inherently sequential (the same
  * loop the reference runs in Python per row), so it runs as a typed
  * per-row function — one pass per document, embarrassingly parallel
  * across documents, no shuffle. Chunk ids are content-addressed
  * (sha256 of filing:section:index, ref :49-51).
  */
object SentenceChunker {

  /** ref search.py:30-43 */
  val Abbreviations: Set[String] =
    Set("Mr", "Mrs", "Ms", "Dr", "Inc", "Corp", "Ltd", "Jr", "Sr", "vs", "etc")

  private val SentenceSplit = """(?<=[.!?])\s+(?=[A-Z])|\n{2,}""".r

  /** ref search.py:54-73 — split + abbreviation rejoin. */
  def splitIntoSentences(text: String): Vector[String] = {
    if (text == null) return Vector.empty
    val raw = SentenceSplit.split(text)
    raw.foldLeft(Vector.empty[String]) { (acc, frag0) =>
      val frag = frag0.trim
      if (frag.isEmpty) acc
      else if (acc.nonEmpty && {
        val lastWord = acc.last.split("\\s+").last.stripSuffix(".")
        Abbreviations.contains(lastWord)
      }) acc.init :+ (acc.last + " " + frag)
      else acc :+ frag
    }
  }

  private def words(s: String): Int = s.split("\\s+").count(_.nonEmpty)

  /** ref search.py:75-119 — group sentences into overlapping chunks. */
  def splitTextIntoChunks(text: String, targetWords: Int = 500,
                          overlapSentences: Int = 2): Vector[String] = {
    val sentences = splitIntoSentences(text)
    if (sentences.isEmpty) return Vector.empty
    val totalWords = sentences.map(words).sum
    if (totalWords <= targetWords) return Vector(text.trim)

    var chunks = Vector.empty[String]
    var current = Vector.empty[String]
    var currentWords = 0
    sentences.foreach { s =>
      current = current :+ s
      currentWords += words(s)
      if (currentWords >= targetWords) {
        chunks = chunks :+ current.mkString(" ")
        current = current.takeRight(overlapSentences)
        currentWords = current.map(words).sum
      }
    }
    if (current.nonEmpty) {
      val remaining = current.mkString(" ")
      if (chunks.nonEmpty && currentWords < targetWords / 4)
        chunks = chunks.init :+ (chunks.last + " " + remaining)
      else chunks = chunks :+ remaining
    }
    chunks
  }

  /** ref search.py:49-51 — 16-hex content-addressed chunk id. */
  def chunkId(filingId: String, section: String, index: Int): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.digest(s"$filingId:$section:$index".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(16)
  }

  private val chunksUdf =
    udf((t: String, tw: Int, ov: Int) => splitTextIntoChunks(t, tw, ov))
  private val chunkIdUdf =
    udf((f: String, s: String, i: Int) => chunkId(f, s, i))

  /** DataFrame form: one row per chunk with content-addressed ids. */
  def chunkTable(df: DataFrame, idCol: String, sectionCol: Column,
                 textCol: Column, targetWords: Int = 500,
                 overlapSentences: Int = 2): DataFrame =
    df.select(col(idCol), sectionCol.as("__section"),
        posexplode(chunksUdf(textCol, lit(targetWords), lit(overlapSentences)))
          .as(Seq("chunk_index", "chunk_text")))
      .select(
        chunkIdUdf(col(idCol).cast("string"), col("__section"),
          col("chunk_index")).as("chunk_id"),
        col(idCol), col("__section").as("section_name"),
        col("chunk_index"), col("chunk_text"),
        size(split(col("chunk_text"), "\\s+")).cast("long").as("word_count"))
}

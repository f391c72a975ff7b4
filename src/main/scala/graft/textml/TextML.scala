package graft.textml

import org.apache.spark.ml.clustering.{KMeans, LDA}
import org.apache.spark.ml.feature.{CountVectorizer, IDF, Normalizer, RegexTokenizer, StopWordsRemover}
import org.apache.spark.ml.linalg.{SparseVector, Vector}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Document ML layer (SURVEY.md §2.L; refs document_extraction/models/
  * sec_document_{chunks,tfidf,clusters,topics}.yml): chunking, TF-IDF,
  * KMeans clustering with c-TF-IDF top terms, topic modeling.
  *
  * Chunking is pure Catalyst (portable to a SQL oracle); the ML
  * stages are Spark ML pipelines (seeded, deterministic per version),
  * exposed as rows-only queries.
  */
object TextML {

  /** Fixed-size overlapping character chunking with content-addressed
    * chunk ids (ref sec_document_chunks.yml: size 800, overlap 100).
    * Pure expression composition (sequence + explode + substring) —
    * no UDF, distributes trivially, oracle-portable.
    * Returns (id, chunk_index, chunk_offset, chunk_text, chunk_id). */
  def chunkDocumentsFlat(
      df: DataFrame,
      idCol: String,
      textCol: String,
      chunkSize: Int,
      overlap: Int
  ): DataFrame = {
    val step = chunkSize - overlap
    val n    = greatest(ceil((length(col(textCol)) - lit(overlap)) / step.toDouble).cast("int"), lit(1))
    df.select(col(idCol), col(textCol), explode(sequence(lit(0), n - 1)).as("chunk_index"))
      .select(
        col(idCol),
        col("chunk_index").cast("long").as("chunk_index"),
        (col("chunk_index") * step).cast("long").as("chunk_offset"),
        substring(col(textCol), col("chunk_index") * step + 1, lit(chunkSize)).as("chunk_text")
      )
      .withColumn("chunk_id", md5(concat_ws(":", col(idCol), col("chunk_offset"))))
  }

  /** TF-IDF pipeline over a text column (ref sec_document_tfidf.yml:
    * token pattern [a-zA-Z]{3,20}, english stopwords, minDF 2,
    * maxDF 0.85, vocab 20k). Returns (df + features vector, vocab). */
  def tfidf(
      df: DataFrame,
      textCol: String,
      vocabSize: Int = 20000,
      minDF: Double = 2.0,
      maxDF: Double = 0.85
  ): (DataFrame, Array[String]) = {
    val tok = new RegexTokenizer()
      .setInputCol(textCol).setOutputCol("__tokens")
      .setPattern("[a-zA-Z]{3,20}").setGaps(false).setToLowercase(true)
    val stop = new StopWordsRemover().setInputCol("__tokens").setOutputCol("__terms")
    val cv = new CountVectorizer()
      .setInputCol("__terms").setOutputCol("__tf")
      .setVocabSize(vocabSize).setMinDF(minDF).setMaxDF(maxDF)
    val tokens  = stop.transform(tok.transform(df))
    val cvModel = cv.fit(tokens)
    val tf      = cvModel.transform(tokens)
    val idf     = new IDF().setInputCol("__tf").setOutputCol("tfidf").fit(tf)
    (idf.transform(tf).drop("__tokens", "__tf"), cvModel.vocabulary)
  }

  /** Explode the full TF-IDF matrix to (id, term, score) triples. */
  def tfidfTriples(withTfidf: DataFrame, idCol: String, vocab: Array[String]): DataFrame = {
    val spark       = withTfidf.sparkSession
    val vocabLookup = spark.sparkContext.broadcast(vocab)
    val extract = udf { (v: Vector) =>
      val sv = v.asInstanceOf[SparseVector]
      sv.indices.zip(sv.values).map { case (i, s) => (vocabLookup.value(i), s) }.toSeq
    }
    withTfidf
      .select(col(idCol), explode(extract(col("tfidf"))).as("ts"))
      .select(col(idCol), col("ts._1").as("term"), col("ts._2").as("score"))
  }

  /** Explode the top-k TF-IDF terms per document, deterministically
    * ordered by (score desc, term asc). */
  def topTerms(withTfidf: DataFrame, idCol: String, vocab: Array[String], k: Int): DataFrame = {
    val w = Window.partitionBy(col(idCol)).orderBy(col("score").desc, col("term").asc)
    tfidfTriples(withTfidf, idCol, vocab)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .drop("rn")
  }

  /** L2-normalize + seeded KMeans (ref sec_document_clusters.yml:
    * k 8, normalized so Euclidean ~ cosine). */
  def cluster(withTfidf: DataFrame, k: Int = 8, seed: Long = 42L): DataFrame = {
    val norm = new Normalizer().setInputCol("tfidf").setOutputCol("__norm").setP(2.0)
    val km = new KMeans()
      .setK(k).setSeed(seed).setMaxIter(20)
      .setFeaturesCol("__norm").setPredictionCol("cluster_id")
    // cache: KMeans iterates over the features; without this every
    // iteration re-runs the tokenize+CV+IDF lineage
    val normalized = norm.transform(withTfidf).cache()
    try km.fit(normalized).transform(normalized).drop("__norm")
    finally normalized.unpersist(blocking = false)
  }

  /** Seeded LDA topics (kept alongside true NMF — see [[NMF.fit]],
    * which is the reference-faithful path for sec_document_topics.yml). */
  def topics(withTf: DataFrame, k: Int = 8, seed: Long = 42L): DataFrame = {
    val lda = new LDA()
      .setK(k).setSeed(seed).setMaxIter(10)
      .setFeaturesCol("tfidf").setTopicDistributionCol("topic_dist")
    val cached = withTf.cache()
    try lda.fit(cached).transform(cached)
    finally cached.unpersist(blocking = false)
  }

  /** True NMF document topics (ref sec_document_topics.yml:8-25): fit
    * W H ≈ TF-IDF, assign each doc its argmax-weight topic (ties → the
    * lowest topic id, matching numpy argmax). Returns
    * (id, topic_id, topic_weight). */
  def nmfTopics(withTfidf: DataFrame, idCol: String, vocab: Array[String], k: Int = 8): DataFrame = {
    val triples = tfidfTriples(withTfidf, idCol, vocab)
    val (w, _)  = NMF.fit(triples, idCol, "term", "score", k)
    val packed  = array((0 until k).map(t => struct(col(s"w_$t").as("w"), lit(-t).as("negT"))): _*)
    w.select(
      col(idCol),
      (-array_max(packed).getField("negT")).cast("long").as("topic_id"),
      round(array_max(packed).getField("w"), 6).as("topic_weight")
    )
  }
}

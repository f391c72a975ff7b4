package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing for a training-data pipeline: media as
  * opaque `binary` columns with typed metadata, batch-shaped
  * featurization, and frame sampling.
  *
  * The DECODE step is a clearly-marked deterministic STUB: real
  * image/audio/video decoding needs codec libraries that are not in
  * this container. Everything Spark-side — schema, batching shape,
  * partitioning, content addressing — is real and tested; swapping
  * the stub for a JNI/ONNX decoder changes no plan shape.
  */
object MultimodalOps {

  /** Media record schema: the shape a 100 TB multimodal lake table
    * would carry (id, media_type, content, metadata struct). */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("media_type", StringType),
    StructField("content", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("byte_len", LongType),
      StructField("content_hash", StringType),
      StructField("source", StringType)
    )))
  ))

  /** Build a media table from a text corpus (fixture path: content =
    * utf-8 bytes). Production replaces this with binary file reads
    * (spark.read.format("binaryFile")). */
  def fromText(df: DataFrame, idCol: String, textCol: String, sourceCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit("text/plain").as("media_type"),
      encode(col(textCol), "UTF-8").as("content"),
      struct(
        length(col(textCol)).cast("long").as("byte_len"),
        md5(col(textCol)).as("content_hash"),
        col(sourceCol).as("source")
      ).as("meta")
    )

  /** Frame sampling shape: every `stride`-th fixed-size block of the
    * content, with content-addressed frame ids (video frame-sample /
    * audio-chunk analogue). Pure Catalyst — explode of a sequence. */
  def sampleFrames(media: DataFrame, blockSize: Int, stride: Int): DataFrame = {
    val nBlocks = greatest(ceil(col("meta.byte_len") / blockSize.toDouble).cast("int"), lit(1))
    val nFrames = (ceil(nBlocks / stride.toDouble)).cast("int")
    media
      .select(col("media_id"), col("media_type"), col("content"), col("meta"),
        explode(sequence(lit(0), nFrames - 1)).as("frame_seq"))
      .select(
        col("media_id"),
        (col("frame_seq") * stride).cast("long").as("frame_index"),
        (col("frame_seq") * stride * blockSize).cast("long").as("frame_offset"),
        md5(substring(col("content"), (col("frame_seq") * stride * lit(blockSize)) + 1, lit(blockSize)))
          .as("frame_hash")
      )
  }

  /** Batch-shaped featurization — the Scala analogue of a Pandas-UDF
    * `mapInPandas` pass: rows are processed per-partition in fixed
    * batches (vectorization boundary). The per-item "decode" is a
    * DETERMINISTIC FAKE (first bytes scaled to [0,1]); a real decoder
    * slots into `decodeStub` without touching the plan. */
  def batchedFeaturize(media: DataFrame, embDim: Int = 8, batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(media.schema.fields ++ Seq(
      StructField("stub_embedding", ArrayType(FloatType)),
      StructField("stub_brightness", DoubleType)
    ))
    val contentIdx = media.schema.fieldIndex("content")
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { row =>
          val bytes           = row.getAs[Array[Byte]](contentIdx)
          val (emb, bright)   = decodeStub(bytes, embDim)
          Row.fromSeq(row.toSeq :+ emb :+ bright)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** STUB: stands in for image/audio decode + feature extraction.
    * Deterministic on content bytes so tests are stable. */
  private def decodeStub(bytes: Array[Byte], embDim: Int): (Seq[Float], Double) = {
    val emb = (0 until embDim).map { i =>
      if (i < bytes.length) (bytes(i) & 0xff) / 255.0f else 0.0f
    }
    val n      = math.min(bytes.length, 256)
    val bright = if (n == 0) 0.0 else (0 until n).map(i => (bytes(i) & 0xff).toDouble).sum / n / 255.0
    (emb, bright)
  }
}

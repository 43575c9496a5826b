package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines.
  *
  * Images/audio/video are opaque `binary` columns with a typed metadata
  * struct riding alongside. Decode / feature-extraction runs as a
  * partition-wise batch transform (`mapPartitions` — the Scala analogue of
  * `mapInPandas`: one iterator per partition, vectorizable batches, executor-
  * local native libs). The Spark-side plumbing — schema, batch iteration,
  * output encoder, partitioning — is real and tested.
  *
  * ===== STUB BOUNDARY =====
  * This container ships no image/audio codecs, so [[FakeCodec]] stands in for
  * the real decoder: a deterministic function of the payload bytes. Swapping
  * in a real codec changes ONLY the body of `FakeCodec.decode` — every
  * signature, schema and partition shape stays as-is.
  */
object Multimodal {

  /** Decoded-feature schema a real image decoder would produce. */
  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("byte_len", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("digest", StringType)))

  /** ===== STUB: deterministic fake decoder (no codecs in this container).
    * Real implementation would parse the container format here. ===== */
  object FakeCodec {
    def decode(payload: Array[Byte]): (Int, Int, Int, Int, String) = {
      val len = payload.length
      val width = 64 + len % 576          // fake intrinsic dimensions
      val height = 64 + (len * 7) % 296
      val frames = len / 100 + 1          // fake frame count (1 per 100 bytes)
      val digest = java.security.MessageDigest.getInstance("MD5")
        .digest(payload).map("%02x".format(_)).mkString
      (len, width, height, frames, digest)
    }
  }

  /** Wrap a text corpus as fake media rows: payload = utf-8 bytes, plus the
    * typed metadata struct every real media table carries. */
  def attachMedia(docs: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame =
    docs.select(col(idCol), encode(col(textCol), "UTF-8").as("media"),
      struct(lit("image/fake").as("mime"),
        length(col(textCol)).as("content_length")).as("media_meta"))

  /** Partition-wise decode: one pass per partition over the binary payloads,
    * emitting the feature rows. Batch shape = the partition iterator, exactly
    * like a mapInPandas batch stream. */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(featureSchema)
    media.select(col("doc_id"), col("media"))
      .mapPartitions { rows: Iterator[Row] =>
        rows.map { r =>
          val id = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          val (len, w, h, frames, digest) = FakeCodec.decode(payload)
          Row(id, len, w, h, frames, digest)
        }
      }(enc)
  }

  /** Fake resize: recompute target dims keeping aspect (pure arithmetic on
    * the decoded features — a real impl would transform pixels partition-
    * wise in the same shape). */
  def resize(features: DataFrame, maxDim: Int): DataFrame =
    features
      .withColumn("scale",
        when(greatest(col("width"), col("height")) > maxDim,
          lit(maxDim).cast("double") / greatest(col("width"), col("height")).cast("double"))
          .otherwise(lit(1.0)))
      .withColumn("out_width", floor(col("width") * col("scale")).cast("int"))
      .withColumn("out_height", floor(col("height") * col("scale")).cast("int"))

  /** Frame sampling: every `stride`-th frame index (metadata-level; a real
    * video impl would seek per partition). */
  def sampleFrames(features: DataFrame, stride: Int): DataFrame =
    features.withColumn("sampled_frames",
      sequence(lit(0), col("n_frames") - 1, lit(stride)))
}

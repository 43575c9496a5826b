package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

/** Multimodal-column plumbing for training-data pipelines.
  *
  * Images/audio/video are opaque `binary` columns with a typed metadata
  * struct riding alongside. Decode / feature-extraction runs as a
  * partition-wise batch transform (`mapPartitions` — the Scala analogue of
  * `mapInPandas`: one iterator per partition, vectorizable batches, executor-
  * local codec state). The Spark-side plumbing — schema, batch iteration,
  * output encoder, partitioning — is real and tested.
  *
  * Codecs: [[ImageIoCodec]] is a REAL decoder for the formats the JDK
  * ships readers for (PNG, JPEG, BMP, GIF — `javax.imageio`, no external
  * native libs), exercised on real generated PNG/JPEG bytes in the spec.
  * [[FakeCodec]] remains for payloads no reader claims (the `image/fake`
  * corpus the DuckDB-oracle gate uses — an oracle can recompute a
  * deterministic function of the bytes, but not a pixel decode), and as
  * the stand-in for audio/video containers this environment has no
  * decoder for. [[decodeFeatures]] auto-dispatches: real reader if one
  * claims the payload, deterministic fallback otherwise.
  */
object Multimodal {

  /** Decoded-feature schema, shared by both codecs. */
  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("byte_len", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("digest", StringType)))

  private def md5hex(payload: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(payload).map("%02x".format(_)).mkString

  /** Real JDK image decoder (`javax.imageio`): header-level decode — width,
    * height, frame count (multi-frame for GIF) — without materializing
    * pixel rasters, so feature extraction stays cheap at corpus scale.
    * None when no installed reader claims the payload. */
  object ImageIoCodec {
    def decode(payload: Array[Byte]): Option[(Int, Int, Int, Int, String)] = {
      val in = javax.imageio.ImageIO.createImageInputStream(
        new ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(in)
        if (!readers.hasNext) None
        else {
          val reader = readers.next()
          // NonFatal, not just IOException: the JDK readers throw
          // RuntimeExceptions (AIOOBE, NegativeArraySize, IAE) on corrupt
          // payloads their header sniffing claimed — a bad image must be
          // data, never a job-killing exception
          try {
            reader.setInput(in)
            val w = reader.getWidth(0)
            val h = reader.getHeight(0)
            val n = try math.max(reader.getNumImages(true), 1)
                    catch { case scala.util.control.NonFatal(_) => 1 }
            Some((payload.length, w, h, n, md5hex(payload)))
          } catch {
            case scala.util.control.NonFatal(_) => None // corrupt payload
          } finally reader.dispose()
        }
      } finally in.close()
    }
  }

  /** Deterministic fallback for payloads without an installed decoder —
    * a pure function of the bytes, so a SQL oracle can recompute it. */
  object FakeCodec {
    def decode(payload: Array[Byte]): (Int, Int, Int, Int, String) = {
      val len = payload.length
      val width = 64 + len % 576          // fake intrinsic dimensions
      val height = 64 + (len * 7) % 296
      val frames = len / 100 + 1          // fake frame count (1 per 100 bytes)
      (len, width, height, frames, md5hex(payload))
    }
  }

  /** Wrap a text corpus as fake media rows: payload = utf-8 bytes, plus the
    * typed metadata struct every real media table carries. */
  def attachMedia(docs: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame =
    docs.select(col(idCol), encode(col(textCol), "UTF-8").as("media"),
      struct(lit("image/fake").as("mime"),
        length(col(textCol)).as("content_length")).as("media_meta"))

  /** Codec dispatch policy for [[decodeFeatures]]. `Auto` tries a real
    * `javax.imageio` reader per payload, deterministic fallback otherwise
    * (mixed fake/real corpora share a table). `ForceFake` pins the
    * deterministic codec for EVERY payload — required when the output is
    * verified against a SQL oracle: under Auto, a payload some JDK reader
    * happens to claim silently changes feature values, and which payloads
    * readers claim is a JDK detail, not a corpus property. `ImageIoOnly`
    * decodes strictly real images and drops unclaimed payloads (callers
    * route those to quarantine). */
  sealed trait CodecPolicy
  case object Auto extends CodecPolicy
  case object ForceFake extends CodecPolicy
  case object ImageIoOnly extends CodecPolicy

  /** Partition-wise decode: one pass per partition over the binary payloads,
    * emitting the feature rows. Batch shape = the partition iterator, exactly
    * like a mapInPandas batch stream. Dispatch per [[CodecPolicy]]. */
  def decodeFeatures(media: DataFrame, codec: CodecPolicy = Auto): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(featureSchema)
    media.select(col("doc_id"), col("media"))
      .mapPartitions { rows: Iterator[Row] =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          val decoded = codec match {
            case Auto        => Some(ImageIoCodec.decode(payload)
                                  .getOrElse(FakeCodec.decode(payload)))
            case ForceFake   => Some(FakeCodec.decode(payload))
            case ImageIoOnly => ImageIoCodec.decode(payload)
          }
          decoded.map { case (len, w, h, frames, digest) =>
            Row(id, len, w, h, frames, digest)
          }
        }
      }(enc)
  }

  /** Metadata-level resize: recompute target dims keeping aspect (pure
    * column arithmetic over decoded features — the planning half of a
    * resize; [[resizePixels]] is the pixel half). */
  def resize(features: DataFrame, maxDim: Int): DataFrame =
    features
      .withColumn("scale",
        when(greatest(col("width"), col("height")) > maxDim,
          lit(maxDim).cast("double") / greatest(col("width"), col("height")).cast("double"))
          .otherwise(lit(1.0)))
      .withColumn("out_width", floor(col("width") * col("scale")).cast("int"))
      .withColumn("out_height", floor(col("height") * col("scale")).cast("int"))

  private val resizedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("media", BinaryType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  /** REAL pixel resize, partition-wise: decode with `javax.imageio`, scale
    * preserving aspect so the longest edge is ≤ maxDim, re-encode as PNG.
    * Payloads no reader claims are dropped (routed to quarantine by
    * callers that care). Executor-local work per partition — the same
    * shape a GPU/native resize kernel would slot into. */
  def resizePixels(media: DataFrame, maxDim: Int): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(resizedSchema)
    media.select(col("doc_id"), col("media"))
      .mapPartitions { rows: Iterator[Row] =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          val img =
            try Option(javax.imageio.ImageIO.read(new ByteArrayInputStream(payload)))
            catch { case scala.util.control.NonFatal(_) => None }
          img.map { src =>
            val longest = math.max(src.getWidth, src.getHeight)
            val scale =
              if (longest > maxDim) maxDim.toDouble / longest else 1.0
            val tw = math.max(1, math.floor(src.getWidth * scale).toInt)
            val th = math.max(1, math.floor(src.getHeight * scale).toInt)
            val out = new java.awt.image.BufferedImage(tw, th,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = out.createGraphics()
            try {
              g.setRenderingHint(
                java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g.drawImage(src, 0, 0, tw, th, null)
            } finally g.dispose()
            val bytes = new ByteArrayOutputStream()
            javax.imageio.ImageIO.write(out, "png", bytes)
            Row(id, bytes.toByteArray, tw, th)
          }
        }
      }(enc)
  }

  /** Frame sampling: every `stride`-th frame index (metadata-level; a real
    * video impl would seek per partition). */
  def sampleFrames(features: DataFrame, stride: Int): DataFrame =
    features.withColumn("sampled_frames",
      sequence(lit(0), col("n_frames") - 1, lit(stride)))
}

package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column plumbing (SURVEY.md §2.11): image/audio/video carried
 * as opaque `binary` columns + a typed metadata struct, with decode /
 * feature-extract / resize / frame-sample as batched per-partition
 * transforms.
 *
 * The Spark-side plumbing — schema, partitioning, batch shape, the
 * mapPartitions contract — is real and tested. The media DECODE itself is
 * a STUB (this container has no image/audio codecs): `decodeStub` derives
 * deterministic fake pixels/samples from the payload bytes. Swapping in a
 * real codec changes only the function body, not the pipeline shape.
 */
object Multimodal {

  /** Typed metadata carried beside every media payload. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("kind", StringType, nullable = false),        // image|audio|video|text
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("sample_rate_hz", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  /** Attach a binary payload + metadata struct to a text corpus — models a
    * crawl table where media bytes ride next to text. Payload = UTF-8 bytes
    * (a deterministic stand-in for real media bytes). */
  def attachMedia(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("media", encode(col(textCol), "UTF-8").cast(BinaryType))
      .withColumn("media_meta", struct(
        lit("image").as("kind"),
        (pmod(xxhash64(col(textCol)), lit(512)) + 32).cast("int").as("width"),
        (pmod(xxhash64(col(textCol), lit(1)), lit(512)) + 32).cast("int").as("height"),
        lit(null).cast(IntegerType).as("sample_rate_hz"),
        lit(null).cast(LongType).as("duration_ms")))

  /**
   * STUB decode: deterministic fake "pixels" from payload bytes.
   * A real implementation would invoke an image codec here — per batch,
   * inside the partition, exactly this signature.
   */
  private def decodeStub(payload: Array[Byte], nPixels: Int): Array[Float] = {
    val out = new Array[Float](nPixels)
    var i = 0
    while (i < nPixels) {
      out(i) = (payload(i % payload.length) & 0xff) / 255.0f
      i += 1
    }
    out
  }

  /** `histogram` is the normalized float feature vector; `bin_counts`
    * carries the raw integer bin counts so downstream checks can compare
    * exactly (integer arithmetic is engine-independent; normalized floats
    * round differently under float32 vs float64). */
  final case class MediaFeatures(doc_id: Long, n_bytes: Int,
      histogram: Array[Float], bin_counts: Array[Int])

  /**
   * Batched feature extraction over (id, media) — the `mapInPandas`
   * analogue: partitions are processed in bounded batches so a real
   * vectorized decoder (or model) amortizes per-batch setup. Emits a
   * 16-bin normalized byte histogram as the stand-in feature vector.
   */
  def extractFeatures(df: DataFrame, idCol: String = "doc_id",
      mediaCol: String = "media", batchSize: Int = 64): Dataset[MediaFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(mediaCol)).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          // batch boundary = where a real decoder would run vectorized
          batch.map { case (id, bytes) =>
            val pixels = decodeStub(bytes, math.min(bytes.length, 1024))
            val counts = new Array[Int](16)
            pixels.foreach(p => counts((p * 15.999f).toInt) += 1)
            val n = math.max(1, pixels.length)
            MediaFeatures(id, bytes.length, counts.map(_.toFloat / n), counts)
          }
        }
      }
  }

  final case class ResizedMedia(doc_id: Long, width: Int, height: Int, pixels: Array[Float])

  /**
   * Batched resize: decode (STUB) to the source geometry from `media_meta`,
   * then nearest-neighbor sample down/up to (outW, outH). Same
   * mapPartitions contract as [[extractFeatures]] — a real codec/scaler
   * slots into the batch loop without touching the pipeline shape. Output
   * rows are fixed-size float arrays, the shape a training pipeline feeds
   * to an image tower.
   */
  def resize(df: DataFrame, outW: Int, outH: Int, idCol: String = "doc_id",
      mediaCol: String = "media", batchSize: Int = 64): Dataset[ResizedMedia] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(mediaCol),
        col("media_meta.width"), col("media_meta.height"))
      .as[(Long, Array[Byte], Int, Int)]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, bytes, w, h) =>
            val srcW = math.max(1, w); val srcH = math.max(1, h)
            val src = decodeStub(bytes, math.min(srcW * srcH, 4096))
            val out = new Array[Float](outW * outH)
            var y = 0
            while (y < outH) {
              val sy = y * srcH / outH
              var x = 0
              while (x < outW) {
                val sx = x * srcW / outW
                out(y * outW + x) = src((sy * srcW + sx) % src.length)
                x += 1
              }
              y += 1
            }
            ResizedMedia(id, outW, outH, out)
          }
        }
      }
  }

  /** Deterministic frame sampling: n evenly spaced byte-slices ("frames"). */
  def sampleFrames(df: DataFrame, mediaCol: String, nFrames: Int, frameBytes: Int): DataFrame = {
    val len = octet_length(col(mediaCol))
    df.withColumn("frames",
      transform(sequence(lit(0), lit(nFrames - 1)),
        i => substring(col(mediaCol), (i * greatest(len / nFrames, lit(1)) + 1).cast("int"), lit(frameBytes))))
  }

  /** Metadata-level projection (oracle-friendly): payload size + kind. */
  def mediaStats(df: DataFrame, idCol: String = "doc_id"): DataFrame =
    df.select(col(idCol), octet_length(col("media")).as("n_bytes"),
      col("media_meta.kind").as("kind"), col("media_meta.width").as("width"),
      col("media_meta.height").as("height"))
}

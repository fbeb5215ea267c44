package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing for training-data pipelines: image/audio/video
  * as opaque `binary` columns with typed metadata, and batched
  * feature-extraction over partitions.
  *
  * Decoder libraries (imageio/javacv equivalents) are not on this
  * classpath, so `decodeImage`/`decodeAudio` are clearly-marked
  * deterministic STUBS (hash-derived dimensions/features). Everything
  * Spark-side is real and tested: the asset schema, the
  * `mapPartitions`-with-explicit-batching execution shape (the Scala
  * analog of a pandas-batched UDF — decode cost amortized per batch, not
  * per row), partition sizing, and the typed feature output schema.
  */
object Multimodal {

  /** Asset table schema: the multimodal analog of the documents table. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image | audio | video
    StructField("content", BinaryType, nullable = true),
    StructField("source_uri", StringType, nullable = true)))

  case class AssetFeatures(
      asset_id: Long,
      modality: String,
      width: Int,          // image/video: pixels; audio: 0
      height: Int,
      durationMs: Long,    // audio/video; image: 0
      nBytes: Long,
      embedding: Array[Float])

  val FeatureDim = 16

  /** STUB decode: real impl = javax.imageio / pdfbox-graphics. Derives
    * deterministic pseudo-dimensions and a feature vector from content
    * bytes so downstream pipelines (dedup, ANN over image embeddings) are
    * exercisable without native decoders.
    */
  def decodeImage(bytes: Array[Byte]): (Int, Int, Array[Float]) = {
    val h = java.util.Arrays.hashCode(bytes)
    val width = 64 + math.floorMod(h, 1024)
    val height = 64 + math.floorMod(h >> 10, 1024)
    (width, height, featureVector(bytes))
  }

  /** STUB decode: real impl = javax.sound.sampled. */
  def decodeAudio(bytes: Array[Byte]): (Long, Array[Float]) = {
    val durMs = 100L + math.floorMod(java.util.Arrays.hashCode(bytes).toLong, 60000L)
    (durMs, featureVector(bytes))
  }

  /** Deterministic byte-level feature vector (chunked byte histograms,
    * L2-normalized) — the stand-in for a real image/audio encoder.
    */
  def featureVector(bytes: Array[Byte]): Array[Float] = {
    val v = new Array[Double](FeatureDim)
    var i = 0
    while (i < bytes.length) { v(math.floorMod(bytes(i), FeatureDim)) += 1.0; i += 1 }
    var norm = 0.0
    v.foreach(x => norm += x * x)
    // x / sqrt(norm) (not x * inv): one double rounding, bit-identical to
    // any engine computing the quotient directly — keeps this oracle-able.
    if (norm > 0) v.map(x => (x / math.sqrt(norm)).toFloat)
    else v.map(_ => 0f)
  }

  /** Batched feature extraction: one pass per partition, decoding in
    * explicit `batchSize` groups. The batching is the execution shape that
    * matters at scale — a real encoder amortizes model/codec setup across
    * the batch; rows stream through without materializing the partition.
    */
  def extractFeatures(assets: DataFrame, batchSize: Int = 64): Dataset[AssetFeatures] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select("asset_id", "modality", "content")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          // per-batch setup happens here (codec/model init in real impl)
          batch.iterator.map { case (id, modality, bytes) =>
            val content = Option(bytes).getOrElse(Array.emptyByteArray)
            modality match {
              case "image" =>
                val (w, h, emb) = decodeImage(content)
                AssetFeatures(id, modality, w, h, 0L, content.length.toLong, emb)
              case "audio" =>
                val (d, emb) = decodeAudio(content)
                AssetFeatures(id, modality, 0, 0, d, content.length.toLong, emb)
              case other =>
                AssetFeatures(id, other, 0, 0, 0L, content.length.toLong,
                  featureVector(content))
            }
          }
        }
      }
  }

  /** Frame sampling plumbing for video: emit every `stride`-th synthetic
    * frame reference (real impl: codec frame extraction). Demonstrates the
    * 1→N generator shape with bounded fan-out.
    */
  def sampleFrames(assets: DataFrame, stride: Int = 10, maxFrames: Int = 8): DataFrame =
    assets.filter(col("modality") === "video")
      .withColumn("frame_index",
        explode(sequence(lit(0), least(
          (length(col("content")) / stride).cast("int"), lit(maxFrames - 1)))))
      .select(col("asset_id"), col("frame_index"),
        (col("frame_index") * stride).as("byte_offset"))
}

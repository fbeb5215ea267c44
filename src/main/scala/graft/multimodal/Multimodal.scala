package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing for training-data pipelines: image/audio/video
  * as opaque `binary` columns with typed metadata, and batched
  * feature-extraction over partitions.
  *
  * Image decode is REAL: [[decodeImageReal]] reads PNG/JPEG through the
  * JDK's `javax.imageio` (zero extra dependencies) into pixel-derived
  * features — a block-averaged luminance grid (centered, L2-normalized,
  * so unrelated textures land near cosine 0 and re-encodes/noised copies
  * near 1) plus the standard 64-bit average-hash fingerprint. Audio/video
  * codecs are not on this classpath, so `decodeImage`/`decodeAudio`
  * remain clearly-marked deterministic STUBS (hash-derived
  * dimensions/features) and stay the oracle-replicable path. Everything
  * Spark-side is real and tested either way: the asset schema, the
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

  case class RealImageFeatures(
      asset_id: Long,
      decoded: Boolean,
      width: Int,
      height: Int,
      n_bytes: Long,
      ahash: Long,
      embedding: Array[Float])

  /** REAL image decode via the JDK's `javax.imageio` (PNG/JPEG/BMP/GIF):
    * returns (width, height, centered+L2-normalized `grid`×`grid`
    * block-averaged luminance vector, 64-bit average-hash), or None for
    * bytes no installed reader accepts. Centering makes the embedding
    * behave like a real encoder's for near-dup purposes: unrelated
    * textures → cosine ≈ 0, re-encodes/lightly-noised copies →
    * cosine ≈ 1, so it feeds [[graft.operators.Dedup.embeddingNearDupBucketed]]
    * directly. The aHash is the classic perceptual fingerprint (bit =
    * cell brighter than the image mean) for Hamming-style pipelines.
    */
  def decodeImageReal(
      bytes: Array[Byte], grid: Int = 8): Option[(Int, Int, Array[Float], Long)] = {
    if (bytes == null || bytes.isEmpty) return None
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: java.io.IOException => null }
    if (img == null) return None
    val (w, h) = (img.getWidth, img.getHeight)
    if (w <= 0 || h <= 0) return None
    // Block-average luminance into a grid×grid cell map (one pass over
    // the pixels; integer cell indexing covers non-multiple sizes).
    val sums = new Array[Double](grid * grid)
    val counts = new Array[Long](grid * grid)
    var y = 0
    while (y < h) {
      val cy = math.min(y * grid / h, grid - 1)
      var x = 0
      while (x < w) {
        val cx = math.min(x * grid / w, grid - 1)
        val rgb = img.getRGB(x, y)
        val lum = 0.299 * ((rgb >> 16) & 0xFF) + 0.587 * ((rgb >> 8) & 0xFF) +
          0.114 * (rgb & 0xFF)
        sums(cy * grid + cx) += lum
        counts(cy * grid + cx) += 1
        x += 1
      }
      y += 1
    }
    val cells = Array.tabulate(grid * grid)(i =>
      if (counts(i) == 0) 0.0 else sums(i) / counts(i))
    val mean = cells.sum / cells.length
    var ahash = 0L
    var norm = 0.0
    val centered = cells.map { c =>
      val d = c - mean
      norm += d * d
      d
    }
    var i = 0
    while (i < centered.length) {
      if (centered(i) > 0 && i < 64) ahash |= (1L << i)
      i += 1
    }
    val emb =
      if (norm > 0) centered.map(d => (d / math.sqrt(norm)).toFloat)
      else centered.map(_ => 0f)
    Some((w, h, emb, ahash))
  }

  /** Batched REAL image feature extraction — same mapPartitions/grouped
    * execution shape as [[extractFeatures]], but the decode step is
    * `javax.imageio` on actual pixels. Undecodable rows surface with
    * `decoded = false` and a zero vector instead of being dropped (a
    * 100 TB crawl always contains corrupt files; silently losing them
    * hides the corruption rate).
    */
  def extractRealImageFeatures(
      assets: DataFrame, grid: Int = 8, batchSize: Int = 64): Dataset[RealImageFeatures] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select("asset_id", "content")
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { case (id, bytes) =>
            val n = if (bytes == null) 0L else bytes.length.toLong
            decodeImageReal(bytes, grid) match {
              case Some((w, h, emb, ahash)) =>
                RealImageFeatures(id, decoded = true, w, h, n, ahash, emb)
              case None =>
                RealImageFeatures(id, decoded = false, 0, 0, n, 0L,
                  new Array[Float](grid * grid))
            }
          }
        }
      }
  }

  /** Deterministic synthetic PNG for specs and registry fixtures: a
    * blocky pseudo-random texture keyed by `patternId` (4×4-pixel tiles,
    * so distinct patterns are uncorrelated and block-average features
    * separate cleanly) plus per-pixel ±2 channel noise keyed by
    * `variant` — variants of one pattern are near-duplicates
    * (cosine ≈ 1 after centering), distinct patterns are not
    * (cosine ≈ 0). Encoding through `ImageIO.write(…, "png", …)` is
    * deterministic for a fixed JDK, so queries built on these bytes
    * hash-compare across runs.
    */
  def syntheticPng(patternId: Int, variant: Int, size: Int = 32): Array[Byte] = {
    def mix(a: Int, b: Int, c: Int, d: Int): Int = {
      var x = a * 0x9E3779B1 + b * 0x85EBCA77 + c * 0xC2B2AE3D + d * 0x27D4EB2F
      x ^= x >>> 15; x *= 0x2545F491; x ^= x >>> 13
      x
    }
    val img = new java.awt.image.BufferedImage(
      size, size, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < size) {
      var x = 0
      while (x < size) {
        def chan(c: Int): Int = {
          val base = math.floorMod(mix(patternId, x / 4, y / 4, c), 256)
          val noise =
            if (variant == 0) 0
            else math.floorMod(mix(variant, x, y, c), 5) - 2
          math.max(0, math.min(255, base + noise))
        }
        img.setRGB(x, y, (chan(0) << 16) | (chan(1) << 8) | chan(2))
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
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

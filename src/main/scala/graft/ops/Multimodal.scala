package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing: image/audio/video payloads ride as opaque
 * `binary` columns with a typed metadata struct; decode / feature-extract /
 * resize / frame-sample run as per-partition batch transforms.
 *
 * The IMAGE modality uses a REAL codec: JDK 17's `javax.imageio` decodes,
 * scales and re-encodes PNG with no external dependency ([[Codec]]) —
 * `mm_features` width/height are true pixel dimensions and the resize path
 * really rescales pixels. Audio/video remain STUBBED behind [[DecodeStub]]
 * (no ffmpeg-class library exists in this container), a deterministic fake
 * keyed on the payload bytes, clearly marked for replacement.
 *
 * Batch shape: `mapPartitions` over a typed Dataset is the Scala analogue
 * of `mapInPandas` — one iterator per partition, so a real decoder can
 * amortize model/codec init per partition (NOT per row), exactly like a
 * Pandas-batch UDF would.
 */
object Multimodal {

  /** A multimodal asset row: opaque payload + typed metadata. */
  final case class Asset(
      asset_id: Long,
      modality: String, // "image" | "audio" | "video"
      payload: Array[Byte],
      mime: String,
      n_bytes: Long,
      sha256: String)

  /** Extracted features, fixed-width (the schema a downstream trainer sees). */
  final case class AssetFeatures(
      asset_id: Long,
      modality: String,
      n_bytes: Long,
      width: Int, // stub: derived deterministically from bytes
      height: Int,
      duration_ms: Long,
      feature: Array[Float]) // stub embedding, FeatureDim wide

  val FeatureDim = 8

  /**
   * Deterministic stand-in for the codecs this container lacks (audio,
   * video, non-PNG image formats). Replace with actual ffmpeg-class
   * bindings — the surrounding plumbing (schema, batching, partitioning)
   * does not change. PNG images take the REAL [[Codec]] path instead.
   */
  object DecodeStub {
    def apply(a: Asset): AssetFeatures = {
      val h = a.payload.foldLeft(1469598103934665603L)((acc, b) =>
        (acc ^ (b & 0xff)) * 1099511628211L) // FNV-1a, deterministic
      def part(i: Int): Int = math.abs(((h >>> (i * 8)) & 0xffff).toInt)
      AssetFeatures(
        asset_id = a.asset_id,
        modality = a.modality,
        n_bytes = a.n_bytes,
        width = 16 + part(0) % 4080,
        height = 16 + part(1) % 4080,
        duration_ms = if (a.modality == "image") 0L else 1000L + part(2),
        feature = Array.tabulate(FeatureDim)(i =>
          (((h >>> i) & 0xff).toInt / 255.0f) * 2f - 1f))
    }
  }

  /** Real image codec over JDK `javax.imageio` — no external dependency.
   * All entry points are called from executor tasks; ImageIO's reader
   * registry is static, so there is no per-partition handle to manage
   * (a native codec would initialize one in the mapPartitions preamble). */
  object Codec {
    System.setProperty("java.awt.headless", "true")

    /** Deterministic synthetic PNG: pixel (x,y) color is a pure function of
     * (seed, x, y), so the same id always encodes byte-identical payload. */
    def encodePng(width: Int, height: Int, seed: Long): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val px = new Array[Int](width * height)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val v = (seed * 1099511628211L ^ (x * 131L + y * 31L) * 2654435761L).toInt
          px(y * width + x) = v & 0xffffff
          x += 1
        }
        y += 1
      }
      img.setRGB(0, 0, width, height, px, 0, width)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    def decode(payload: Array[Byte]): java.awt.image.BufferedImage = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      require(img != null, "payload is not a decodable image")
      img
    }

    /** Real decode + feature extraction: true pixel dimensions and a small
     * luminance-profile embedding (mean luminance of FeatureDim horizontal
     * strips, 0..1) — the deterministic stand-in for a vision encoder.
     * Pixels are read in ONE bulk getRGB call: the per-pixel accessor does
     * a color-model conversion per call and measured ~5x slower. */
    def imageFeatures(a: Asset): AssetFeatures = {
      val img = decode(a.payload)
      val (w, h) = (img.getWidth, img.getHeight)
      val px = img.getRGB(0, 0, w, h, null, 0, w)
      val feature = new Array[Float](FeatureDim)
      var strip = 0
      while (strip < FeatureDim) {
        val y0 = h * strip / FeatureDim
        val y1 = math.max(y0 + 1, h * (strip + 1) / FeatureDim)
        var sum = 0L // channel values are ints; exact integer accumulation
        var i = y0 * w
        val end = y1 * w
        while (i < end) {
          val rgb = px(i)
          sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
          i += 1
        }
        feature(strip) = (sum / (3.0 * 255.0 * (end - y0 * w))).toFloat
        strip += 1
      }
      AssetFeatures(a.asset_id, a.modality, a.n_bytes, w, h, 0L, feature)
    }

    /** Real rescale: decode, Graphics2D bilinear draw into the target
     * canvas, re-encode PNG. */
    def resizePng(payload: Array[Byte], width: Int, height: Int): Array[Byte] = {
      val src = decode(payload)
      val dst = new java.awt.image.BufferedImage(
        width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = dst.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(src, 0, 0, width, height, null)
      } finally g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(dst, "png", bos)
      bos.toByteArray
    }
  }

  /** Deterministic synthetic PNG corpus: one REAL encoded PNG per id with
   * width = 16 + id % 32, height = 16 + (id * 7) % 32 — a formula a SQL
   * oracle can restate, so decoding it back end-to-end PROVES the codec
   * round-trip (the generator emits the expected-dims table in SQL form). */
  def pngAssets(ids: Dataset[Long]): Dataset[Asset] = {
    import ids.sparkSession.implicits._
    ids.mapPartitions { it =>
      val digest = java.security.MessageDigest.getInstance("SHA-256")
      it.map { id =>
        val w = 16 + (((id % 32) + 32) % 32).toInt
        val h = 16 + ((((id * 7) % 32) + 32) % 32).toInt
        val png = Codec.encodePng(w, h, id)
        digest.reset()
        Asset(id, "image", png, "image/png", png.length.toLong,
          digest.digest(png).map("%02x".format(_)).mkString)
      }
    }
  }

  /** Wrap a table with a string payload column into the multimodal asset
   * schema (binary payload + metadata) — the ingest adapter. */
  def toAssets(df: DataFrame, idCol: String, payloadCol: String,
      modality: String, mime: String): Dataset[Asset] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
      col(idCol).cast("long").as("asset_id"),
      lit(modality).as("modality"),
      col(payloadCol).cast("binary").as("payload"),
      lit(mime).as("mime"),
      octet_length(col(payloadCol).cast("binary")).cast("long").as("n_bytes"),
      sha2(col(payloadCol).cast("binary"), 256).as("sha256"))
      .as[Asset]
  }

  /** Per-partition batched decode/feature-extract: REAL `javax.imageio`
   * decode for `image/png` payloads (true pixel dims + luminance profile);
   * [[DecodeStub]] for the modalities this container has no codec for. */
  def extractFeatures(assets: Dataset[Asset]): Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // a native codec/model handle would be initialized HERE, once per
      // partition; ImageIO's registry is static so PNG needs no handle
      it.map { a =>
        if (a.mime == "image/png") Codec.imageFeatures(a) else DecodeStub(a)
      }
    }
  }

  /** Metadata-only projection — runs WITHOUT touching payload bytes, so
   * parquet column pruning skips the heavy binary column entirely. */
  def metadata(assets: Dataset[Asset]): DataFrame =
    assets.toDF().select("asset_id", "modality", "mime", "n_bytes", "sha256")

  /** Frame-sample plan for video assets: deterministic frame indices at a
   * fixed stride — the shape of the real op; indices are computable from
   * metadata alone (duration from the decode pass). */
  def frameSamplePlan(features: Dataset[AssetFeatures], everyMs: Long): DataFrame =
    features.toDF()
      .filter(col("modality") === "video")
      .select(col("asset_id"),
        sequence(lit(0L), col("duration_ms"), lit(everyMs)).as("frame_times_ms"))

  /**
   * Per-partition batched resize: REAL decode-scale-reencode for
   * `image/png` payloads ([[Codec.resizePng]]); for modalities without a
   * codec in this container, a deterministic stub payload with the byte
   * budget of the target dimensions. Metadata (n_bytes/sha256) is
   * recomputed over the NEW payload on both paths.
   */
  def resize(assets: Dataset[Asset], width: Int, height: Int): Dataset[Asset] = {
    import assets.sparkSession.implicits._
    require(width > 0 && height > 0, "resize dims must be positive")
    val outLen = math.max(16, (width.toLong * height / 64).toInt)
    assets.mapPartitions { it =>
      // a native scaler would be initialized ONCE per partition, here —
      // like the digest instance below, never per row
      val digest = java.security.MessageDigest.getInstance("SHA-256")
      it.map { a =>
        val out =
          if (a.mime == "image/png") Codec.resizePng(a.payload, width, height)
          else {
            // --- stub scale step (audio/video): FNV-1a byte stream ---
            var h = a.payload.foldLeft(1469598103934665603L)((acc, b) =>
              (acc ^ (b & 0xff)) * 1099511628211L)
            val bytes = new Array[Byte](outLen)
            var i = 0
            while (i < outLen) {
              h = (h ^ i) * 1099511628211L
              bytes(i) = (h >>> 56).toByte
              i += 1
            }
            bytes
          }
        // --- real metadata recompute over the NEW payload ---
        digest.reset()
        val sha = digest.digest(out).map("%02x".format(_)).mkString
        a.copy(payload = out, n_bytes = out.length.toLong, sha256 = sha)
      }
    }
  }
}

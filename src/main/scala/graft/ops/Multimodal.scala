package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing: image/audio/video payloads ride as opaque
 * `binary` columns with a typed metadata struct; decode / feature-extract /
 * resize / frame-sample run as per-partition batch transforms.
 *
 * The Spark-side contract (schema, partitioning, batch shape) is real and
 * tested; the actual codec step is STUBBED — no image/audio libraries exist
 * in this container — behind [[DecodeStub]], a deterministic fake keyed on
 * the payload bytes, clearly marked for replacement by a real codec.
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
   * Deterministic stand-in for the real codec. Replace with an actual
   * decoder (e.g. javax.imageio / ffmpeg bindings) — the surrounding
   * plumbing (schema, batching, partitioning) does not change.
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

  /** Per-partition batched decode/feature-extract (stubbed codec). */
  def extractFeatures(assets: Dataset[Asset]): Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // real codec: initialize decoder/model HERE, once per partition
      it.map(DecodeStub(_))
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
   * Per-partition batched resize (stubbed codec): the real op decodes the
   * payload, scales it to `width` x `height` and re-encodes. The stub emits
   * a deterministic payload derived from the source bytes with the byte
   * budget of the target dimensions, so everything AROUND the codec —
   * asset identity, metadata recompute (n_bytes/sha256 of the NEW payload),
   * per-partition codec init, output schema — is real and tested. A
   * replacement codec changes only the marked line.
   */
  def resize(assets: Dataset[Asset], width: Int, height: Int): Dataset[Asset] = {
    import assets.sparkSession.implicits._
    require(width > 0 && height > 0, "resize dims must be positive")
    val outLen = math.max(16, (width.toLong * height / 64).toInt)
    assets.mapPartitions { it =>
      // real codec: initialize the scaler ONCE per partition, here — like
      // the digest instance below, never per row
      val digest = java.security.MessageDigest.getInstance("SHA-256")
      it.map { a =>
        // --- stub scale step: deterministic bytes from an FNV-1a stream ---
        var h = a.payload.foldLeft(1469598103934665603L)((acc, b) =>
          (acc ^ (b & 0xff)) * 1099511628211L)
        val out = new Array[Byte](outLen)
        var i = 0
        while (i < outLen) {
          h = (h ^ i) * 1099511628211L
          out(i) = (h >>> 56).toByte
          i += 1
        }
        // --- real metadata recompute over the NEW payload ---
        digest.reset()
        val sha = digest.digest(out).map("%02x".format(_)).mkString
        a.copy(payload = out, n_bytes = out.length.toLong, sha256 = sha)
      }
    }
  }
}

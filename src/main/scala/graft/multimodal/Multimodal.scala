package graft.multimodal

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for a training-data pipeline: image/audio/video as
  * opaque `binary` content plus typed metadata, with decode / feature
  * extraction / frame sampling as `mapPartitions` stages (the Scala twin of
  * a Pandas-UDF batch stage: one decoder instantiation per partition,
  * batch-shaped row flow, no per-row setup cost).
  *
  * The actual byte→pixels/samples decode is STUBBED (no image/audio codecs
  * in this container): `StubDecoder` derives deterministic pseudo-features
  * from a sha-256 of the bytes. The Spark-side contract — schema,
  * partitioning, batch shape, feature dimensionality — is real and tested;
  * swapping in a JNI/JavaCV decoder changes only the `Decoder` impl.
  */
object Multimodal {

  case class MediaMeta(
      mime: String,
      width: Int,             // images/video
      height: Int,
      duration_ms: Long,      // audio/video
      sample_rate: Int)       // audio

  case class MediaRow(
      media_id: String,
      kind: String,           // image | audio | video
      content: Array[Byte],
      meta: MediaMeta)

  case class MediaFeatures(
      media_id: String,
      kind: String,
      feature_dim: Int,
      features: Array[Float],
      decode_ok: Boolean)

  case class Frame(
      media_id: String,
      frame_index: Int,
      ts_ms: Long,
      features: Array[Float])

  /** Decoder seam. Real impls decode bytes; the stub hashes them. */
  trait Decoder extends Serializable {
    def dim: Int
    def decode(row: MediaRow): Option[Array[Float]]
  }

  final class StubDecoder(val dim: Int = 32) extends Decoder {
    def decode(row: MediaRow): Option[Array[Float]] = {
      if (row.content == null || row.content.isEmpty) None
      else {
        val md = MessageDigest.getInstance("SHA-256")
        val out = new Array[Float](dim)
        var produced = 0; var round = 0
        while (produced < dim) {
          md.reset()
          md.update(row.content)
          md.update(round.toString.getBytes(StandardCharsets.UTF_8))
          val digest = md.digest()
          var i = 0
          while (i < digest.length && produced < dim) {
            out(produced) = digest(i) / 128.0f; produced += 1; i += 1
          }
          round += 1
        }
        Some(out)
      }
    }
  }

  /** Feature extraction over a media table: one decoder per partition,
    * batch-shaped (the mapInPandas analog). Rows that fail to decode are
    * kept with decode_ok=false — a 100 TB run must not die on one bad blob. */
  def extractFeatures(spark: SparkSession, media: Dataset[MediaRow],
                      decoder: Decoder = new StubDecoder(32)): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        decoder.decode(r) match {
          case Some(f) => MediaFeatures(r.media_id, r.kind, decoder.dim, f, decode_ok = true)
          case None    => MediaFeatures(r.media_id, r.kind, decoder.dim,
            Array.empty[Float], decode_ok = false)
        }
      }
    }
  }

  /** Image resize stage: binary in → binary out with the target dims stamped
    * into the metadata. The pixel transform is STUBBED (content passes
    * through tagged with the target box — a real impl swaps in a codec
    * inside the same mapPartitions seam); aspect-preserving box-fit
    * arithmetic is real: scale = min(maxW/w, maxH/h), never upscale.
    * Non-images pass through untouched. */
  def resizeImages(spark: SparkSession, media: Dataset[MediaRow],
                   maxW: Int, maxH: Int): Dataset[MediaRow] = {
    require(maxW > 0 && maxH > 0, s"resize box must be positive, got ${maxW}x$maxH")
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        if (r.kind != "image" || r.meta.width <= 0 || r.meta.height <= 0) r
        else {
          val scale = math.min(
            math.min(maxW.toDouble / r.meta.width, maxH.toDouble / r.meta.height), 1.0)
          val (nw, nh) = (math.max((r.meta.width * scale).toInt, 1),
                          math.max((r.meta.height * scale).toInt, 1))
          // ??? real codec: decode → bilinear resample to (nw, nh) → re-encode.
          // Stub: bytes pass through; dims update so downstream stages see
          // the real contract (metadata-driven batch shaping).
          r.copy(meta = r.meta.copy(width = nw, height = nh))
        }
      }
    }
  }

  /** Frame sampling for video: every `everyMs` up to the clip duration,
    * one (deterministic stub) feature vector per frame. flatMap — rows fan
    * out without a shuffle. */
  def sampleFrames(spark: SparkSession, media: Dataset[MediaRow], everyMs: Long,
                   decoder: Decoder = new StubDecoder(32)): Dataset[Frame] = {
    import spark.implicits._
    // fail at the driver, not as a per-row ArithmeticException in executors
    require(everyMs > 0, s"everyMs must be positive, got $everyMs")
    media.filter(_.kind == "video").flatMap { r =>
      val n = math.max((r.meta.duration_ms / everyMs).toInt, 1)
      (0 until n).flatMap { i =>
        val pseudo = r.copy(content =
          if (r.content == null || r.content.isEmpty) r.content
          else r.content ++ i.toString.getBytes(StandardCharsets.UTF_8))
        decoder.decode(pseudo).map(f => Frame(r.media_id, i, i * everyMs, f))
      }
    }
  }

  case class AudioWindow(
      media_id: String,
      window_index: Int,
      start_ms: Long,
      end_ms: Long,
      n_samples: Int,
      rms: Double,
      peak: Float)

  /** Audio windowing: segment each audio clip into fixed `windowMs` windows
    * and compute per-window waveform stats — RMS energy and absolute peak,
    * the VAD / silence-trim front stage of an audio training pipeline.
    * flatMap fan-out, no shuffle; one decoder per partition via the same
    * seam as frames. The stub "PCM" for window i derives from sha-256 of
    * (content ++ "w"+i), so every stat is deterministic AND exactly
    * representable: each sample is byte/128 (a dyadic rational), sample²
    * sums are exact in double at any addition order, and sqrt is IEEE
    * correctly-rounded — the whole row hash-matches a SQL oracle bit for
    * bit. */
  def audioWindows(spark: SparkSession, media: Dataset[MediaRow], windowMs: Long,
                   decoder: Decoder = new StubDecoder(32)): Dataset[AudioWindow] = {
    import spark.implicits._
    require(windowMs > 0, s"windowMs must be positive, got $windowMs")
    media.filter(_.kind == "audio").flatMap { r =>
      val n = math.max((r.meta.duration_ms / windowMs).toInt, 1)
      (0 until n).flatMap { i =>
        val pseudo = r.copy(content =
          if (r.content == null || r.content.isEmpty) r.content
          else r.content ++ s"w$i".getBytes(StandardCharsets.UTF_8))
        decoder.decode(pseudo).map { samples =>
          val ss = samples.foldLeft(0.0)((acc, x) => acc + x.toDouble * x.toDouble)
          val peak = samples.foldLeft(0.0f)((m, x) => math.max(m, math.abs(x)))
          AudioWindow(r.media_id, i, i * windowMs,
            math.min((i + 1) * windowMs, r.meta.duration_ms),
            samples.length, math.sqrt(ss / samples.length), peak)
        }
      }
    }
  }

  /** Deterministic fixture media table. */
  def fixture(spark: SparkSession, n: Int = 12): Dataset[MediaRow] = {
    import spark.implicits._
    (0 until n).map { i =>
      val kind = Seq("image", "audio", "video")(i % 3)
      val bytes =
        if (i % 7 == 6) Array.empty[Byte]           // corrupt blob
        else s"blob-$kind-$i".getBytes(StandardCharsets.UTF_8)
      MediaRow(s"media$i", kind, bytes,
        MediaMeta(
          mime = kind match {
            case "image" => "image/png"; case "audio" => "audio/wav"; case _ => "video/mp4" },
          width = if (kind != "audio") 64 + i else 0,
          height = if (kind != "audio") 48 + i else 0,
          duration_ms = if (kind != "image") 1000L * (i + 1) else 0L,
          sample_rate = if (kind == "audio") 16000 else 0))
    }.toDS()
  }
}

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

  /** Perceptual-hash (dHash-style) fingerprints: bit j of the `dim`-bit
    * hash is [f_j > f_{(j+1) mod dim}] over the decoded feature vector —
    * the classic difference-hash construction (gradient signs survive
    * resizing/re-encoding under a real decoder, so visually-near images
    * land Hamming-close). With the stub decoder only byte-identical
    * content collides — exactly what fixtures plant. Rows that fail to
    * decode are dropped (no fingerprint exists for them).
    *
    * The comparison runs on raw features; the bit-pack is a Horner fold —
    * both whole-stage-codegen higher-order expressions, no UDF. */
  def phashSignatures(spark: SparkSession, media: Dataset[MediaRow],
                      decoder: Decoder = new StubDecoder(32)): DataFrame = {
    val dim = decoder.dim
    require(dim <= 63, s"phash packs into one BIGINT: dim $dim > 63")
    val bits = transform(sequence(lit(0), lit(dim - 1)), j =>
      when(element_at(col("features"), j + 1) >
        element_at(col("features"), pmod(j + 1, lit(dim)) + 1), 1L).otherwise(0L))
    extractFeatures(spark, media, decoder).filter(_.decode_ok).toDF()
      .select(col("media_id"), bits.as("bits"))
      // Horner MSB→LSB: phash = Σ bit_j · 2^j
      .select(col("media_id"),
        aggregate(sequence(lit(1), lit(dim)), lit(0L),
          (acc, i) => acc * 2 + element_at(col("bits"), lit(dim + 1) - i))
          .as("phash"))
  }

  /** Near-duplicate media pairs by perceptual hash: band the `bits`-bit
    * fingerprint into `bits/8` byte bands, bucket-join on (band, key), and
    * keep pairs with Hamming ≤ maxDist. Pigeonhole: maxDist < #bands
    * guarantees a shared band, so recall is exact for the distance bound —
    * no LSH miss — while the join only ever touches same-band buckets, not
    * the media cross product. The 100 TB image-dedup shape: fingerprints
    * are 8 bytes/row regardless of media size, and the quadratic step is
    * band-bucket-local. */
  def phashNearDup(spark: SparkSession, media: Dataset[MediaRow], maxDist: Int,
                   decoder: Decoder = new StubDecoder(32)): DataFrame = {
    val bits = decoder.dim
    val nBands = bits / 8
    require(bits % 8 == 0 && maxDist < nBands,
      s"need byte bands and maxDist < bands for exact recall: bits=$bits maxDist=$maxDist")
    val sig = phashSignatures(spark, media, decoder).localCheckpoint(true)
    val banded = sig.select(col("media_id"), col("phash"),
        explode(sequence(lit(0), lit(nBands - 1))).as("band_idx"))
      .withColumn("band_key", expr("(phash >> (band_idx * 8)) & 255"))
    val a = banded.select(col("media_id").as("media_a"), col("phash").as("ph_a"),
      col("band_idx"), col("band_key"))
    val b = banded.select(col("media_id").as("media_b"), col("phash").as("ph_b"),
      col("band_idx"), col("band_key"))
    a.join(b, Seq("band_idx", "band_key"))
      .filter(col("media_a") < col("media_b"))
      .select(col("media_a"), col("media_b"), col("ph_a"), col("ph_b"))
      .distinct() // a pair may share several bands
      .withColumn("hamming",
        bit_count(col("ph_a").bitwiseXOR(col("ph_b"))).cast("int"))
      .filter(col("hamming") <= maxDist)
      .select(col("media_a"), col("media_b"), col("hamming"))
      .orderBy(col("media_a"), col("media_b"))
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

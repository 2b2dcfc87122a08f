package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing for the
  * training-data-pipeline surface: media ride through the engine as
  * opaque `binary` payloads with typed metadata; decode / feature
  * extraction runs as partition-mapped batch functions.
  *
  * The actual codec step is a STUB (this container has no image/audio
  * libraries): [[StubCodec]] derives deterministic fake dimensions/
  * features from the payload bytes. Everything AROUND the stub — the
  * schema contract, the `Dataset[T]` encoders, the partition-mapped
  * batch execution shape (one codec context per partition, streamed
  * row batches), the frame-explosion layout — is the real production
  * plumbing: swapping `StubCodec` for a JNI/javacpp codec changes no
  * query code.
  *
  * Scale design: payloads are the heavy column — all metadata-only
  * operations (`filterByMeta`, routing, joins) prune the payload
  * column before any shuffle (Parquet column pruning keeps multi-MB
  * binaries on disk); decode is mapPartitions (no per-row codec
  * setup); skewed payload sizes are rebalanced by
  * [[repartitionBySizeBytes]] before the expensive decode pass.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  case class MediaFile(
      media_id: Long,
      modality: String, // "image" | "audio" | "video"
      payload: Array[Byte],
      meta: Map[String, String])

  /** Decoded image features (stub-decoded; schema is the contract). */
  case class ImageFeatures(
      media_id: Long,
      width: Int,
      height: Int,
      channels: Int,
      embedding: Array[Float])

  /** One sampled video frame, exploded to its own row. */
  case class Frame(
      media_id: Long,
      frame_index: Int,
      frame_payload: Array[Byte])

  /** Decoded audio features (stub-decoded; schema is the contract). */
  case class AudioFeatures(
      media_id: Long,
      sample_rate: Int,
      n_samples: Long,
      duration_ms: Long,
      mfccish: Array[Float])

  /** Deterministic fake codec — stands in for libjpeg/ffmpeg.
    * Every output is a pure function of the payload bytes, so tests
    * and re-runs are exactly reproducible cluster-wide. */
  object StubCodec {
    def decodeImage(payload: Array[Byte]): (Int, Int, Int) = {
      val h = java.util.Arrays.hashCode(payload)
      val width = 64 + math.floorMod(h, 1024)
      val height = 64 + math.floorMod(h >> 10, 1024)
      (width, height, 3)
    }

    /** Fake visual embedding: byte-histogram moments, L2-normalized. */
    def imageEmbedding(payload: Array[Byte], dim: Int = 8): Array[Float] = {
      val acc = new Array[Float](dim)
      var i = 0
      while (i < payload.length) {
        acc(math.floorMod(payload(i), dim)) += 1f
        i += 1
      }
      val n = math.sqrt(acc.map(x => x.toDouble * x).sum).toFloat max 1e-9f
      acc.map(_ / n)
    }

    /** Fake frame extraction: fixed-stride byte windows. */
    def sampleFrames(payload: Array[Byte], everyN: Int): Seq[Array[Byte]] =
      payload.grouped(math.max(1, everyN)).toSeq

    /** Fake resize: nearest-neighbor byte resample to an output buffer
      * sized targetW·targetH·channels/1024 (deterministic — same bytes
      * in, same bytes out, like a real scaler). */
    def resizeImage(payload: Array[Byte], targetW: Int, targetH: Int): Array[Byte] = {
      val outLen = math.max(1, targetW * targetH * 3 / 1024)
      val out = new Array[Byte](outLen)
      if (payload.nonEmpty) {
        var i = 0
        while (i < outLen) {
          out(i) = payload((i.toLong * payload.length / outLen).toInt)
          i += 1
        }
      }
      out
    }

    /** Fake audio decode: header-derived sample rate, byte-pair
      * samples, and an mfcc-shaped moment vector. */
    def decodeAudio(payload: Array[Byte], dim: Int = 13): (Int, Long, Array[Float]) = {
      val h = java.util.Arrays.hashCode(payload)
      val rates = Array(8000, 16000, 22050, 44100, 48000)
      val sampleRate = rates(math.floorMod(h, rates.length))
      val nSamples = payload.length.toLong / 2
      val acc = new Array[Float](dim)
      var i = 0
      while (i + 1 < payload.length) {
        val s = ((payload(i) & 0xff) << 8) | (payload(i + 1) & 0xff)
        acc(math.floorMod(s, dim)) += 1f
        i += 2
      }
      val n = math.sqrt(acc.map(x => x.toDouble * x).sum).toFloat max 1e-9f
      (sampleRate, nSamples, acc.map(_ / n))
    }
  }

  /** Normalize an arbitrary frame into the canonical media schema. */
  def asMediaTable(df: DataFrame, idCol: String, payloadCol: String,
      modality: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(modality).as("modality"),
      col(payloadCol).cast("binary").as("payload"),
      coalesce(col("meta"), map().cast("map<string,string>")).as("meta"))

  /** Metadata-only pruning BEFORE payloads move: selects ids by meta
    * predicate with the payload column dropped from the scan, then
    * semi-joins the full rows — at 100 TB this is the difference
    * between shuffling kilobytes and shuffling the corpus. */
  def filterByMeta(media: DataFrame, predicate: org.apache.spark.sql.Column): DataFrame = {
    val ids = media.select(col("media_id"), col("meta")).where(predicate)
      .select(col("media_id"))
    media.join(ids, Seq("media_id"), "left_semi")
  }

  /** Rebalance skewed payload sizes so each decode partition carries
    * roughly equal bytes (range-partition on cumulative size proxy). */
  def repartitionBySizeBytes(media: DataFrame, targetPartitions: Int): DataFrame =
    media.withColumn("__sz", length(col("payload")))
      .repartitionByRange(targetPartitions, col("__sz"), col("media_id"))
      .drop("__sz")

  /** Partition-mapped image decode + feature extraction: the codec
    * context is per-partition (the `it =>` closure), rows stream
    * through in one pass — the production batch shape. */
  def decodeImages(spark: SparkSession, media: DataFrame): Dataset[ImageFeatures] = {
    import spark.implicits._
    media.where(col("modality") === "image")
      .select(col("media_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // real impl: initialize codec once per partition here
        it.map { case (id, payload) =>
          val (w, h, c) = StubCodec.decodeImage(payload)
          ImageFeatures(id, w, h, c, StubCodec.imageEmbedding(payload))
        }
      }
  }

  /** Partition-mapped image resize: payload → payload, metadata gains
    * the target geometry. Payload-in/payload-out ops keep the media
    * table schema closed under transformation, so resize → decode →
    * frame-sample pipelines compose. */
  def resizeImages(spark: SparkSession, media: DataFrame,
      targetW: Int, targetH: Int): Dataset[MediaFile] = {
    import spark.implicits._
    media.where(col("modality") === "image").as[MediaFile]
      .mapPartitions { it =>
        it.map { m =>
          m.copy(
            payload = StubCodec.resizeImage(m.payload, targetW, targetH),
            meta = m.meta + ("resized" -> s"${targetW}x$targetH"))
        }
      }
  }

  /** Partition-mapped audio decode + feature extraction — the audio
    * twin of [[decodeImages]]. */
  def decodeAudio(spark: SparkSession, media: DataFrame): Dataset[AudioFeatures] = {
    import spark.implicits._
    media.where(col("modality") === "audio")
      .select(col("media_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          val (rate, n, feats) = StubCodec.decodeAudio(payload)
          AudioFeatures(id, rate, n, n * 1000L / rate, feats)
        }
      }
  }

  /** Video frame sampling: one input row → N frame rows (flatMap —
    * Spark's generator shape for frame fan-out). */
  def sampleFrames(spark: SparkSession, media: DataFrame,
      strideBytes: Int): Dataset[Frame] = {
    import spark.implicits._
    media.where(col("modality") === "video")
      .select(col("media_id"), col("payload")).as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        StubCodec.sampleFrames(payload, strideBytes).zipWithIndex
          .map { case (f, i) => Frame(id, i, f) }
      }
  }
}

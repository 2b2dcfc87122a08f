package graft.operators

import java.nio.charset.StandardCharsets.US_ASCII

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing for the
  * training-data-pipeline surface: media ride through the engine as
  * opaque `binary` columns with typed metadata; decode / feature
  * extraction runs as partition-mapped batch functions.
  *
  * The IMAGE, AUDIO, and VIDEO paths are real codecs: [[Ppm]] is a
  * genuine binary-PPM (P6) encoder/decoder — [[decodeImages]] parses
  * the payload bytes (magic, geometry, maxval, raster) and derives
  * features (geometry, per-channel sums, a pixel-histogram embedding)
  * from the decoded raster, exactly as a libjpeg-backed decoder would
  * from JPEG bytes — [[Wav]] is a genuine RIFF/WAVE PCM16
  * chunk-walking parser feeding [[decodeAudio]], and [[Y4m]] is a
  * genuine YUV4MPEG2 stream parser (header walk + per-FRAME raster)
  * feeding [[decodeVideos]]/[[sampleVideoFrames]]. Only COMPRESSED
  * codecs (JPEG/H.264 — this container has no media libraries) are
  * out of scope; [[StubCodec]]'s byte-stride framing remains as the
  * format-agnostic fallback, so swapping in a JNI/javacpp codec
  * changes no query code.
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

  /** Decoded image features, derived from the decoded raster. */
  case class ImageFeatures(
      media_id: Long,
      width: Int,
      height: Int,
      channels: Int,
      ch0_sum: Long,
      ch1_sum: Long,
      ch2_sum: Long,
      embedding: Array[Float])

  /** One sampled video frame, exploded to its own row. */
  case class Frame(
      media_id: Long,
      frame_index: Int,
      frame_payload: Array[Byte])

  /** Decoded audio features — geometry from the parsed RIFF header,
    * amplitude moments from the decoded PCM samples. `n_frames` is
    * per-channel sample count (what "duration" means); `sum_amp` /
    * `sum_sq` are integer-exact over the interleaved samples, so an
    * external oracle can recompute them from generator parameters. */
  case class AudioFeatures(
      media_id: Long,
      sample_rate: Int,
      channels: Int,
      n_frames: Long,
      duration_ms: Long,
      sum_amp: Long,
      sum_sq: Long)

  /** Real binary-PPM (P6) codec — netpbm's public image format: ASCII
    * header `P6 <width> <height> <maxval>` (whitespace-separated, `#`
    * comments allowed) followed by one whitespace byte and the
    * `width·height·3` RGB raster. Chosen because it is decodable in
    * pure JVM code with zero libraries while still being a genuine
    * parse of untrusted bytes (malformed input throws, exactly like a
    * real codec). */
  object Ppm {

    /** A decoded image: row-major RGB raster. */
    final case class Image(width: Int, height: Int, maxVal: Int,
        pixels: Array[Byte])

    /** Encode a P6 PPM; `pixel(x, y, c)` must return 0..255. */
    def encode(width: Int, height: Int,
        pixel: (Int, Int, Int) => Int): Array[Byte] = {
      require(width > 0 && height > 0, "empty image")
      val header = s"P6\n$width $height\n255\n".getBytes(US_ASCII)
      val out = new Array[Byte](header.length + width * height * 3)
      System.arraycopy(header, 0, out, 0, header.length)
      var o = header.length
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          var c = 0
          while (c < 3) { out(o) = pixel(x, y, c).toByte; o += 1; c += 1 }
          x += 1
        }
        y += 1
      }
      out
    }

    /** Decode a P6 PPM payload. Throws on malformed bytes (wrong
      * magic, non-numeric geometry, truncated raster) — decode is a
      * real parse, not a trusted cast. */
    def decode(payload: Array[Byte]): Image = {
      var pos = 0
      def skipWs(): Unit = {
        var done = false
        while (!done && pos < payload.length) {
          val b = payload(pos)
          if (b == '#') {
            while (pos < payload.length && payload(pos) != '\n') pos += 1
          } else if (b == ' ' || b == '\t' || b == '\n' || b == '\r') pos += 1
          else done = true
        }
      }
      def token(): String = {
        skipWs()
        val start = pos
        while (pos < payload.length &&
          !Character.isWhitespace(payload(pos).toChar)) pos += 1
        require(pos > start, "truncated PPM header")
        new String(payload, start, pos - start, US_ASCII)
      }
      val magic = token()
      require(magic == "P6", s"not a binary PPM (magic '$magic')")
      val w = token().toInt
      val h = token().toInt
      val maxVal = token().toInt
      require(w > 0 && h > 0 && maxVal > 0 && maxVal < 256,
        s"unsupported PPM geometry ${w}x$h maxval $maxVal")
      pos += 1 // exactly one whitespace byte separates header and raster
      // long arithmetic: a crafted huge geometry must fail the length
      // check, not overflow int into a bogus "valid" size
      val n = w.toLong * h.toLong * 3L
      require(payload.length.toLong - pos >= n,
        s"truncated PPM raster: need $n bytes, have ${payload.length - pos}")
      Image(w, h, maxVal,
        java.util.Arrays.copyOfRange(payload, pos, pos + n.toInt))
    }

    /** Nearest-neighbor resample to `tw`×`th` — decode → sample →
      * re-encode, the real scaler shape. */
    def resize(payload: Array[Byte], tw: Int, th: Int): Array[Byte] = {
      val img = decode(payload)
      encode(tw, th, (x, y, c) => {
        val sx = (x.toLong * img.width / tw).toInt
        val sy = (y.toLong * img.height / th).toInt
        img.pixels((sy * img.width + sx) * 3 + c) & 0xff
      })
    }
  }

  /** Pixel-histogram embedding over a decoded raster: byte values
    * bucketed mod `dim`, L2-normalized — a real (if simple) visual
    * feature, computed from decoded pixels rather than payload bytes. */
  def histogramEmbedding(pixels: Array[Byte], dim: Int = 8): Array[Float] = {
    val acc = new Array[Float](dim)
    var i = 0
    while (i < pixels.length) {
      acc((pixels(i) & 0xff) % dim) += 1f
      i += 1
    }
    val n = math.sqrt(acc.map(x => x.toDouble * x).sum).toFloat max 1e-9f
    acc.map(_ / n)
  }

  /** Decode one image payload into features: geometry from the parsed
    * header, per-channel sums + histogram embedding from the raster. */
  def imageFeatures(id: Long, payload: Array[Byte]): ImageFeatures = {
    val img = Ppm.decode(payload)
    var s0 = 0L; var s1 = 0L; var s2 = 0L
    var i = 0
    while (i < img.pixels.length) {
      s0 += img.pixels(i) & 0xff
      s1 += img.pixels(i + 1) & 0xff
      s2 += img.pixels(i + 2) & 0xff
      i += 3
    }
    ImageFeatures(id, img.width, img.height, 3, s0, s1, s2,
      histogramEmbedding(img.pixels))
  }

  /** Deterministic synthetic PPM: geometry and every pixel are pure
    * closed-form functions of the id (`w = 8 + id mod 25`,
    * `h = 8 + (id div 25) mod 25`,
    * `pixel(x,y,c) = (id + x + y + 85c) mod 256`), so an EXTERNAL
    * oracle can recompute the decoded features without running this
    * code — the generator stands in for a real image corpus (none in
    * this container) while keeping decode a genuine parse. */
  def syntheticPpm(id: Long): Array[Byte] = {
    val w = (8 + Math.floorMod(id, 25L)).toInt
    val h = (8 + Math.floorMod(id / 25L, 25L)).toInt
    Ppm.encode(w, h,
      (x, y, c) => Math.floorMod(id + x + y + 85L * c, 256L).toInt)
  }

  /** Media table of synthetic PPMs, one image per input id — the
    * partition-mapped generator twin of [[decodeImages]]. */
  def syntheticPpmTable(spark: SparkSession, df: DataFrame,
      idCol: String): Dataset[MediaFile] = {
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions(_.map(id =>
        MediaFile(id, "image", syntheticPpm(id), Map.empty)))
  }

  /** Real RIFF/WAVE PCM16 codec — the audio twin of [[Ppm]]: a
    * genuine chunk-walking parse of the public WAV container (RIFF
    * header, `fmt ` chunk, `data` chunk, unknown chunks skipped with
    * odd-size padding, malformed input throws), decodable in pure JVM
    * code with zero libraries. Samples are interleaved little-endian
    * signed 16-bit. */
  object Wav {

    /** Decoded audio: interleaved per-frame samples. */
    final case class Audio(sampleRate: Int, channels: Int,
        samples: Array[Short])

    private def putIntLE(b: Array[Byte], o: Int, v: Int): Unit = {
      b(o) = v.toByte; b(o + 1) = (v >> 8).toByte
      b(o + 2) = (v >> 16).toByte; b(o + 3) = (v >> 24).toByte
    }
    private def putShortLE(b: Array[Byte], o: Int, v: Int): Unit = {
      b(o) = v.toByte; b(o + 1) = (v >> 8).toByte
    }
    private def intLE(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
        ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    private def shortLE(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    private def tag(b: Array[Byte], o: Int): String =
      new String(b, o, 4, US_ASCII)

    /** Encode a canonical 44-byte-header PCM16 WAV. */
    def encode(sampleRate: Int, channels: Int,
        samples: Array[Short]): Array[Byte] = {
      require(sampleRate > 0 && channels > 0, "bad WAV geometry")
      require(samples.length % channels == 0,
        "interleaved sample count must be a channel multiple")
      val dataSize = samples.length * 2
      val out = new Array[Byte](44 + dataSize)
      System.arraycopy("RIFF".getBytes(US_ASCII), 0, out, 0, 4)
      putIntLE(out, 4, 36 + dataSize)
      System.arraycopy("WAVE".getBytes(US_ASCII), 0, out, 8, 4)
      System.arraycopy("fmt ".getBytes(US_ASCII), 0, out, 12, 4)
      putIntLE(out, 16, 16) // PCM fmt chunk size
      putShortLE(out, 20, 1) // audioFormat = PCM
      putShortLE(out, 22, channels)
      putIntLE(out, 24, sampleRate)
      putIntLE(out, 28, sampleRate * channels * 2) // byte rate
      putShortLE(out, 32, channels * 2) // block align
      putShortLE(out, 34, 16) // bits per sample
      System.arraycopy("data".getBytes(US_ASCII), 0, out, 36, 4)
      putIntLE(out, 40, dataSize)
      var i = 0
      while (i < samples.length) {
        putShortLE(out, 44 + i * 2, samples(i)); i += 1
      }
      out
    }

    /** Decode a PCM16 WAV payload. Walks the chunk list (any order,
      * unknown chunks skipped, odd sizes padded per RIFF), requires
      * PCM format with 16-bit samples, throws on anything malformed —
      * a real parse of untrusted bytes, not a trusted cast. */
    def decode(payload: Array[Byte]): Audio = {
      require(payload.length >= 12 && tag(payload, 0) == "RIFF" &&
        tag(payload, 8) == "WAVE", "not a RIFF/WAVE payload")
      var pos = 12
      var rate = -1; var channels = -1
      var dataOff = -1; var dataLen = -1
      while (pos + 8 <= payload.length && (rate < 0 || dataOff < 0)) {
        val id = tag(payload, pos)
        val sz = intLE(payload, pos + 4)
        // long arithmetic: a crafted size near Int.MaxValue must fail
        // the bound check, not overflow into a bogus "valid" offset
        require(sz >= 0 && pos.toLong + 8L + sz <= payload.length,
          s"truncated WAV chunk '$id'")
        id match {
          case "fmt " =>
            require(sz >= 16, "short fmt chunk")
            require(shortLE(payload, pos + 8) == 1, "not PCM audio")
            channels = shortLE(payload, pos + 10)
            rate = intLE(payload, pos + 12)
            require(shortLE(payload, pos + 22) == 16,
              "only 16-bit samples supported")
          case "data" => dataOff = pos + 8; dataLen = sz
          case _ => () // skip unknown chunk (LIST, fact, …)
        }
        pos += 8 + sz + (sz & 1) // RIFF pads odd chunks to even
      }
      require(rate > 0 && channels > 0, "missing fmt chunk")
      require(dataOff >= 0, "missing data chunk")
      require(dataLen % (channels * 2) == 0,
        "data length is not a whole number of frames")
      val samples = new Array[Short](dataLen / 2)
      var i = 0
      while (i < samples.length) {
        samples(i) = shortLE(payload, dataOff + i * 2).toShort; i += 1
      }
      Audio(rate, channels, samples)
    }
  }

  /** Deterministic synthetic WAV: rate, channel count, frame count and
    * every sample are closed-form functions of the id
    * (`rate = [8000,16000,22050,44100,48000][id mod 5]`,
    * `channels = 1 + id mod 2`, `frames = 500 + (31·id) mod 1500`,
    * `sample(j) = ((id + 7919·j) mod 65536) − 32768` over the
    * interleaved index), so an external oracle recomputes the decoded
    * features without running this code — the audio analogue of
    * [[syntheticPpm]]. */
  def syntheticWav(id: Long): Array[Byte] = {
    val rates = Array(8000, 16000, 22050, 44100, 48000)
    val rate = rates(Math.floorMod(id, 5L).toInt)
    val channels = 1 + Math.floorMod(id, 2L).toInt
    val frames = (500 + Math.floorMod(31L * id, 1500L)).toInt
    val samples = new Array[Short](frames * channels)
    var j = 0
    while (j < samples.length) {
      samples(j) = (Math.floorMod(id + 7919L * j, 65536L) - 32768L).toShort
      j += 1
    }
    Wav.encode(rate, channels, samples)
  }

  /** Media table of synthetic WAVs, one clip per input id — the
    * partition-mapped generator twin of [[decodeAudio]]. */
  def syntheticWavTable(spark: SparkSession, df: DataFrame,
      idCol: String): Dataset[MediaFile] = {
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions(_.map(id =>
        MediaFile(id, "audio", syntheticWav(id), Map.empty)))
  }

  /** Decode one audio payload into features: geometry from the parsed
    * header, integer-exact amplitude moments from the samples. */
  def audioFeatures(id: Long, payload: Array[Byte]): AudioFeatures = {
    val a = Wav.decode(payload)
    var sumAmp = 0L; var sumSq = 0L
    var i = 0
    while (i < a.samples.length) {
      val s = a.samples(i).toLong
      sumAmp += s; sumSq += s * s; i += 1
    }
    val frames = a.samples.length.toLong / a.channels
    AudioFeatures(id, a.sampleRate, a.channels, frames,
      frames * 1000L / a.sampleRate, sumAmp, sumSq)
  }

  /** Real YUV4MPEG2 (y4m) codec — the video twin of [[Ppm]] / [[Wav]]:
    * the public uncompressed-video interchange container (what ffmpeg
    * emits with `-f yuv4mpegpipe`). Stream header
    * `YUV4MPEG2 W<w> H<h> F<num>:<den> … C444\n`, then per frame a
    * `FRAME…\n` marker followed by `w·h·3` planar bytes (C444: full-
    * resolution Y, U, V planes). Decode is a genuine parse — tagged
    * header walk, unknown parameters skipped, wrong magic / truncated
    * frames / non-C444 colorspaces throw — in pure JVM code with zero
    * libraries. */
  object Y4m {

    /** A decoded video: planar C444 frames, each `width·height·3`. */
    final case class Video(width: Int, height: Int, fpsNum: Int,
        fpsDen: Int, frames: Seq[Array[Byte]])

    def encode(width: Int, height: Int, fpsNum: Int, fpsDen: Int,
        frames: Seq[Array[Byte]]): Array[Byte] = {
      require(width > 0 && height > 0 && fpsNum > 0 && fpsDen > 0,
        "bad y4m geometry")
      val fsz = width * height * 3
      require(frames.forall(_.length == fsz),
        s"frame size mismatch: want $fsz bytes per frame")
      val header =
        s"YUV4MPEG2 W$width H$height F$fpsNum:$fpsDen Ip A1:1 C444\n"
          .getBytes(US_ASCII)
      val fm = "FRAME\n".getBytes(US_ASCII)
      val out =
        new Array[Byte](header.length + frames.size * (fm.length + fsz))
      System.arraycopy(header, 0, out, 0, header.length)
      var o = header.length
      frames.foreach { f =>
        System.arraycopy(fm, 0, out, o, fm.length); o += fm.length
        System.arraycopy(f, 0, out, o, fsz); o += fsz
      }
      out
    }

    def decode(payload: Array[Byte]): Video = {
      var nl = 0
      while (nl < payload.length && payload(nl) != '\n') nl += 1
      require(nl < payload.length, "truncated y4m stream header")
      val header = new String(payload, 0, nl, US_ASCII)
      val parts = header.split(" ")
      require(parts.head == "YUV4MPEG2",
        s"not a y4m stream (magic '${parts.head}')")
      var w = -1; var h = -1; var fn = 30; var fd = 1; var cs = "C420"
      parts.tail.filter(_.nonEmpty).foreach { p =>
        p.charAt(0) match {
          case 'W' => w = p.substring(1).toInt
          case 'H' => h = p.substring(1).toInt
          case 'F' =>
            val r = p.substring(1).split(":")
            require(r.length == 2, s"malformed frame rate '$p'")
            fn = r(0).toInt; fd = r(1).toInt
          case 'C' => cs = p
          case _ => () // Ip/A/X parameters: legal, irrelevant here
        }
      }
      require(w > 0 && h > 0 && fn > 0 && fd > 0,
        s"unsupported y4m geometry ${w}x$h F$fn:$fd")
      require(cs == "C444", s"unsupported colorspace $cs (C444 only)")
      val fsz = w.toLong * h.toLong * 3L
      val frames = Seq.newBuilder[Array[Byte]]
      var pos = nl + 1
      while (pos < payload.length) {
        // FRAME marker with optional parameters up to its newline
        require(payload.length - pos >= 5 &&
          new String(payload, pos, 5, US_ASCII) == "FRAME",
          s"malformed frame marker at byte $pos")
        pos += 5
        while (pos < payload.length && payload(pos) != '\n') pos += 1
        require(pos < payload.length, "truncated frame header")
        pos += 1
        require(payload.length.toLong - pos >= fsz,
          s"truncated frame: need $fsz bytes, have ${payload.length - pos}")
        frames += java.util.Arrays.copyOfRange(payload, pos, pos + fsz.toInt)
        pos += fsz.toInt
      }
      Video(w, h, fn, fd, frames.result())
    }
  }

  /** Decoded video features: geometry from the parsed stream header,
    * frame count from the real frame walk, integer-exact byte sum
    * over the SAMPLED frames (every `everyN`-th, from frame 0). */
  case class VideoFeatures(
      media_id: Long,
      width: Long,
      height: Long,
      fps_num: Long,
      fps_den: Long,
      n_frames: Long,
      sampled_frames: Long,
      sampled_sum: Long)

  /** Synthetic y4m generator (closed form:
    * `byte(f, i) = (id·31 + f·17 + i·7) mod 251`, geometry and fps
    * derived from the id), so an EXTERNAL oracle recomputes the
    * decoded features without running this code — same pattern as
    * [[syntheticPpm]] / [[syntheticWav]]. */
  def syntheticY4m(id: Long): Array[Byte] = {
    val w = (4 + Math.floorMod(id, 5L)).toInt
    val h = (3 + Math.floorMod(id / 5L, 4L)).toInt
    val nf = (2 + Math.floorMod(id, 4L)).toInt
    val fps = Array(24, 25, 30)(Math.floorMod(id, 3L).toInt)
    val fsz = w * h * 3
    val frames = (0 until nf).map { f =>
      val b = new Array[Byte](fsz)
      var i = 0
      while (i < fsz) {
        b(i) = Math.floorMod(id * 31L + f * 17L + i * 7L, 251L).toByte
        i += 1
      }
      b
    }
    Y4m.encode(w, h, fps, 1, frames)
  }

  /** Media table of synthetic y4m clips, one per input id. */
  def syntheticY4mTable(spark: SparkSession, df: DataFrame,
      idCol: String): Dataset[MediaFile] = {
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions(_.map(id =>
        MediaFile(id, "video", syntheticY4m(id), Map.empty)))
  }

  /** Decode one video payload into features, sampling every
    * `everyN`-th frame for the byte-sum moment. */
  def videoFeatures(id: Long, payload: Array[Byte],
      everyN: Int): VideoFeatures = {
    val v = Y4m.decode(payload)
    var sampled = 0L; var sum = 0L
    var f = 0
    while (f < v.frames.length) {
      if (f % everyN == 0) {
        sampled += 1
        val fr = v.frames(f)
        var i = 0
        while (i < fr.length) { sum += fr(i) & 0xff; i += 1 }
      }
      f += 1
    }
    VideoFeatures(id, v.width, v.height, v.fpsNum, v.fpsDen,
      v.frames.length, sampled, sum)
  }

  /** Partition-mapped video decode + sampled feature extraction — the
    * video twin of [[decodeImages]]/[[decodeAudio]]: a REAL [[Y4m]]
    * parse per row. */
  def decodeVideos(spark: SparkSession, media: DataFrame,
      everyN: Int = 2): Dataset[VideoFeatures] = {
    import spark.implicits._
    media.where(col("modality") === "video")
      .select(col("media_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) => videoFeatures(id, p, everyN) })
  }

  /** One consecutive-frame comparison: per-byte absolute difference
    * summed over the frame, plus the cut verdict. */
  final case class SceneCut(media_id: Long, frame: Long, diff_sum: Long,
      is_cut: Boolean)

  /** Scene-cut detection — the video-curation segmentation step (cut
    * boundaries are where frame samplers and clip extractors split):
    * per consecutive DECODED frame pair, the summed per-byte absolute
    * difference; a cut fires when it exceeds `perByteThreshold` ×
    * frame size (integer-exact — no float drift between engines).
    * Row-local like every codec pass: one media file's frames never
    * leave their partition, and only the per-pair scalars survive the
    * map side. */
  def sceneCuts(spark: SparkSession, media: DataFrame,
      perByteThreshold: Long = 50L): Dataset[SceneCut] = {
    import spark.implicits._
    media.where(col("modality") === "video")
      .select(col("media_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, p) =>
        val v = Y4m.decode(p)
        val fsz = v.width * v.height * 3
        (0 until v.frames.length - 1).iterator.map { f =>
          val a = v.frames(f); val b = v.frames(f + 1)
          var i = 0; var sum = 0L
          while (i < fsz) {
            sum += math.abs((a(i) & 0xff) - (b(i) & 0xff)); i += 1
          }
          SceneCut(id, f.toLong, sum, sum > fsz * perByteThreshold)
        }
      })
  }

  /** Real frame explosion: every `everyN`-th DECODED frame as its own
    * [[Frame]] row (raw C444 plane bytes as the frame payload) — the
    * generator fan-out a downstream per-frame featurizer consumes. */
  def sampleVideoFrames(spark: SparkSession, media: DataFrame,
      everyN: Int): Dataset[Frame] = {
    import spark.implicits._
    media.where(col("modality") === "video")
      .select(col("media_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, p) =>
        Y4m.decode(p).frames.iterator.zipWithIndex
          .filter(_._2 % everyN == 0)
          .map { case (fr, i) => Frame(id, i, fr) }
      })
  }

  /** Deterministic fake codec — stands in for ffmpeg on the VIDEO
    * BYTE-STRIDE path only (images decode for real via [[Ppm]], audio
    * via [[Wav]], video containers via [[Y4m]]). Every output is a
    * pure function of the payload bytes, so tests and re-runs are
    * exactly reproducible cluster-wide. */
  object StubCodec {

    /** Fake frame extraction: fixed-stride byte windows. */
    def sampleFrames(payload: Array[Byte], everyN: Int): Seq[Array[Byte]] =
      payload.grouped(math.max(1, everyN)).toSeq
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
    * through in one pass — the production batch shape. Payloads must
    * be binary PPM ([[Ppm.decode]] throws otherwise, as any codec
    * does on bytes of the wrong format). */
  def decodeImages(spark: SparkSession, media: DataFrame): Dataset[ImageFeatures] = {
    import spark.implicits._
    media.where(col("modality") === "image")
      .select(col("media_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) => imageFeatures(id, payload) }
      }
  }

  /** [[decodeImages]] with per-row failure isolation — the production
    * posture at 100 TB, where one corrupt file among billions must be
    * quarantined, not job-fatal: a row whose payload fails to parse
    * yields `(media_id, error)` on the errors side; clean rows decode
    * exactly as [[decodeImages]]. Returns (features, errors). Strict
    * [[decodeImages]] remains the default: in a pipeline with a
    * trusted upstream, silently skipping rows is the bigger bug. */
  def decodeImagesLenient(spark: SparkSession, media: DataFrame)
      : (Dataset[ImageFeatures], DataFrame) = {
    import spark.implicits._
    val attempted = media.where(col("modality") === "image")
      .select(col("media_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          try (Option(imageFeatures(id, payload)),
            Option.empty[(Long, String)])
          catch {
            // NonFatal, not just IAE: geometry parse failures surface
            // as NumberFormatException — any parse crash quarantines
            case scala.util.control.NonFatal(e) =>
              (Option.empty[ImageFeatures],
                Option((id, String.valueOf(e.getMessage))))
          }
        }
      }
      .cache() // both branches filter the same attempt pass
    val feats = attempted.flatMap(_._1)
    val errs = attempted.flatMap(_._2).toDF("media_id", "error")
    (feats, errs)
  }

  /** Partition-mapped image resize: payload → payload (decode →
    * nearest-neighbor resample → re-encode), metadata gains the target
    * geometry. Payload-in/payload-out ops keep the media table schema
    * closed under transformation, so resize → decode → frame-sample
    * pipelines compose. */
  def resizeImages(spark: SparkSession, media: DataFrame,
      targetW: Int, targetH: Int): Dataset[MediaFile] = {
    import spark.implicits._
    media.where(col("modality") === "image").as[MediaFile]
      .mapPartitions { it =>
        it.map { m =>
          m.copy(
            payload = Ppm.resize(m.payload, targetW, targetH),
            meta = m.meta + ("resized" -> s"${targetW}x$targetH"))
        }
      }
  }

  /** Partition-mapped audio decode + feature extraction — the audio
    * twin of [[decodeImages]]: a REAL [[Wav]] parse per row (throws on
    * non-WAV bytes, as any codec does on the wrong format). */
  def decodeAudio(spark: SparkSession, media: DataFrame): Dataset[AudioFeatures] = {
    import spark.implicits._
    media.where(col("modality") === "audio")
      .select(col("media_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) => audioFeatures(id, payload) }
      }
  }

  /** Per-image perceptual hash row. */
  final case class ImageHash(media_id: Long, dhash: Long)

  /** Perceptual dHash over DECODED pixels — the image-plane near-dup
    * fingerprint (crop-resistant where byte hashes are not): resize
    * to a 9×8 thumbnail (the real [[Ppm.resize]] nearest-neighbor
    * path), integer grayscale, one bit per horizontal gradient
    * `g(x+1,y) > g(x,y)`. 63 bits (position 63 unused) so the hash
    * stays a positive BIGINT in every engine the oracle runs on.
    * Row-local; payload bytes never survive the map side. */
  def dHashes(spark: SparkSession, media: DataFrame): Dataset[ImageHash] = {
    import spark.implicits._
    media.where(col("modality") === "image")
      .select(col("media_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) =>
        val t = Ppm.decode(Ppm.resize(p, 9, 8))
        def gray(x: Int, y: Int): Int = {
          val o = (y * 9 + x) * 3
          ((t.pixels(o) & 0xff) + (t.pixels(o + 1) & 0xff) +
            (t.pixels(o + 2) & 0xff)) / 3
        }
        var h = 0L
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            val pos = y * 8 + x
            if (pos < 63 && gray(x + 1, y) > gray(x, y)) h |= 1L << pos
            x += 1
          }
          y += 1
        }
        ImageHash(id, h)
      })
  }

  /** Image near-duplicate profile: per image, its dHash and the count
    * of OTHER images within `maxHamming` bits — the image-plane twin
    * of the SimHash text pairs, with the same pigeonhole index: the
    * 63-bit hash splits into `maxHamming + 1` chunks, a pair within
    * the bound must agree on at least one chunk, so candidates join
    * on chunk keys (bucketed — never all-pairs) and verify with an
    * in-condition popcount. At driver scale buckets are uncapped;
    * corpus deployments cap them like `Dedup.simhashPairs` (hot
    * buckets are ubiquitous-pattern images — low-signal by the same
    * argument as ubiquitous shingles). */
  def imageNearDupCounts(spark: SparkSession, media: DataFrame,
      maxHamming: Int = 2): DataFrame = {
    val hs = dHashes(spark, media).toDF()
    val chunks = maxHamming + 1
    val width = 63 / chunks
    val chunkCols = (0 until chunks).map { c =>
      val hi = if (c == chunks - 1) 63 - c * width else width
      struct(lit(c).as("chunk"),
        shiftrightunsigned(col("dhash"), c * width)
          .bitwiseAND((1L << hi) - 1L).as("key"))
    }
    val ex = hs.select(col("media_id"), col("dhash"),
      explode(array(chunkCols: _*)).as("ck"))
    val pairs = ex.as("a")
      .join(ex.as("b"),
        col("a.ck") === col("b.ck") &&
          col("a.media_id") < col("b.media_id") &&
          bit_count(col("a.dhash").bitwiseXOR(col("b.dhash")))
            <= maxHamming)
      .select(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"))
      .distinct()
    val counts = pairs.select(col("id_a").as("media_id"))
      .unionAll(pairs.select(col("id_b").as("media_id")))
      .groupBy(col("media_id")).agg(count(lit(1)).as("n_near"))
    hs.join(counts, Seq("media_id"), "left")
      .select(col("media_id"), col("dhash"),
        coalesce(col("n_near"), lit(0L)).as("n_near"))
  }

  /** Per-sample audio quality verdict counts. */
  final case class AudioQuality(media_id: Long, n_samples: Long,
      n_silent: Long, n_clipped: Long, peak: Long)

  /** Audio QUALITY profiling — the curation gate for speech/audio
    * corpora: per clip, how many decoded samples are near-silence
    * (|v| < `silenceThr` — dead air, broken mics) and how many sit at
    * the clipping rail (|v| ≥ `clipThr` — distorted takes), plus the
    * peak amplitude. Integer-exact over the real PCM16 parse, one
    * row-local pass per clip; the filter decision (drop clips that
    * are mostly silence or heavily clipped) composes as plain column
    * predicates downstream. */
  def audioQuality(spark: SparkSession, media: DataFrame,
      silenceThr: Long = 1000L, clipThr: Long = 32700L)
      : Dataset[AudioQuality] = {
    import spark.implicits._
    media.where(col("modality") === "audio")
      .select(col("media_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        val a = Wav.decode(payload)
        var silent = 0L; var clipped = 0L; var peak = 0L
        var i = 0
        while (i < a.samples.length) {
          val v = math.abs(a.samples(i).toLong)
          if (v < silenceThr) silent += 1
          if (v >= clipThr) clipped += 1
          if (v > peak) peak = v
          i += 1
        }
        AudioQuality(id, a.samples.length.toLong, silent, clipped, peak)
      })
  }

  /** [[decodeAudio]] with per-row failure isolation — the audio twin
    * of [[decodeImagesLenient]] (same quarantine contract). */
  def decodeAudioLenient(spark: SparkSession, media: DataFrame)
      : (Dataset[AudioFeatures], DataFrame) = {
    import spark.implicits._
    val attempted = media.where(col("modality") === "audio")
      .select(col("media_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          try (Option(audioFeatures(id, payload)),
            Option.empty[(Long, String)])
          catch {
            case scala.util.control.NonFatal(e) =>
              (Option.empty[AudioFeatures],
                Option((id, String.valueOf(e.getMessage))))
          }
        }
      }
      .cache()
    val feats = attempted.flatMap(_._1)
    val errs = attempted.flatMap(_._2).toDF("media_id", "error")
    (feats, errs)
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

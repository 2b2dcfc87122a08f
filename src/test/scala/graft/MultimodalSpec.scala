package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.operators.Multimodal.Ppm

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  // media table: real PPM payloads for images, raw bytes for video
  private def media() = {
    val df = Seq(
      (1L, "image", Multimodal.syntheticPpm(1L), Map("source" -> "cam0")),
      (2L, "image", Multimodal.syntheticPpm(2L), Map("source" -> "cam1")),
      (3L, "video", "0123456789abcdef0123456789".getBytes("UTF-8"),
        Map("source" -> "cam0")))
      .toDF("media_id", "modality", "payload", "meta")
    df
  }

  test("canonical media schema: binary payload + typed meta") {
    val m = Multimodal.asMediaTable(
      Seq((7L, Array[Byte](1, 2, 3))).toDF("k", "p")
        .withColumn("meta", map(lit("a"), lit("b"))),
      "k", "p", "image")
    val r = m.head()
    assert(m.columns.toSeq == Seq("media_id", "modality", "payload", "meta"))
    assert(r.getAs[String]("modality") == "image")
    assert(r.getAs[Array[Byte]]("payload").toSeq == Seq[Byte](1, 2, 3))
  }

  test("Ppm round-trips: encode then decode recovers geometry and pixels") {
    val px = (x: Int, y: Int, c: Int) => (x * 7 + y * 3 + c * 11) % 256
    val bytes = Ppm.encode(5, 4, px)
    val img = Ppm.decode(bytes)
    assert(img.width == 5 && img.height == 4 && img.maxVal == 255)
    for (y <- 0 until 4; x <- 0 until 5; c <- 0 until 3)
      assert((img.pixels((y * 5 + x) * 3 + c) & 0xff) == px(x, y, c))
  }

  test("Ppm.decode handles comments and rejects malformed bytes") {
    val base = Ppm.encode(2, 2, (_, _, _) => 9)
    // inject a comment line into the header
    val commented = ("P6\n# a comment\n2 2\n255\n").getBytes("US-ASCII") ++
      base.drop("P6\n2 2\n255\n".length)
    assert(Ppm.decode(commented).pixels.forall(b => (b & 0xff) == 9))
    intercept[IllegalArgumentException] {
      Ppm.decode("P5\n2 2\n255\n....".getBytes("US-ASCII")) // wrong magic
    }
    intercept[IllegalArgumentException] {
      Ppm.decode(base.dropRight(3)) // truncated raster
    }
  }

  test("decodeImages parses real PPM bytes; features match closed form") {
    val feats = Multimodal.decodeImages(spark, media()).collect()
      .map(f => f.media_id -> f).toMap
    assert(feats.keySet == Set(1L, 2L)) // video row excluded
    for (id <- Seq(1L, 2L)) {
      val f = feats(id)
      // generator closed form: w = 8 + id mod 25, h = 8 + (id/25) mod 25
      assert(f.width == (8 + id % 25).toInt)
      assert(f.height == (8 + (id / 25) % 25).toInt)
      assert(f.channels == 3)
      // per-channel sums recomputed independently of the codec
      def chSum(c: Int): Long = (for {
        y <- 0 until f.height; x <- 0 until f.width
      } yield Math.floorMod(id + x + y + 85L * c, 256L)).sum
      assert(f.ch0_sum == chSum(0))
      assert(f.ch1_sum == chSum(1))
      assert(f.ch2_sum == chSum(2))
      val n = math.sqrt(f.embedding.map(x => x.toDouble * x).sum)
      assert(math.abs(n - 1.0) < 1e-3)
    }
  }

  test("sampleFrames explodes video payloads into indexed frame rows") {
    val frames = Multimodal.sampleFrames(spark, media(), strideBytes = 10)
      .collect().sortBy(_.frame_index)
    assert(frames.forall(_.media_id == 3L))
    assert(frames.length == 3) // 26 bytes / 10 → 10,10,6
    assert(frames.map(_.frame_index).toSeq == Seq(0, 1, 2))
    assert(frames.map(_.frame_payload.length).toSeq == Seq(10, 10, 6))
  }

  test("resizeImages: real nearest-neighbor resample, schema closed") {
    val out = Multimodal.resizeImages(spark, media(), 4, 4).collect()
      .map(m => m.media_id -> m).toMap
    assert(out.keySet == Set(1L, 2L)) // video row excluded
    assert(out(1L).meta("resized") == "4x4")
    val resized = Ppm.decode(out(1L).payload)
    assert(resized.width == 4 && resized.height == 4)
    // nearest-neighbor: resized pixel (x,y,c) samples the source at
    // (x*w/4, y*h/4) — verify against the generator closed form
    val (w, h) = (8 + 1 % 25, 8 + (1 / 25) % 25)
    for (y <- 0 until 4; x <- 0 until 4; c <- 0 until 3) {
      val sx = x * w / 4; val sy = y * h / 4
      val want = Math.floorMod(1L + sx + sy + 85L * c, 256L)
      assert((resized.pixels((y * 4 + x) * 3 + c) & 0xff) == want)
    }
    // composes with decode
    val decoded = Multimodal.decodeImages(spark,
      Multimodal.resizeImages(spark, media(), 4, 4).toDF()).collect()
    assert(decoded.length == 2 && decoded.forall(f => f.width == 4 && f.height == 4))
  }

  test("Wav codec round-trips and rejects malformed payloads") {
    val samples = Array[Short](0, 1, -1, 32767, -32768, 12345)
    val bytes = Multimodal.Wav.encode(22050, 2, samples)
    val back = Multimodal.Wav.decode(bytes)
    assert(back.sampleRate == 22050 && back.channels == 2)
    assert(back.samples.toSeq == samples.toSeq)
    // unknown chunk before data is skipped (odd size → pad byte)
    val junk = "LIST".getBytes("US-ASCII") ++ Array[Byte](3, 0, 0, 0, 9, 9, 9, 0)
    val reordered = bytes.take(36) ++ junk ++ bytes.drop(36)
    assert(Multimodal.Wav.decode(reordered).samples.toSeq == samples.toSeq)
    intercept[IllegalArgumentException] {
      Multimodal.Wav.decode("not a wav at all".getBytes("US-ASCII"))
    }
    intercept[IllegalArgumentException] {
      Multimodal.Wav.decode(bytes.dropRight(3)) // truncated raster
    }
  }

  test("decodeAudio: real WAV parse matches the generator closed form") {
    val ids = Seq(0L, 1L, 7L, 24L).toDF("doc_id")
    val audio = Multimodal.syntheticWavTable(spark, ids, "doc_id").toDF()
    val out = Multimodal.decodeAudio(spark, audio).collect()
      .map(a => a.media_id -> a).toMap
    assert(out.keySet == Set(0L, 1L, 7L, 24L))
    for (id <- Seq(0L, 1L, 7L, 24L)) {
      val a = out(id)
      val rates = Array(8000, 16000, 22050, 44100, 48000)
      assert(a.sample_rate == rates((id % 5).toInt))
      assert(a.channels == 1 + (id % 2).toInt)
      val frames = 500 + (31 * id) % 1500
      assert(a.n_frames == frames)
      assert(a.duration_ms == frames * 1000 / a.sample_rate)
      // recompute the moments straight from the closed form
      val total = (frames * a.channels).toInt
      val vals = (0 until total).map(j =>
        Math.floorMod(id + 7919L * j, 65536L) - 32768L)
      assert(a.sum_amp == vals.sum)
      assert(a.sum_sq == vals.map(v => v * v).sum)
    }
  }

  test("decodeImagesLenient quarantines corrupt payloads, decodes the rest") {
    val good = Multimodal.syntheticPpm(1L)
    val rows = Seq(
      (1L, "image", good, Map.empty[String, String]),
      (2L, "image", "NOT A PPM".getBytes("US-ASCII"), Map.empty[String, String]),
      (3L, "image", good.dropRight(5), Map.empty[String, String]))
      .toDF("media_id", "modality", "payload", "meta")
    val (feats, errs) = Multimodal.decodeImagesLenient(spark, rows)
    assert(feats.collect().map(_.media_id).toSet == Set(1L))
    val errMap = errs.collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(errMap.keySet == Set(2L, 3L))
    assert(errMap(2L).contains("not a binary PPM"))
    assert(errMap(3L).contains("truncated"))
    // strict decode on the same frame is job-fatal, as documented
    intercept[org.apache.spark.SparkException] {
      Multimodal.decodeImages(spark, rows).collect()
    }
  }

  test("codecs reject adversarial headers without overflowing") {
    // PPM with a geometry whose w*h*3 overflows Int into a small
    // positive number — must fail the length check, not "succeed"
    val huge = "P6\n65536 65536\n255\n".getBytes("US-ASCII") ++
      Array.fill[Byte](64)(0)
    val e1 = intercept[IllegalArgumentException](Multimodal.Ppm.decode(huge))
    assert(e1.getMessage.contains("truncated PPM raster"))
    // non-numeric geometry is quarantined (not a crash) in lenient mode
    val rows = Seq((7L, "image",
      "P6\nabc def\n255\nxxxx".getBytes("US-ASCII"),
      Map.empty[String, String])).toDF("media_id", "modality", "payload", "meta")
    val (feats, errs) = Multimodal.decodeImagesLenient(spark, rows)
    assert(feats.count() == 0L && errs.count() == 1L)
    // WAV chunk size near Int.MaxValue must not wrap the offset
    val good = Multimodal.Wav.encode(8000, 1, Array[Short](1, 2))
    val evil = good.clone()
    evil(40) = -1; evil(41) = -1; evil(42) = -1; evil(43) = 0x7f // data size = MaxValue-ish
    val e2 = intercept[IllegalArgumentException](Multimodal.Wav.decode(evil))
    assert(e2.getMessage.contains("truncated WAV chunk"))
  }

  test("decodeAudioLenient quarantines non-WAV payloads") {
    val good = Multimodal.syntheticWav(3L)
    val rows = Seq(
      (3L, "audio", good, Map.empty[String, String]),
      (4L, "audio", "junk bytes here!".getBytes("US-ASCII"), Map.empty[String, String]))
      .toDF("media_id", "modality", "payload", "meta")
    val (feats, errs) = Multimodal.decodeAudioLenient(spark, rows)
    assert(feats.collect().map(_.media_id).toSet == Set(3L))
    val err = errs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(err.keySet == Set(4L) && err(4L).contains("RIFF"))
  }

  test("syntheticPpmTable: one decodable image per input id") {
    val tab = Multimodal.syntheticPpmTable(spark,
      Seq(0L, 24L, 25L, 100L).toDF("doc_id"), "doc_id")
    val rows = tab.collect().map(m => m.media_id -> m).toMap
    assert(rows.keySet == Set(0L, 24L, 25L, 100L))
    assert(rows.values.forall(_.modality == "image"))
    val img24 = Ppm.decode(rows(24L).payload)
    assert(img24.width == 8 + 24 && img24.height == 8 + 0)
  }

  test("Y4m codec round-trips and rejects malformed payloads") {
    import Multimodal.Y4m
    val frames = Seq(
      Array.tabulate(2 * 3 * 3)(i => (i * 5).toByte),
      Array.tabulate(2 * 3 * 3)(i => (200 - i).toByte))
    val enc = Y4m.encode(2, 3, 30, 1, frames)
    val v = Y4m.decode(enc)
    assert(v.width == 2 && v.height == 3 && v.fpsNum == 30 && v.fpsDen == 1)
    assert(v.frames.length == 2)
    assert(v.frames(0).toSeq == frames(0).toSeq)
    assert(v.frames(1).toSeq == frames(1).toSeq)
    // unknown header parameters (Xfoo) are legal and skipped
    val withX = new String(enc, java.nio.charset.StandardCharsets.ISO_8859_1)
      .replaceFirst("C444", "Xmeta=1 C444")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(Y4m.decode(withX).frames.length == 2)
    // wrong magic, truncated frame, unsupported colorspace all throw
    intercept[IllegalArgumentException](Y4m.decode("AVI1 junk\n".getBytes))
    intercept[IllegalArgumentException](Y4m.decode(enc.dropRight(1)))
    val c420 = new String(enc, java.nio.charset.StandardCharsets.ISO_8859_1)
      .replaceFirst("C444", "C420")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    intercept[IllegalArgumentException](Y4m.decode(c420))
  }

  test("decodeVideos + sampleVideoFrames: real y4m parse, closed form") {
    val tab = Multimodal.syntheticY4mTable(spark,
      Seq(0L, 7L, 13L).toDF("doc_id"), "doc_id")
    val feats = Multimodal.decodeVideos(spark, tab.toDF(), everyN = 2)
      .collect().map(f => f.media_id -> f).toMap
    for (id <- Seq(0L, 7L, 13L)) {
      val w = 4 + id % 5; val h = 3 + (id / 5) % 4; val nf = 2 + id % 4
      val f = feats(id)
      assert(f.width == w && f.height == h && f.n_frames == nf)
      assert(f.sampled_frames == (nf + 1) / 2)
      val want = (0L until nf by 2).map(fr =>
        (0L until w * h * 3).map(i => (id * 31 + fr * 17 + i * 7) % 251).sum).sum
      assert(f.sampled_sum == want, s"id $id")
    }
    // frame explosion: every 2nd decoded frame, raw plane bytes
    val fr7 = Multimodal.sampleVideoFrames(spark, tab.toDF(), everyN = 2)
      .collect().filter(_.media_id == 7L)
    val nf7 = 2 + 7 % 4 // 5 frames -> sampled 0, 2, 4
    assert(fr7.map(_.frame_index).sorted.toSeq == Seq(0, 2, 4))
    assert(fr7.forall(_.frame_payload.length == (4 + 7 % 5) * (3 + (7 / 5) % 4) * 3))
  }

  test("filterByMeta prunes by metadata without touching payloads") {
    val got = Multimodal.filterByMeta(media(),
      col("meta").getItem("source") === "cam0")
    assert(got.select("media_id").collect().map(_.getLong(0)).toSet == Set(1L, 3L))
  }

  test("repartitionBySizeBytes keeps all rows") {
    val out = Multimodal.repartitionBySizeBytes(media(), 2)
    assert(out.count() == 3)
    assert(out.rdd.getNumPartitions == 2)
  }
}

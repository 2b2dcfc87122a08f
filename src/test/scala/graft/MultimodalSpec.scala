package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  // fake media: payloads derived from text bytes (deterministic)
  private def media() = {
    val df = Seq(
      (1L, "image", "tiny payload one", Map("source" -> "cam0")),
      (2L, "image", "a considerably longer payload that produces different stats",
        Map("source" -> "cam1")),
      (3L, "video", "0123456789abcdef0123456789", Map("source" -> "cam0")))
      .toDF("id", "modality", "body", "meta")
      .withColumn("payload", col("body").cast("binary"))
    df.select(col("id").as("media_id"), col("modality"),
      col("payload"), col("meta"))
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

  test("decodeImages: deterministic stub features, one row per image") {
    val feats = Multimodal.decodeImages(spark, media()).collect()
      .map(f => f.media_id -> f).toMap
    assert(feats.keySet == Set(1L, 2L)) // video row excluded
    val f1a = feats(1L)
    val again = Multimodal.decodeImages(spark, media()).collect()
      .map(f => f.media_id -> f).toMap
    assert(f1a.width == again(1L).width && f1a.embedding.toSeq == again(1L).embedding.toSeq)
    assert(f1a.width >= 64 && f1a.height >= 64 && f1a.channels == 3)
    // unit-norm fake embedding
    val n = math.sqrt(f1a.embedding.map(x => x.toDouble * x).sum)
    assert(math.abs(n - 1.0) < 1e-3)
  }

  test("sampleFrames explodes video payloads into indexed frame rows") {
    val frames = Multimodal.sampleFrames(spark, media(), strideBytes = 10)
      .collect().sortBy(_.frame_index)
    assert(frames.forall(_.media_id == 3L))
    assert(frames.length == 3) // 26 bytes / 10 → 10,10,6
    assert(frames.map(_.frame_index).toSeq == Seq(0, 1, 2))
    assert(frames.map(_.frame_payload.length).toSeq == Seq(10, 10, 6))
  }

  test("resizeImages: payload-in/payload-out, schema closed, meta tagged") {
    val out = Multimodal.resizeImages(spark, media(), 256, 256).collect()
      .map(m => m.media_id -> m).toMap
    assert(out.keySet == Set(1L, 2L)) // video row excluded
    assert(out(1L).meta("resized") == "256x256")
    assert(out(1L).payload.length == 256 * 256 * 3 / 1024)
    // deterministic + composes with decode
    val again = Multimodal.resizeImages(spark, media(), 256, 256).collect()
      .map(m => m.media_id -> m).toMap
    assert(out(1L).payload.toSeq == again(1L).payload.toSeq)
    val decoded = Multimodal.decodeImages(spark,
      Multimodal.resizeImages(spark, media(), 256, 256).toDF()).collect()
    assert(decoded.length == 2)
  }

  test("decodeAudio: deterministic stub rate/duration/features") {
    val audio = media().withColumn("modality", lit("audio"))
    val out = Multimodal.decodeAudio(spark, audio).collect()
      .map(a => a.media_id -> a).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    val a1 = out(1L)
    assert(Set(8000, 16000, 22050, 44100, 48000).contains(a1.sample_rate))
    assert(a1.n_samples == "tiny payload one".length / 2)
    assert(a1.duration_ms == a1.n_samples * 1000 / a1.sample_rate)
    assert(a1.mfccish.length == 13)
    val n = math.sqrt(a1.mfccish.map(x => x.toDouble * x).sum)
    assert(math.abs(n - 1.0) < 1e-3)
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

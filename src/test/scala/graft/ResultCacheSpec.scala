package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.sources.ResultCache

/** Pins [[ResultCache]]: hit on unchanged manifest, recompute on any
  * content change, crash-safe key ordering, answer invisibility. */
class ResultCacheSpec extends SparkTestBase {
  import spark.implicits._

  private def corpus(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "text", "source")

  private def profile(df: org.apache.spark.sql.DataFrame) =
    df.groupBy(col("source")).agg(count(lit(1)).as("n"))

  test("hit on unchanged manifest; recompute on change; answers equal") {
    val dir = java.nio.file.Files.createTempDirectory("graft-rc").toString
    val v1 = corpus((1L, "aaa", "A"), (2L, "bbb", "B"))
    var computes = 0
    def run(df: org.apache.spark.sql.DataFrame) =
      ResultCache.serveOrComputeWithStatus(spark, dir,
        Dedup.contentManifest(df, "text", "source")) {
        computes += 1; profile(df)
      }
    val (r1, hit1) = run(v1)
    assert(!hit1 && computes == 1)
    // unchanged input, different partitioning: served from cache
    val (r2, hit2) = run(v1.repartition(3))
    assert(hit2 && computes == 1)
    assert(r1.collect().toSet == r2.collect().toSet)
    // one character changes → manifest moves → recompute
    val v2 = corpus((1L, "aax", "A"), (2L, "bbb", "B"))
    val (r3, hit3) = run(v2)
    assert(!hit3 && computes == 2)
    assert(r3.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      == Map("A" -> 1L, "B" -> 1L))
    // and the new result is now the cached one
    val (_, hit4) = run(v2)
    assert(hit4 && computes == 2)
  }

  test("old key is retracted BEFORE recompute: a crash mid-write can't serve stale") {
    val dir = java.nio.file.Files.createTempDirectory("graft-rc3").toString
    val v1 = corpus((1L, "aaa", "A"))
    def manifest(df: org.apache.spark.sql.DataFrame) =
      Dedup.contentManifest(df, "text", "source")
    ResultCache.serveOrCompute(spark, dir, manifest(v1))(profile(v1))
    val keyPath = java.nio.file.Paths.get(dir, "_manifest_digest")
    assert(java.nio.file.Files.exists(keyPath))
    // simulate a crash DURING the result overwrite for a changed input:
    // compute throws after the old key must already be gone
    val v2 = corpus((1L, "bbb", "A"))
    intercept[RuntimeException] {
      ResultCache.serveOrCompute(spark, dir, manifest(v2)) {
        assert(!java.nio.file.Files.exists(keyPath),
          "old key must be retracted before the result is touched")
        throw new RuntimeException("crash mid-compute")
      }
    }
    // after the crash the cache self-heals: the old manifest is a MISS
    // (its key was retracted — it can never point at a torn result)
    var recomputed = false
    ResultCache.serveOrComputeWithStatus(spark, dir, manifest(v1)) {
      recomputed = true; profile(v1)
    } match { case (_, hit) => assert(!hit && recomputed) }
  }

  test("a hit requires a committed result: missing _SUCCESS forces recompute") {
    val dir = java.nio.file.Files.createTempDirectory("graft-rc4").toString
    val v1 = corpus((1L, "aaa", "A"))
    val m = Dedup.contentManifest(v1, "text", "source")
    ResultCache.serveOrCompute(spark, dir, m)(profile(v1))
    val success = java.nio.file.Paths.get(dir, "result", "_SUCCESS")
    assert(java.nio.file.Files.exists(success))
    java.nio.file.Files.delete(success) // torn/uncommitted result dir
    val (_, hit) = ResultCache.serveOrComputeWithStatus(spark, dir, m) {
      profile(v1)
    }
    assert(!hit, "an uncommitted result dir must never be served")
  }

  test("a doc moving between sources invalidates even at equal totals") {
    val dir = java.nio.file.Files.createTempDirectory("graft-rc2").toString
    val v1 = corpus((1L, "aaa", "A"), (2L, "bbb", "B"))
    val v2 = corpus((1L, "aaa", "B"), (2L, "bbb", "A"))
    var computes = 0
    def run(df: org.apache.spark.sql.DataFrame) =
      ResultCache.serveOrComputeWithStatus(spark, dir,
        Dedup.contentManifest(df, "text", "source")) {
        computes += 1; profile(df)
      }
    run(v1)
    val (_, hit) = run(v2)
    assert(!hit && computes == 2, "per-group digests see the swap")
  }
}

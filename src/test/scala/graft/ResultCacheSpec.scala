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

package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Manifest-keyed result cache — incremental recompute avoidance: a
  * persisted query result is served as long as the INPUT's content
  * manifest ([[graft.operators.Dedup.contentManifest]] or any frame
  * whose rows change iff the input changes) is byte-identical to the
  * one the result was computed from. The nightly-pipeline pattern: a
  * 100 TB aggregation whose inputs didn't move since yesterday costs
  * one manifest SCAN (group counts + commutative digests), not a
  * recompute — and a moved input invalidates automatically, no TTL
  * guesswork.
  *
  * The manifest frame is collected to build the cache key: one row
  * per group (sources / shards / date partitions — human-scale by
  * construction), the documented bounded-collect idiom. Rows are
  * canonically ordered before digesting so partitioning can't change
  * the key. Correctness contract: serve-from-cache is
  * indistinguishable from recompute (the driver query shares its
  * uncached twin's oracle).
  */
object ResultCache {

  /** [[serveOrCompute]] plus whether this call was a cache hit. */
  def serveOrComputeWithStatus(spark: SparkSession, cacheDir: String,
      manifest: DataFrame)(compute: => DataFrame): (DataFrame, Boolean) = {
    val key = manifestKey(manifest)
    val keyPath = Paths.get(cacheDir, "_manifest_digest")
    val resultPath = s"$cacheDir/result"
    // a hit requires the key AND a committed result (_SUCCESS marker):
    // a partially-written result dir can never be served
    val hit = Files.exists(keyPath) &&
      new String(Files.readAllBytes(keyPath), StandardCharsets.UTF_8) == key &&
      Files.exists(Paths.get(resultPath, "_SUCCESS"))
    if (hit) (spark.read.parquet(resultPath), true)
    else {
      Files.createDirectories(Paths.get(cacheDir))
      // retract the OLD key BEFORE touching the result: a crash while
      // overwriting can otherwise leave the old key pointing at a new
      // (possibly half-written) result, which a later manifest flap back
      // to the old digest would then serve as a false hit
      Files.deleteIfExists(keyPath)
      compute.write.mode("overwrite").parquet(resultPath)
      // key written AFTER the result commits: a crash between the two
      // leaves the key absent, never a key pointing at a torn result
      Files.write(keyPath, key.getBytes(StandardCharsets.UTF_8))
      (spark.read.parquet(resultPath), false)
    }
  }

  /** Serve the cached result when the manifest is unchanged, else
    * recompute, persist, and re-key. */
  def serveOrCompute(spark: SparkSession, cacheDir: String,
      manifest: DataFrame)(compute: => DataFrame): DataFrame =
    serveOrComputeWithStatus(spark, cacheDir, manifest)(compute)._1

  /** Canonical digest of a manifest frame: rows stringified, sorted,
    * md5'd — a pure function of the manifest's CONTENT (partitioning
    * and row order cannot move it). */
  private[graft] def manifestKey(manifest: DataFrame): String = {
    val rows = manifest.collect()
      .map(_.toSeq.map(String.valueOf).mkString("\u0001"))
      .sorted
    val md = java.security.MessageDigest.getInstance("MD5")
    rows.foreach { r =>
      // row separator: concatenation cannot alias across rows
      md.update(r.getBytes(StandardCharsets.UTF_8)); md.update(2.toByte)
    }
    md.digest().map("%02x".format(_)).mkString
  }
}

package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Sampling

/** Trainer-facing corpus export: write a document set as N
  * deterministic shards (`shard=K/` parquet dirs), the layout a data
  * loader consumes round-robin. Shard membership is content-addressed
  * ([[Sampling.shardColumn]]) — independent of cluster size, input
  * partitioning, and Spark version — so re-exports are reproducible
  * and shards can be diffed across pipeline revisions.
  *
  * Scale shape: one repartition ON THE SHARD KEY routes each shard to
  * one task → one file per shard dir (no tiny-file explosion, no
  * post-hoc merge job). Hash sharding is uniform, so tasks balance;
  * for shards larger than a comfortable single file, set
  * `maxRecordsPerFile` and the task splits its output without an
  * extra shuffle.
  */
object CorpusSink {

  /** Write `df` as `nShards` parquet shards under `dir`.
    * @param maxRecordsPerFile 0 = one file per shard; >0 lets a task
    *   roll over to multiple files inside its shard dir. */
  def writeSharded(df: DataFrame, idCol: String, dir: String,
      nShards: Int, seed: Int = 42, maxRecordsPerFile: Long = 0L): Unit =
    df.withColumn("shard", Sampling.shardColumn(col(idCol), nShards, seed))
      .repartition(nShards, col("shard"))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("shard")
      .parquet(dir)

  /** Read a sharded export back (shard dirs become a `shard` column). */
  def readSharded(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame =
    spark.read.parquet(dir)

  /** Corpus → JSON lines (the interchange format training corpora
    * ship in). One JSON object per document; UTF-8 throughout, so
    * non-ASCII text round-trips byte-exact (oracle-gated via per-doc
    * content hashes in `docs_jsonl_roundtrip`). */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** JSONL corpus reader with a PINNED schema — no inference pass over
    * the input (at 100 TB, schema inference is a full extra scan). */
  def readJsonl(spark: org.apache.spark.sql.SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Corpus → ORC (the other columnar interchange format large
    * warehouses hand over; zlib-compressed by Spark's default). Like
    * the parquet path it is splittable, predicate-pushdown-capable,
    * and column-pruned at scan — a 100 TB hand-off loses nothing by
    * arriving as ORC (oracle-gated byte-exact via per-doc content
    * hashes in `docs_orc_roundtrip`). */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** ORC corpus reader with a PINNED schema, mirroring [[readJsonl]]:
    * the schema contract is the caller's, not the file footer's, so a
    * producer-side column rename fails loudly at read instead of
    * silently nulling downstream. */
  def readOrc(spark: org.apache.spark.sql.SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).orc(path)
}

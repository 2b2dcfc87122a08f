package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sources for the canonical event stream — the engine's one data-plane
  * input (`fact STRING, ts TIMESTAMP, value LONG,
  * categories MAP<STRING,STRING>`), replacing the reference's JDBC-only
  * ingestion (`postgres/update.clj:83-93`) with Spark's source surface:
  * parquet / JSON / CSV batch readers, the same formats as bounded
  * streams, and an adapter that maps ARBITRARY wide tables (one column
  * per dimension — e.g. the driver's `events` table) into the canonical
  * shape.
  *
  * Scale posture: every reader applies an EXPLICIT schema — no
  * inference pass over 100 TB — and the adapter keeps derived-timestamp
  * conversions ABOVE any range predicate so scan pushdown still sees
  * the raw stored column (see `EventQueries.eventsRanged`).
  */
object EventSource {

  /** Schema-adaptive reader for the driver's wide `events` table. The
    * fixture's `ts` physical type has varied across driver rounds:
    * TIMESTAMP(NANOS) (read as a nanos BIGINT under an explicit
    * schema — see [[adaptiveSchema]]), naive TIMESTAMP(MICROS)
    * (TIMESTAMP_NTZ to Spark), or a tz-adjusted TIMESTAMP_LTZ. All
    * encode UTC instants; normalize to a session-tz TIMESTAMP (sessions
    * here pin UTC) so every downstream operator sees one type. An
    * optional [loSec, hiSec) epoch-second range is expressed on the RAW
    * stored column in its native type so it reaches the parquet reader
    * as PushedFilters (row-group pruning) — a predicate above the type
    * conversion would be opaque to pushdown, and at 100 TB an unpruned
    * time-range scan is the dominant cost. */
  def wideEvents(spark: SparkSession, dir: String,
      range: Option[(Long, Long)] = None): DataFrame = {
    val path = s"$dir/events.parquet"
    // Explicit schema on the CALLER's session: the frame keeps the
    // caller's temp views / routing rule / runtime conf (a cloned
    // session would silently lose all three), no global conf is
    // mutated, and the one footer resolution replaces inference.
    val raw = spark.read.schema(adaptiveSchema(spark, path)).parquet(path)
    val ranged = range match {
      case None => raw
      case Some((loSec, hiSec)) =>
        raw.where(rawTsPredicate(raw.schema("ts").dataType, loSec, hiSec))
    }
    normalizeEventTs(ranged)
  }

  /** Schema of the parquet at `path`, resolved WITHOUT mutating any
    * session conf. Spark's automatic schema conversion rejects
    * INT64 (TIMESTAMP(NANOS)) unless the legacy `nanosAsLong` session
    * conf is on — but the conf is only consulted during conversion:
    * the column DECODES fine as a plain LongType under an explicit
    * user schema. So: try the caller's session; on the
    * nanos-rejection error, resolve once more through a throwaway
    * conf-isolated clone (`newSession` shares the SparkContext but
    * owns its SQL conf) that maps the nanos column to LongType. The
    * clone is driver-side schema plumbing only — no DataFrame built
    * on it ever escapes, so the caller's temp views, optimizer rules,
    * and runtime conf are never bypassed, and the caller's session is
    * never mutated. */
  def adaptiveSchema(spark: SparkSession, path: String): StructType =
    try spark.read.parquet(path).schema
    catch {
      case e: org.apache.spark.sql.AnalysisException
          if e.getMessage.contains("Illegal Parquet type") =>
        val reader = spark.newSession()
        reader.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        reader.read.parquet(path).schema
    }

  /** [loSec, hiSec) bounds on the raw `ts` column in its stored type —
    * pushdown-visible (literal vs column, no cast on the column side). */
  private def rawTsPredicate(dt: DataType, loSec: Long, hiSec: Long): Column =
    dt match {
      case LongType => // TIMESTAMP(NANOS) surfaced as a nanos BIGINT
        col("ts") >= lit(loSec * 1000000000L) &&
          col("ts") < lit(hiSec * 1000000000L)
      case TimestampNTZType => // naive µs wall clock, UTC by convention
        col("ts") >= lit(java.time.LocalDateTime
            .ofEpochSecond(loSec, 0, java.time.ZoneOffset.UTC)) &&
          col("ts") < lit(java.time.LocalDateTime
            .ofEpochSecond(hiSec, 0, java.time.ZoneOffset.UTC))
      case _ =>
        col("ts") >= timestamp_seconds(lit(loSec)) &&
          col("ts") < timestamp_seconds(lit(hiSec))
    }

  /** Normalize a wide event frame's `ts` to TIMESTAMP. Pure column
    * ops — works on batch and streaming frames alike. NTZ→LTZ cast
    * interprets the wall clock in the session tz (pinned UTC), which is
    * exactly the fixture's convention. */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }

  /** The canonical event schema (SURVEY §1.1 Event). */
  val schema: StructType = StructType(Seq(
    StructField("fact", StringType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("value", LongType, nullable = false),
    StructField("categories",
      MapType(StringType, StringType, valueContainsNull = true))))

  /** Project/validate an arbitrary frame into the canonical schema
    * (column order + types normalized; extra columns dropped). */
  def validated(df: DataFrame): DataFrame = {
    val missing = schema.fieldNames.filterNot(df.columns.contains)
    require(missing.isEmpty,
      s"event frame is missing canonical columns: ${missing.mkString(", ")}")
    df.select(col("fact").cast(StringType), col("ts").cast(TimestampType),
      col("value").cast(LongType),
      col("categories").cast(schema("categories").dataType))
  }

  def parquet(spark: SparkSession, path: String): DataFrame =
    validated(spark.read.parquet(path))

  /** JSON lines with the canonical schema (categories as a JSON object). */
  def json(spark: SparkSession, path: String): DataFrame =
    validated(spark.read.schema(schema).json(path))

  /** Microsecond-precision timestamp format for CSV: Spark's default
    * CSV format carries milliseconds only, which would silently
    * truncate event times on a write/read round-trip. */
  private val csvTsFormat = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"

  /** CSV cannot carry a map column — `categories` rides as a JSON-object
    * string and is parsed on read. Written by [[writeCsv]]. */
  def csv(spark: SparkSession, path: String): DataFrame = {
    val flat = StructType(Seq(
      StructField("fact", StringType), StructField("ts", TimestampType),
      StructField("value", LongType), StructField("categories_json", StringType)))
    validated(spark.read.schema(flat).option("header", "true")
      .option("timestampFormat", csvTsFormat).csv(path)
      .withColumn("categories",
        from_json(col("categories_json"), schema("categories").dataType)))
  }

  /** Canonical events → CSV (categories serialized to a JSON string). */
  def writeCsv(events: DataFrame, path: String): Unit =
    validated(events)
      .withColumn("categories_json", to_json(col("categories")))
      .drop("categories")
      .write.mode("overwrite").option("header", "true")
      .option("timestampFormat", csvTsFormat).csv(path)

  /** Canonical events → JSON lines. The same microsecond-explicit
    * timestamp format as CSV: Spark's default JSON format carries
    * milliseconds only, which would silently truncate event times on
    * a write/read round-trip (the reader's lenient ISO fallback parses
    * the six-digit fraction back losslessly). */
  def writeJson(events: DataFrame, path: String): Unit =
    validated(events)
      .write.mode("overwrite")
      .option("timestampFormat", csvTsFormat).json(path)

  /** The same path as a file STREAM (for
    * [[graft.streaming.StreamingIngest]] writers): explicit schema, one
    * of `parquet` / `json`. New files under `path` become micro-batches. */
  def stream(spark: SparkSession, path: String,
      format: String = "parquet"): DataFrame =
    validated(spark.readStream.schema(schema).format(format).load(path))

  /** Adapt a WIDE table (one column per dimension) into canonical
    * events — the driver's `events.parquet` shape, and the reference's
    * `new-fact!` call shape (`categories` built from named columns).
    *
    * @param factId  fact id literal stamped on every row
    * @param tsCol   timestamp column (or expression) of the source
    * @param valueCol value column (or expression), cast to LONG
    * @param dims    source columns that become `categories` entries,
    *                keyed by their (aliased) names; values cast to string
    */
  /** Write a bucketed (and per-bucket sorted) table — the co-located
    * storage layout for repeated large-×-large joins on `bucketCol`.
    * Both sides of a join written with the SAME bucket count
    * sort-merge-join with NO exchange on either side: at 100 TB the
    * join's shuffle (the dominant cost of the naive plan) is paid ONCE
    * at layout time and amortized over every subsequent query, which
    * is exactly how a fact table and its per-entity profile should
    * ship. The pre-write `repartition` on the bucket key makes one
    * file per bucket, which is what lets the reader trust per-file
    * sort order.
    *
    * Bucketing metadata lives in the session catalog (`saveAsTable`);
    * `path` makes it an external table so the data outlives the
    * session and lands where the caller owns storage. */
  def writeBucketed(df: DataFrame, table: String, path: String,
      bucketCol: String, nBuckets: Int): Unit =
    df.repartition(nBuckets, org.apache.spark.sql.functions.col(bucketCol))
      .write.mode("overwrite")
      .option("path", path)
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  def fromWide(df: DataFrame, factId: String, tsCol: Column, valueCol: Column,
      dims: Map[String, Column]): DataFrame = {
    val entries = dims.toSeq.sortBy(_._1).flatMap { case (k, c) =>
      Seq(lit(k), c.cast(StringType))
    }
    df.select(lit(factId).as("fact"), tsCol.cast(TimestampType).as("ts"),
      valueCol.cast(LongType).as("value"),
      map(entries: _*).as("categories"))
  }
}

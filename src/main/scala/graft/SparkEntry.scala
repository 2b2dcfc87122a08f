package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{DocumentQueries, EmbeddingQueries, EventQueries, RelationalQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every operator-bearing query module; each entry
  * has (where SQL-expressible) a DuckDB oracle in [[oracleSql]] with
  * IDENTICAL column names — the driver's compare sorts columns by name
  * and hashes values.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The full reference pipeline: route → scan → hourly collapse →
    * zero-filled finish-exclusive calendar grid (SURVEY §7.3). */
  def entry(spark: SparkSession): DataFrame =
    EventQueries.queries("ts_counter_hour_fill")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    EventQueries.queries ++ RelationalQueries.queries ++
      DocumentQueries.queries ++ EmbeddingQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    EventQueries.oracleSql ++ RelationalQueries.oracleSql ++
      DocumentQueries.oracleSql ++ EmbeddingQueries.oracleSql

  /** Two-phase (build, read) forms of the lifecycle queries — the
    * BENCH surface: [[Bench]] reports `<name>__build` / `<name>__read`
    * beside the combined timing so a serving regression can't hide
    * inside ingest/expire/erase build noise. Correctness still gates
    * the combined `queries` entries (identical: build(); read()). */
  def lifecycleSplits
      : Map[String, (SparkSession, String) => (() => Unit, () => DataFrame)] =
    EventQueries.lifecycleSplits ++ RelationalQueries.lifecycleSplits ++
      DocumentQueries.lifecycleSplits ++ EmbeddingQueries.lifecycleSplits

  /** Plan-capture probes for [[PlanDump]] (tooling only, never run by
    * the driver): internal frames of multi-job queries, so optimization
    * rounds can commit checkable `.explain("formatted")` evidence for
    * work that a declared query's final plan can't show. */
  def planProbes: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.planProbes ++ EmbeddingQueries.planProbes
}

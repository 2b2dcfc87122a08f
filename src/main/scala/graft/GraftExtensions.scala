package graft

import org.apache.spark.sql.SparkSessionExtensions

/** The engine's single `SparkSessionExtensions` entry point: configure
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `SparkSession.builder.withExtensions(new GraftExtensions)`) to get
  * everything the engine injects into arbitrary user sessions:
  *
  *  - the `graft_dot` native dot-product function
  *    ([[graft.functions.DotProduct]]);
  *  - the transparent rollup-routing optimizer rule
  *    ([[graft.plans.RollupRouting]] — inert until a rollup is
  *    registered for the session, and self-disabling outside UTC).
  *
  * The per-concern classes (`graft.functions.GraftExtensions`,
  * `graft.plans.GraftExtensions`) remain for granular installs.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    new graft.functions.GraftExtensions()(ext)
    new graft.plans.GraftExtensions()(ext)
  }
}

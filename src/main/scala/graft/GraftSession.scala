package graft

import org.apache.spark.sql.SparkSession

/** One-call session setup for the library — everything a reference user
  * needs when switching: the Catalyst extensions (Loki pushdown rule,
  * TopKPerKey strategy, SQL-callable native expressions), the UTC
  * session timezone the oracle/date semantics assume, and the corpus
  * parquet-reading contract ([[Tables.readerConfs]] — set at
  * construction so even reads issued before the first Tables call see
  * one timestamp surface).
  *
  * ```scala
  * val spark = GraftSession.builder().master("local[8]").getOrCreate()
  * // or decorate an existing builder:
  * val spark2 = GraftSession.configure(SparkSession.builder()).getOrCreate()
  * ```
  *
  * Deliberately NOT set here: shuffle partitions, AQE, memory — cluster
  * sizing belongs to the deployment, not the library (the bundled mains
  * size them for the local harness).
  */
object GraftSession {

  /** Apply the library's session configuration to any builder. */
  def configure(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.extensions", "graft.plans.GraftExtensions")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
  // NOT set here: spark.sql.optimizer.excludedRules
  // (InferFiltersFromGenerate — see Tables.readerConfs). A static
  // builder .config would CLOBBER a deployment's own excluded-rules
  // list; the library instead MERGES the exclusion into the runtime
  // conf at every table load (readerConfs), which runs before any
  // graft query plans.

  /** A fresh pre-configured builder. */
  def builder(): SparkSession.Builder = configure(SparkSession.builder())
}

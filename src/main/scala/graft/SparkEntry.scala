package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every operator family's `entries` (name, query, oracle SQL):
  *   - [[operators.LogOps]]  — Loki-parity scan/filter/pushdown surface (§2.1/2.2)
  *   - [[operators.RelOps]]  — host-engine relational surface (§2.3)
  */
object SparkEntry {

  private def allEntries: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] =
    LogOps.entries ++ RelOps.entries ++ DedupOps.entries ++ SimilarityOps.entries ++
      TextOps.entries ++ MultimodalOps.entries ++ ConnectorOps.entries ++
      StreamOps.entries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The README query shape: label AND line AND timestamp AND limit
    * (reference README.md:30-38).
    */
  def entry(spark: SparkSession): DataFrame =
    queries("loki_readme_conjunction")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allEntries.map { case (n, q, _) => n -> q }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    allEntries.collect { case (n, _, Some(sql)) => n -> sql }.toMap
}

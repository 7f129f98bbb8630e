package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver parquet corpus (TESTDATA.md) and the Loki-shaped
  * log view derived from `events` (FIXTURES.md §2), mirroring the reference
  * log-table schema `timestamp / labels / line`
  * (reference/datafusion-loki/src/table.rs:14-37).
  */
object Tables {

  // One DataFrame per (session, dir, table): repeated loads would re-list
  // files and re-read parquet footers at every query — measurable across a
  // 60-query gate run, pure waste on a cluster where the catalog caches
  // this for you. DataFrames are immutable, so sharing is safe.
  private val loaded =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, String), DataFrame]

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    loaded.getOrElseUpdate((spark, dir, name),
      spark.read.parquet(s"$dir/$name.parquet"))

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's TimestampType
    * (µs) cannot represent; read it as a ns Long and truncate to µs —
    * the same boundary truncation the reference's connector does for Loki's
    * ns timestamps (SURVEY.md §7.4(b)). `DIV` keeps the arithmetic integral
    * (a double division would lose precision above 2^53).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** The Loki log table emulated over `events`: exactly the reference's
    * three-column schema. `labels` is a real MapType column so the parity
    * queries exercise Spark's map semantics (`element_at` ≙ DataFusion
    * `get_field`, reference src/expr.rs:5-16).
    */
  def lokiView(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir).select(
      col("ts").as("timestamp"),
      map(
        lit("event_type"), col("event_type"),
        lit("user"), col("user_id").cast("string")
      ).as("labels"),
      concat(col("event_type"), lit(" value="), col("value").cast("string"))
        .as("line")
    )

  /** DuckDB-side projection of the same log view, used as the FROM clause of
    * oracle SQL. Label predicates filter the underlying columns directly
    * (FIXTURES.md oracle note: DuckDB map semantics differ from Spark's).
    */
  val lokiOracleFrom: String =
    """(SELECT ts AS "timestamp",
       |        event_type,
       |        CAST(user_id AS VARCHAR) AS user_label,
       |        concat(event_type, ' value=', CAST(value AS VARCHAR)) AS line
       | FROM events) loki""".stripMargin
}

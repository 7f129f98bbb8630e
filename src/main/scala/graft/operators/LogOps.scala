package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Loki-parity query surface (SURVEY.md §2.1/§2.2) expressed over the
  * log view (`timestamp`, `labels: map<string,string>`, `line`) derived from
  * the `events` table. Each query mirrors a pushdown/filter form the
  * reference supports end-to-end:
  *
  *   - label matchers  =, !=, =~, !~   (reference src/expr.rs:11-47)
  *   - line filters    LIKE / NOT LIKE / ILIKE / regex (src/expr.rs:49-112)
  *   - timestamp bounds, both literal orders (src/expr.rs:114-152)
  *   - projection, LIMIT, conjunctions (src/table.rs:90-156)
  *
  * Results avoid map-typed and timestamp-typed output columns (oracle
  * comparability): timestamps are emitted as `unix_micros` BIGINT and label
  * values as plain strings. Every query is deterministically ordered.
  */
object LogOps {

  type Q = (SparkSession, String) => DataFrame

  private def loki(s: SparkSession, d: String): DataFrame = Tables.lokiView(s, d)

  /** Full-scan projection shared by most parity queries. */
  private def project(df: DataFrame): DataFrame =
    df.select(
      unix_micros(col("timestamp")).as("ts_us"),
      element_at(col("labels"), "event_type").as("label_event_type"),
      element_at(col("labels"), "user").as("label_user"),
      col("line")
    ).orderBy("ts_us", "line")

  private val oracleProject =
    """SELECT epoch_us(ts) AS ts_us,
      |       event_type   AS label_event_type,
      |       CAST(user_id AS VARCHAR) AS label_user,
      |       concat(event_type, ' value=', CAST(value AS VARCHAR)) AS line
      |FROM events""".stripMargin

  val entries: Seq[(String, Q, Option[String])] = Seq(

    // -- scan / projection ---------------------------------------------------
    ("loki_scan_all",
      (s: SparkSession, d: String) => project(loki(s, d)),
      Some(s"$oracleProject ORDER BY ts_us, line")),

    ("loki_projection",
      (s: SparkSession, d: String) =>
        loki(s, d)
          .select(unix_micros(col("timestamp")).as("ts_us"), col("line"))
          .orderBy("ts_us", "line"),
      Some(
        """SELECT epoch_us(ts) AS ts_us,
          |       concat(event_type, ' value=', CAST(value AS VARCHAR)) AS line
          |FROM events ORDER BY ts_us, line""".stripMargin)),

    // -- label matchers ------------------------------------------------------
    ("loki_label_eq",
      (s: SparkSession, d: String) =>
        project(loki(s, d).filter(element_at(col("labels"), "event_type") === "click")),
      Some(s"$oracleProject WHERE event_type = 'click' ORDER BY ts_us, line")),

    ("loki_label_neq",
      (s: SparkSession, d: String) =>
        project(loki(s, d).filter(element_at(col("labels"), "event_type") =!= "click")),
      Some(s"$oracleProject WHERE event_type != 'click' ORDER BY ts_us, line")),

    ("loki_label_regex",
      (s: SparkSession, d: String) =>
        project(loki(s, d).filter(element_at(col("labels"), "event_type").rlike("^(click|view)$"))),
      Some(s"$oracleProject WHERE regexp_matches(event_type, '^(click|view)$$') ORDER BY ts_us, line")),

    ("loki_label_nregex",
      (s: SparkSession, d: String) =>
        project(loki(s, d).filter(!element_at(col("labels"), "event_type").rlike("^(click|view)$"))),
      Some(s"$oracleProject WHERE NOT regexp_matches(event_type, '^(click|view)$$') ORDER BY ts_us, line")),

    // -- line filters --------------------------------------------------------
    ("loki_line_like",
      (s: SparkSession, d: String) =>
        project(loki(s, d).filter(col("line").like("%value=1%"))),
      Some(s"$oracleProject WHERE concat(event_type, ' value=', CAST(value AS VARCHAR)) LIKE '%value=1%' ORDER BY ts_us, line")),

    ("loki_line_not_like",
      (s: SparkSession, d: String) =>
        project(loki(s, d).filter(!col("line").like("%value=1%"))),
      Some(s"$oracleProject WHERE concat(event_type, ' value=', CAST(value AS VARCHAR)) NOT LIKE '%value=1%' ORDER BY ts_us, line")),

    ("loki_line_ilike",
      (s: SparkSession, d: String) =>
        project(loki(s, d).filter(col("line").ilike("%ERROR%"))),
      Some(s"$oracleProject WHERE concat(event_type, ' value=', CAST(value AS VARCHAR)) ILIKE '%ERROR%' ORDER BY ts_us, line")),

    ("loki_line_regex",
      (s: SparkSession, d: String) =>
        project(loki(s, d).filter(col("line").rlike("value=[0-9]{3}\\."))),
      Some(s"$oracleProject WHERE regexp_matches(concat(event_type, ' value=', CAST(value AS VARCHAR)), 'value=[0-9]{3}\\.') ORDER BY ts_us, line")),

    // -- timestamp bounds ----------------------------------------------------
    ("loki_ts_range",
      (s: SparkSession, d: String) =>
        project(loki(s, d).filter(
          col("timestamp") >= lit("2024-01-10 00:00:00").cast("timestamp") &&
          col("timestamp") < lit("2024-01-12 00:00:00").cast("timestamp"))),
      Some(s"$oracleProject WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' AND ts < TIMESTAMP '2024-01-12 00:00:00' ORDER BY ts_us, line")),

    ("loki_ts_flipped",
      // literal-on-left form — reference flips the operator (src/expr.rs:137-146)
      (s: SparkSession, d: String) =>
        project(loki(s, d).filter(
          lit("2024-01-05 00:00:00").cast("timestamp") > col("timestamp"))),
      Some(s"$oracleProject WHERE TIMESTAMP '2024-01-05 00:00:00' > ts ORDER BY ts_us, line")),

    // -- sort + limit (deterministic top-k form of LIMIT pushdown) -----------
    ("loki_topk_limit",
      (s: SparkSession, d: String) =>
        project(loki(s, d)).orderBy(col("ts_us").desc, col("line")).limit(50),
      Some(s"$oracleProject ORDER BY ts_us DESC, line LIMIT 50")),

    // -- README conjunction: label AND line AND ts AND limit (README.md:30-38)
    ("loki_readme_conjunction",
      (s: SparkSession, d: String) =>
        project(
          loki(s, d).filter(
            element_at(col("labels"), "event_type") === "error" &&
            col("line").like("%value=2%") &&
            col("timestamp") > lit("2024-01-03 00:00:00").cast("timestamp"))
        ).limit(20),
      Some(s"""$oracleProject WHERE event_type = 'error'
              |  AND concat(event_type, ' value=', CAST(value AS VARCHAR)) LIKE '%value=2%'
              |  AND ts > TIMESTAMP '2024-01-03 00:00:00'
              |ORDER BY ts_us, line LIMIT 20""".stripMargin)),

    // -- empty result (mirrors reference tests/table.rs:71-77,92-97) ---------
    ("loki_empty",
      (s: SparkSession, d: String) =>
        project(loki(s, d).filter(element_at(col("labels"), "event_type") === "nonexistent")),
      Some(s"$oracleProject WHERE event_type = 'nonexistent' ORDER BY ts_us, line")),

    // -- default-label path: no label matcher, ts-only filter ----------------
    ("loki_default_label",
      (s: SparkSession, d: String) =>
        project(loki(s, d).filter(
          col("timestamp") > lit("2024-01-25 00:00:00").cast("timestamp"))),
      Some(s"$oracleProject WHERE ts > TIMESTAMP '2024-01-25 00:00:00' ORDER BY ts_us, line")),

    // -- INSERT count semantics (README.md:49-53): the count the reference's
    //    LokiLogInsertExec would emit for an INSERT..SELECT of this shape.
    ("loki_insert_count",
      (s: SparkSession, d: String) =>
        loki(s, d)
          .filter(element_at(col("labels"), "event_type") === "signup")
          .agg(count(lit(1)).as("count")),
      Some("SELECT CAST(count(*) AS BIGINT) AS count FROM events WHERE event_type = 'signup'"))
  )
}

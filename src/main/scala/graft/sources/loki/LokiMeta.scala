package graft.sources.loki

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Loki METADATA relations, exposed by [[LokiCatalog]] under the `meta`
  * namespace — beyond-parity (the reference surfaces only the log table;
  * its Loki nevertheless serves these endpoints):
  *
  *   - `loki.meta.labels`        → `GET /loki/api/v1/labels`
  *     one column `label`: the distinct label NAMES in the window
  *   - `loki.meta.label_values`  → `GET /loki/api/v1/label/<l>/values`
  *     columns `(label, value)`: the label→value census
  *   - `loki.meta.series`        → `GET /loki/api/v1/series`
  *     one column `stream`: each stream's canonical selector (sorted
  *     keys, `{k="v", …}`) — SHOW STREAMS; a configured `selector`
  *     narrows via `match[]`
  *
  * The SHOW-style discovery every log user runs before writing a
  * selector, and the same index-backed requests `split=stats` leans on —
  * index-only on a real Loki, so a census over a month of logs never
  * touches chunk data. The window is ALWAYS sent explicitly (real Loki's
  * metadata default is the last 6 h — a silently narrowed census
  * otherwise); it defaults to the scan's own now−30d…now contract and is
  * settable per read:
  *
  * {{{
  *   spark.read
  *     .option("start_ns", "...").option("end_ns", "...")
  *     .table("loki.meta.label_values")
  *     .where($"label" === "app")          // pushed: ONE values request
  * }}}
  *
  * `label = 'x'` / `label IN (...)` predicates are pushed Exact into the
  * request set (no /labels round trip, one /values call per named label);
  * a configured `selector` narrows `label_values` to matching streams via
  * the endpoint's `query` param. Cardinality is metadata-scale (label
  * names × values, not rows), so the scan is a single partition by
  * design — even at 100 TB of logs the census is KB-sized.
  */
case class LokiMetaTable(kind: String, options: LokiOptions)
  extends Table with SupportsRead {

  require(LokiMetaTable.names.contains(kind),
    s"unknown loki meta table: $kind")

  override def name(): String = s"loki.meta.$kind(${options.endpoint})"

  override def schema(): StructType = LokiMetaTable.schemaOf(kind)

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder = {
    val overrides = o.asScala.toMap.filter { case (k, _) =>
      !k.equalsIgnoreCase("endpoint") && !k.equalsIgnoreCase("path") &&
        !k.equalsIgnoreCase("paths") && !k.equalsIgnoreCase("start_ns") &&
        !k.equalsIgnoreCase("end_ns")
    }
    val effective =
      if (overrides.isEmpty) options
      else LokiOptions.from(options.toMap ++ overrides)
    new LokiMetaScanBuilder(kind, effective,
      Option(o.get("start_ns")).map(_.toLong),
      Option(o.get("end_ns")).map(_.toLong))
  }
}

object LokiMetaTable {
  val names: Seq[String] = Seq("labels", "label_values", "series")

  def schemaOf(kind: String): StructType = kind match {
    case "labels" =>
      StructType(Seq(StructField("label", StringType, nullable = false)))
    case "label_values" =>
      StructType(Seq(
        StructField("label", StringType, nullable = false),
        StructField("value", StringType, nullable = false)))
    case "series" =>
      // each stream rendered as its canonical selector — sorted keys,
      // `{k="v", k2="v2"}` — the SHOW STREAMS form a user can paste
      // straight back into a `selector` option or LogQL query
      StructType(Seq(StructField("stream", StringType, nullable = false)))
  }
}

class LokiMetaScanBuilder(
    kind: String,
    options: LokiOptions,
    startNs: Option[Long],
    endNs: Option[Long])
  extends ScanBuilder with SupportsPushDownFilters {

  // `label = 'x'` / `label IN (...)` on label_values → request only those
  // labels' values (Exact: the request set IS the predicate)
  private var labelEq: Option[Seq[String]] = None
  private var pushed: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    if (kind != "label_values") return filters
    val (accepted, residual) = filters.partition {
      case sources.EqualTo("label", _: String) => true
      case sources.In("label", vs) => vs.forall(_.isInstanceOf[String])
      case _ => false
    }
    accepted.foreach {
      case sources.EqualTo("label", v: String) =>
        labelEq = Some(labelEq.getOrElse(Seq(v)).intersect(Seq(v)))
      case sources.In("label", vs) =>
        val set = vs.toSeq.map(_.asInstanceOf[String])
        labelEq = Some(labelEq.fold(set)(_.intersect(set)))
      case _ =>
    }
    pushed = accepted
    residual
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = {
    // same minute-truncated default window as the log scan (its
    // report_statistics contract): stable across the several DSv2 scan
    // rebuilds of one query (case-class equality holds), cache-friendly,
    // and never disagreeing with a log scan planned in the same minute
    val minuteNs = 60L * 1000000000L
    LokiMetaScan(
      kind, options,
      startNs.getOrElse(LokiHttp.thirtyDaysAgoNs / minuteNs * minuteNs),
      endNs.getOrElse((LokiHttp.nowNs + minuteNs - 1) / minuteNs * minuteNs),
      labelEq)
  }
}

case class LokiMetaScan(
    kind: String,
    options: LokiOptions,
    startNs: Long,
    endNs: Long,
    labelEq: Option[Seq[String]])
  extends Scan with Batch {

  override def readSchema(): StructType = LokiMetaTable.schemaOf(kind)

  override def toBatch: Batch = this

  override def description(): String = {
    val parts = Seq(s"endpoint=${options.endpoint}", s"kind=$kind",
      s"start=$startNs", s"end=$endNs") ++
      labelEq.map(ls => s"labels=[${ls.mkString(",")}]") ++
      options.selector.map(s => s"selector=$s")
    s"LokiMetaScan: ${parts.mkString(", ")}"
  }

  override def planInputPartitions(): Array[InputPartition] = {
    // matcher-only render, ALWAYS escaped: the selector option is parsed
    // (escape-decoded) at load, and parse∘assemble is the identity only
    // under the escaping renderer — the log-scan builder applies the
    // same rule to its selector-derived pieces
    val sel = options.selector.map(s =>
      LogQL.assemble(LogQL.parseSelector(s)._1, Nil, escape = true))
      .filter(_ != "{}")
    // real Loki REQUIRES at least one match[] on /series (labels and
    // label-values take their selector optionally); fall back to the
    // default-label matcher exactly like the log scan, else fail at plan
    // time instead of shipping a request the server must reject
    val seriesSel =
      if (kind != "series") sel
      else sel.orElse(options.defaultLabel.map(l =>
        LogQL.assemble(Seq(LogQL.defaultMatcher(l)), Nil, escape = true)))
        .orElse(throw new IllegalArgumentException(
          "loki.meta.series requires a selector: real Loki rejects a " +
            "match[]-less /series request — set the `selector` option " +
            "or configure default_label"))
    Array(LokiMetaPartition(
      options.endpoint, kind, startNs, endNs, labelEq, seriesSel))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    LokiMetaReaderFactory()
}

case class LokiMetaPartition(
    endpoint: String,
    kind: String,
    startNs: Long,
    endNs: Long,
    labelEq: Option[Seq[String]],
    selector: Option[String]) extends InputPartition

case class LokiMetaReaderFactory() extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new LokiMetaReader(p.asInstanceOf[LokiMetaPartition])
}

class LokiMetaReader(p: LokiMetaPartition)
  extends PartitionReader[InternalRow] {

  private lazy val rows: Iterator[InternalRow] = p.kind match {
    case "labels" =>
      LokiHttp.labelNames(p.endpoint, p.startNs, p.endNs).iterator.map(l =>
        new GenericInternalRow(Array[Any](UTF8String.fromString(l))))
    case "label_values" =>
      val labels = p.labelEq.getOrElse(
        LokiHttp.labelNames(p.endpoint, p.startNs, p.endNs))
      labels.iterator.flatMap { l =>
        LokiHttp.labelValues(p.endpoint, l, p.startNs, p.endNs, p.selector)
          .map(v => new GenericInternalRow(Array[Any](
            UTF8String.fromString(l), UTF8String.fromString(v))))
      }
    case "series" =>
      LokiHttp.series(p.endpoint, p.startNs, p.endNs, p.selector)
        .iterator.map { kvs =>
          // the escaping renderer, so the promise holds for ANY label
          // value: the rendered selector re-parses (property-pinned) and
          // real Loki accepts it — raw interpolation broke on values
          // containing a quote/backslash/newline
          val sel = LogQL.assemble(
            kvs.sortBy(_._1).map { case (k, v) => LogQL.LabelMatcher(k, "=", v) },
            Nil, escape = true)
          new GenericInternalRow(Array[Any](UTF8String.fromString(sel)))
        }
  }

  private var cur: InternalRow = _
  override def next(): Boolean =
    if (rows.hasNext) { cur = rows.next(); true } else false
  override def get(): InternalRow = cur
  override def close(): Unit = ()
}

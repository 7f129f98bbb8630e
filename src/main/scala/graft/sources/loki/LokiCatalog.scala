package graft.sources.loki

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Catalog plugin exposing the one Loki log table to pure SQL — the analog
  * of registering `LokiLogTable` into the DataFusion `SessionContext`
  * (reference examples/datafusion.rs:10-18, integration-tests/src/lib.rs:45-56):
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.loki", "graft.sources.loki.LokiCatalog")
  *   spark.conf.set("spark.sql.catalog.loki.endpoint", "http://loki:3100")
  *   spark.conf.set("spark.sql.catalog.loki.default_label", "app")
  *   spark.sql("SELECT * FROM loki.default.loki WHERE labels['app'] = 'x'")
  *   spark.sql("INSERT INTO loki.default.loki VALUES (current_timestamp(), map('app','a'), 'line')")
  * }}}
  *
  * The catalog is read-only structurally (one fixed table named `loki` in
  * namespace `default`); CREATE/ALTER/DROP are rejected, mirroring the
  * reference where the table is constructed from config, not DDL.
  */
class LokiCatalog extends TableCatalog {

  private var catalogName: String = _
  private var opts: Map[String, String] = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    opts = options.asScala.toMap
  }

  override def name(): String = catalogName

  private val ns = Array("default")
  private val metaNs = Array("meta")

  private def isLoki(ident: Identifier): Boolean =
    ident.name().equalsIgnoreCase("loki") &&
      (ident.namespace().isEmpty || ident.namespace().sameElements(ns))

  /** `meta.labels` / `meta.label_values` — the metadata relations
    * ([[LokiMetaTable]]): SHOW-style label discovery over the endpoint's
    * labels / label-values API.
    */
  private def metaKind(ident: Identifier): Option[String] =
    if (ident.namespace().sameElements(metaNs) &&
      LokiMetaTable.names.exists(_.equalsIgnoreCase(ident.name())))
      Some(ident.name().toLowerCase)
    else None

  override def listTables(namespace: Array[String]): Array[Identifier] =
    // honor the namespace argument: the log table lives in `default`,
    // the metadata relations in `meta` — listing either under arbitrary
    // namespaces showed phantom tables to catalog-enumerating tooling
    if (namespace.isEmpty || namespace.sameElements(ns))
      Array(Identifier.of(ns, "loki"))
    else if (namespace.sameElements(metaNs))
      LokiMetaTable.names.map(Identifier.of(metaNs, _)).toArray
    else throw new org.apache.spark.sql.catalyst.analysis
      .NoSuchNamespaceException(namespace)

  override def loadTable(ident: Identifier): Table =
    if (isLoki(ident)) {
      val o = LokiOptions.from(opts)
      // probe like the reference (table.rs:60-73 — once at table
      // CONSTRUCTION), memoized per endpoint: loadTable runs per SQL
      // query during analysis, and an un-memoized probe added a
      // blocking GET (10 s connect timeout) to every query's planning
      if (o.checkConnection) LokiCatalog.probeOnce(o.endpoint)
      LokiTable(o)
    } else metaKind(ident) match {
      case Some(kind) =>
        val o = LokiOptions.from(opts)
        if (o.checkConnection) LokiCatalog.probeOnce(o.endpoint)
        LokiMetaTable(kind, o)
      case None => throw new NoSuchTableException(ident)
    }

  override def tableExists(ident: Identifier): Boolean =
    isLoki(ident) || metaKind(ident).isDefined

  override def createTable(
      ident: Identifier,
      schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table =
    // the loki ident genuinely exists; anything else is unsupported DDL,
    // not "already exists" (the old unconditional AlreadyExists produced
    // a false error message for arbitrary names)
    if (isLoki(ident)) throw new TableAlreadyExistsException(ident)
    else throw new UnsupportedOperationException(
      "the Loki catalog is fixed-schema: CREATE TABLE is not supported")

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("Loki catalog tables are fixed-schema")

  override def dropTable(ident: Identifier): Boolean =
    // returning false for the loki ident made Spark report "table not
    // found" while tableExists says it exists — refuse honestly instead
    if (isLoki(ident)) throw new UnsupportedOperationException(
      "the Loki catalog is fixed-schema: DROP TABLE is not supported")
    else false

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("Loki catalog tables cannot be renamed")
}

object LokiCatalog {
  // per-endpoint one-shot connection probe (JVM-wide): the typo-detection
  // value of checkConnection without per-query planning I/O. A FAILED
  // probe is not cached — a transient outage at first touch must not
  // poison the endpoint for the session's lifetime.
  private val probed = scala.collection.concurrent.TrieMap.empty[String, Boolean]
  private def probeOnce(endpoint: String): Unit =
    if (!probed.contains(endpoint)) {
      LokiHttp.checkConnection(endpoint)
      probed.put(endpoint, true)
      ()
    }
}

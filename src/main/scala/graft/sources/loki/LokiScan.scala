package graft.sources.loki

import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.convert.GroupRecordConverter
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.io.ColumnIOFactory
import org.apache.parquet.schema.MessageType
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.MicroBatchStream
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.vectorized.ColumnarBatch
import org.apache.spark.unsafe.types.UTF8String

/** Scan half of the connector — the rebuild of `LokiLogScanExec`
  * (`src/scan.rs`). Pushdown mirrors `src/table.rs:90-156`:
  *
  *   - required columns → parquet projection (ProjectionMask analog)
  *   - `timestamp` bounds + `line` contains → Exact (omitted from residual)
  *   - limit → Loki `limit` query param
  *   - label / regex predicates arrive pre-captured on [[LokiTable]]
  *
  * Partitioning: 1 InputPartition by default (scan.rs:46); with
  * `partitions=N` the time range splits into N slices, each an independent
  * range query — this is safe because Loki range queries are disjoint-range
  * composable, and is the scale-out story for big windows. A pushed LIMIT
  * forces a single partition (a global limit cannot be sliced).
  */
class LokiScanBuilder(table: LokiTable)
  extends ScanBuilder
  with SupportsPushDownFilters
  with SupportsPushDownRequiredColumns
  with SupportsPushDownLimit
  with SupportsPushDownAggregates {

  private var requiredSchema: StructType =
    LokiDataSource.logSchema(table.options.structuredMetadata)
  private var pushedLines: Seq[LogQL.LineFilter] = Nil
  private var startNs: Option[Long] = None
  private var endNs: Option[Long] = None
  private var limit: Option[Int] = None
  private var pushed: Array[Filter] = Array.empty
  private var countPushed = false

  /** Bare COUNT(*) → one `index/stats` request (see
    * [[LokiOptions.pushCount]]). COMPLETE pushdown only — a partial-agg
    * contract would make Spark re-aggregate rows the source never
    * produces — and only when the selector alone determines the count:
    * no grouping, no line-filter stages (index/stats ignores them; a
    * silent accept would overcount), no LIMIT.
    */
  private def canPushCount(agg: Aggregation): Boolean =
    table.options.pushCount &&
      agg.groupByExpressions.isEmpty &&
      agg.aggregateExpressions.length == 1 &&
      agg.aggregateExpressions()(0).isInstanceOf[CountStar] &&
      pushedLines.isEmpty && table.pushedLineFilters.isEmpty &&
      // parser stages reduce rows below the selector count the same way
      // line filters do — index/stats would overcount
      table.pushedParsedFilters.isEmpty &&
      // a `selector` option carrying line-filter stages also disqualifies:
      // index/stats answers the SELECTOR's count, stages reduce rows below it
      table.options.selector.forall(s => LogQL.parseSelector(s)._2.isEmpty) &&
      limit.isEmpty

  override def supportCompletePushDown(agg: Aggregation): Boolean =
    canPushCount(agg)

  override def pushAggregation(agg: Aggregation): Boolean = {
    countPushed = canPushCount(agg)
    countPushed
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, residual) = filters.partition(f => LogQL.fromSourceFilter(f).isDefined)
    accepted.flatMap(LogQL.fromSourceFilter).foreach {
      // conjunct semantics, default (strict_bounds=true): tightest bound
      // wins — max(start), min(end) — every pushed conjunct is honored.
      // strict_bounds=false is REFERENCE PARITY: last bound of each kind
      // wins (table.rs:106-110), which widens the window when a query
      // repeats a bound and silently returns rows an earlier conjunct
      // excluded under the Exact claim — see LokiOptions.strictBounds.
      case Left(lf) => pushedLines :+= lf
      case Right(LogQL.Start(ns)) =>
        startNs = Some(
          if (table.options.strictBounds) startNs.fold(ns)(math.max(_, ns)) else ns)
      case Right(LogQL.End(ns)) =>
        endNs = Some(
          if (table.options.strictBounds) endNs.fold(ns)(math.min(_, ns)) else ns)
    }
    pushed = accepted
    residual // accepted filters are Exact: Loki fully enforces them
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(required: StructType): Unit = {
    // preserve table column order regardless of the required order
    val names = required.fieldNames.toSet
    requiredSchema = StructType(
      LokiDataSource.logSchema(table.options.structuredMetadata)
        .fields.filter(f => names.contains(f.name)))
  }

  override def pushLimit(n: Int): Boolean = {
    limit = Some(n)
    true // fully applied by Loki (scan.rs:113-115)
  }

  override def build(): Scan = {
    // explicit `selector` option (the streaming pushdown channel — DSv2
    // filter pushdown never reaches micro-batch scans): its matchers and
    // line stages CONJOIN with whatever the optimizer pushed, selector
    // stages first (user-stated order ahead of derived predicates).
    // Selector-derived pieces ALWAYS re-render escaped: the option is
    // parsed (escape-decoded) at load time, and parse∘assemble is the
    // identity only under the escaping renderer (property-pinned) — a
    // raw re-render of a value that needed escaping would put a
    // malformed or semantically different query on the wire despite the
    // "validated at option time" promise. escape_logql keeps governing
    // the OPTIMIZER-pushed pieces (that flag exists for reference
    // parity of derived predicates, not for user-typed LogQL).
    val esc = table.options.escapeLogql
    val (optMatchers, optStages) = table.options.selector
      .map(LogQL.parseSelector).getOrElse((Nil, Nil))
    val matcherParts =
      if (optMatchers.nonEmpty || table.pushedLabelMatchers.nonEmpty)
        optMatchers.map(_.render(escape = true)) ++
          table.pushedLabelMatchers.map(_.render(esc))
      else table.options.defaultLabel match {
        // no matcher at all → default-label fallback, else error
        // (table.rs:116-122: LogQL requires at least one matcher)
        case Some(l) => Seq(LogQL.defaultMatcher(l).render(esc))
        case None => throw new IllegalArgumentException(
          "no label matcher in query and no default_label configured; " +
            "LogQL requires at least one label matcher")
      }
    val lineParts = optStages.map(_.render(escape = true)) ++
      (table.pushedLineFilters ++ pushedLines).map(_.render(esc)) ++
      // parser stages last: line filters are cheaper and LogQL applies
      // stages in order, so filtering lines before parsing them is the
      // shape a human would write (stage values always render escaped —
      // beyond-parity surface, no raw-interpolation parity to keep)
      table.pushedParsedFilters.map(_.render)
    // matcher-only selector for index/stats probes, rendered from the
    // matchers directly — substring-parsing the assembled query to the
    // first '}' truncated mid-selector whenever a pushed value or regex
    // contained a brace (e.g. rlike 'app[0-9]{2}'), making every probe
    // throw and split=stats silently degrade to width
    val selector = matcherParts.mkString("{", ", ", "}")
    val logql = (selector +: lineParts).mkString(" ")
    if (countPushed)
      // complete COUNT(*) pushdown: the scan's read schema IS the
      // aggregation output (one non-null long; Spark consumes it
      // positionally), answered by one index/stats request
      LokiScan(table.options, logql, selector, startNs, endNs, limit,
        StructType(Seq(StructField("count(*)", LongType, nullable = false))),
        countOnly = true)
    else
      LokiScan(table.options, logql, selector, startNs, endNs, limit,
        requiredSchema)
  }
}

case class LokiScan(
    options: LokiOptions,
    logql: String,
    selector: String,
    startNs: Option[Long],
    endNs: Option[Long],
    limit: Option[Int],
    requiredSchema: StructType,
    /** Complete COUNT(*) pushdown: answer from index/stats, no scan. */
    countOnly: Boolean = false)
  extends Scan with Batch with SupportsReportStatistics {

  override def readSchema(): StructType = requiredSchema

  /** Optimizer statistics from index/stats (see
    * [[LokiOptions.reportStatistics]]): row count + an estimated byte
    * size, so Spark's size-based planning — the broadcast-join decision
    * above all — works for log scans like it does for file scans. The
    * probe is one index-only request, memoized like the bounds cache
    * (same minute-rounded default window, so DSv2 Scan rebuilds hit it),
    * invalidated by the same per-endpoint drop. Selector-level numbers:
    * line-filter stages only REDUCE actual rows, so the estimate errs
    * large — the safe direction for a broadcast decision. A failed probe
    * reports unknown (planner keeps its defaults), never fails the query.
    */
  override def estimateStatistics(): Statistics = {
    import java.util.OptionalLong
    def unknown = new Statistics {
      override def sizeInBytes(): OptionalLong = OptionalLong.empty()
      override def numRows(): OptionalLong = OptionalLong.empty()
    }
    if (!options.reportStatistics) return unknown
    if (countOnly) return new Statistics {
      override def sizeInBytes(): OptionalLong = OptionalLong.of(16L)
      override def numRows(): OptionalLong = OptionalLong.of(1L)
    }
    val minuteNs = 60L * 1000000000L
    val s = startNs.getOrElse(LokiHttp.thirtyDaysAgoNs / minuteNs * minuteNs)
    val e = endNs.getOrElse(
      (LokiHttp.nowNs + minuteNs - 1) / minuteNs * minuteNs)
    try {
      val (entries, bytes) =
        LokiScan.cachedStats(options.endpoint, selector, s, e)
      val rows = limit.fold(entries)(l => math.min(entries, l.toLong))
      // bytes is the LINE payload; each row also carries a timestamp and
      // its label map — a fixed per-row floor keeps tiny-line corpora
      // from looking free to broadcast. Computed in BigInt and clamped:
      // bytes × rows overflows int64 on TB-scale selectors (negative or
      // tiny sizeInBytes would flip the broadcast decision the WRONG way)
      val size = {
        val exact =
          (if (entries == 0) BigInt(0)
           else BigInt(bytes) * rows / entries) + BigInt(rows) * 48L
        if (exact > Long.MaxValue) Long.MaxValue else exact.toLong
      }
      new Statistics {
        override def sizeInBytes(): OptionalLong = OptionalLong.of(size)
        override def numRows(): OptionalLong = OptionalLong.of(rows)
      }
    } catch {
      case scala.util.control.NonFatal(ex) =>
        LokiScan.log.warn(
          s"report_statistics probe failed for [$selector] " +
            s"(${ex.getClass.getSimpleName}: ${ex.getMessage}); " +
            "reporting unknown statistics")
        unknown
    }
  }

  override def toBatch: Batch = this

  // EXPLAIN surface, mirroring the reference's DisplayAs (scan.rs:149-175)
  override def description(): String = {
    val parts = Seq(s"endpoint=${options.endpoint}", s"query=$logql") ++
      startNs.map(s => s"start=$s") ++ endNs.map(e => s"end=$e") ++
      limit.map(l => s"limit=$l") ++
      // paged scans disclose their EFFECTIVE page size in EXPLAIN — the
      // same query_limit-or-server_max computation planInputPartitions
      // uses, so a scan that pages only because server_max_entries is
      // declared still says so (a plan claiming a single-request scan
      // that actually pages would break the EXPLAIN-honesty contract);
      // a pushed COUNT never pages — disclosing page_size there would
      // claim a scan that doesn't run
      (if (!countOnly) effectivePageSize.map(p => s"page_size=$p").toSeq
       else Nil) ++
      // explicit direction, disclosed only where it is honored (the
      // single-request path — paged cursors walk forward regardless)
      (if (!countOnly) effectiveDirection.map(d => s"direction=$d").toSeq
       else Nil) ++
      // pushed COUNT(*) discloses its stats-answered shape in EXPLAIN
      (if (countOnly) Seq("count=index/stats") else Nil) ++
      Seq(s"projection=[${requiredSchema.fieldNames.mkString(",")}]")
    s"LokiLogScan: ${parts.mkString(", ")}"
  }

  /** The page size the scan will actually request with: an explicit
    * query_limit wins; otherwise a declared server_max_entries forces
    * paging at the server cap (completeness opt-in); a pushed LIMIT
    * never pages. Shared by EXPLAIN ([[description]]) and
    * [[planInputPartitions]] so the disclosed plan IS the executed one.
    */
  private def effectivePageSize: Option[Int] = {
    val serverMax = Some(options.serverMaxEntries).filter(_ > 0)
    if (limit.isEmpty && options.queryLimit > 0) Some(options.queryLimit)
    else if (limit.isEmpty) serverMax
    else None
  }

  /** The `direction` option where it is honored: the single-request path
    * (which n rows a LIMIT keeps — see [[LokiOptions.direction]]). A
    * paged walk's cursor goes forward by construction, and since paging
    * never coexists with a LIMIT the unlimited row set is
    * direction-independent — log and ignore rather than fail a query the
    * option cannot affect (a catalog table carrying direction=backward
    * as base config must not break its unlimited paged scans). Lazy val:
    * description() (every EXPLAIN render) and each planInputPartitions
    * call (DSv2 rebuilds the scan several times per query) evaluate it —
    * a def would emit the ignored-direction warning once per evaluation.
    */
  @transient private lazy val effectiveDirection: Option[String] =
    options.direction match {
      case some @ Some(d) =>
        if (effectivePageSize.isEmpty) some
        else {
          LokiScan.log.warn(
            s"direction=$d ignored: the scan pages " +
              s"(page_size=${effectivePageSize.get}) and paged cursors walk " +
              "forward; an unlimited scan's row set is direction-independent")
          None
        }
      case None => None
    }

  override def planInputPartitions(): Array[InputPartition] = {
    if (countOnly)
      // one request answers the whole aggregate — nothing to slice
      return Array(LokiInputPartition(
        options.endpoint, selector, startNs, endNs, None, None,
        requiredSchema, countOnly = true))
    val n = if (limit.isDefined) 1 else math.max(options.numPartitions, 1)
    // no pushed LIMIT → page through the window with query_limit-sized
    // forward requests (the real-Loki completeness path: an unlimited
    // single request is truncated at the SERVER's default, silently);
    // query_limit=0 keeps the reference-parity single un-limited request
    val serverMax = Some(options.serverMaxEntries).filter(_ > 0)
    // a pushed LIMIT above the declared server contract would be clamped
    // (middleware) or rejected (real Loki) — fail at planning, loudly,
    // instead of returning a silently short result
    for (m <- serverMax; l <- limit) require(l <= m,
      s"pushed LIMIT $l exceeds server_max_entries $m — the server would " +
        "reject or clamp the request")
    // declaring server_max_entries OPTS INTO completeness: an unlimited
    // single request against a server with a declared max_entries_limit
    // is guaranteed to be clamped on any window bigger than the cap —
    // the silent-truncation trap the option exists to close — so the
    // scan pages at the server max instead of issuing the
    // reference-parity unlimited request. Same computation EXPLAIN
    // discloses ([[effectivePageSize]]) — the disclosed plan IS the
    // executed one.
    val pageSize = effectivePageSize
    if (n == 1) {
      Array(LokiInputPartition(
        options.endpoint, logql, startNs, endNs, limit, pageSize,
        requiredSchema, serverMax, direction = effectiveDirection))
    } else {
      // slice [start, end) into n disjoint ranges; bounds must be concrete
      // at planning time, so defaults are materialized here. The effective
      // partition count is capped at the window width in ns — otherwise a
      // window narrower than n produces slices with start > end that Loki
      // rejects at runtime. Each slice pages independently (disjoint
      // cursors over disjoint windows).
      plannedBounds.map { case (lo, hi) =>
        LokiInputPartition(
          options.endpoint, logql, Some(lo), Some(hi), None, pageSize,
          requiredSchema, serverMax, direction = effectiveDirection)
      }.toArray
    }
  }

  // memoized twice: per-instance (lazy val — Spark calls
  // planInputPartitions more than once per query) AND across instances
  // (LokiScan.boundsCache — DSv2 rebuilds the Scan several times during
  // optimization/execution; SliceSmoke measured ~6 rebuilds × ~63 probes
  // before the shared cache). Keyed on exactly the probe inputs; windows
  // from now()-relative defaults just miss the cache, which is correct.
  @transient private lazy val plannedBounds: Seq[(Long, Long)] = {
    val n = math.max(options.numPartitions, 1)
    // default (now-relative) bounds round to minute granularity — start
    // floor, end ceil, so the window only ever WIDENS (the extra tail is
    // in the future = empty; the extra head is <60 s on a 30-day
    // heuristic window). Without this every DSv2 Scan rebuild of the
    // same query mints fresh ns-exact bounds, the cross-instance bounds
    // cache never hits, and each of the ~6 rebuilds per query re-pays
    // the full plan-time probe sequence against a real endpoint.
    // Pushed explicit bounds stay ns-exact.
    val minuteNs = 60L * 1000000000L
    val s = startNs.getOrElse(LokiHttp.thirtyDaysAgoNs / minuteNs * minuteNs)
    val e = endNs.getOrElse(
      (LokiHttp.nowNs + minuteNs - 1) / minuteNs * minuteNs)
    val eff = math.max(1L, math.min(n.toLong, e - s)).toInt
    if (options.split == "stats") {
      val key = (options.endpoint, logql, s, e, eff)
      LokiScan.cachedBounds(key) match {
        case Some(b) => b
        case None =>
          // probe OUTSIDE the cache lock: statsBounds is a sequence of
          // HTTP GETs (30 s timeout each) — holding a JVM-global lock
          // across it would serialize planning of every other
          // stats-split scan behind one slow/hung endpoint. Concurrent
          // same-key planners may both probe (rare, harmless — last
          // write wins with identical bounds).
          statsBounds(s, e, eff) match {
            case Some(b) =>
              LokiScan.putBounds(key, b); b
            case None =>
              // deliberately NOT cached: a transient index/stats outage
              // must not pin the width fallback for the session — the
              // next plan of this query re-probes and recovers the
              // count-balanced split
              widthBounds(s, e, eff)
          }
      }
    } else widthBounds(s, e, eff)
  }

  private def widthBounds(s: Long, e: Long, eff: Int): Seq[(Long, Long)] = {
    val width = math.max((e - s) / eff, 1L)
    (0 until eff).map { i =>
      val lo = s + i * width
      val hi = if (i == eff - 1) e else s + (i + 1) * width
      (lo, hi)
    }
  }

  /** Count-balanced slice boundaries via plan-time `index/stats` probes
    * (BASELINE.md "Connector time-range split under bursty logs"): equal-
    * WIDTH slicing serializes a bursty corpus through the spike slice
    * (SliceSmoke measured max/mean = 4.0 at 80%-in-one-day skew — a skew
    * AQE cannot touch because it lives inside one partition's HTTP read).
    *
    * Recursive bisection builds a count histogram fine only where the
    * mass is: a [lo, hi) bin splits while its count exceeds target/4
    * (one probe per split — the sibling's count is the difference).
    * Boundaries then land on bin edges at cumulative multiples of
    * total/eff, so each slice carries ≤ target + target/4 rows —
    * max/mean ≤ ~1.25 regardless of burst shape. Probe cost is
    * O(eff · log(window/burst)) index-only GETs, paid once at plan time
    * on the driver. Returns None (→ width fallback) on probe failure or
    * an empty window.
    */
  private def statsBounds(s: Long, e: Long, eff: Int): Option[Seq[(Long, Long)]] = {
    val deadline = System.nanoTime() + options.statsBudgetMs * 1000000L
    try {
      LokiScan.balancedCuts(
        // the ROOT probe (the full [s, e) window) routes through the
        // shared per-(endpoint, selector, window) stats memo that
        // report_statistics also feeds: a stats-split scan of a query
        // the optimizer already sized pays zero extra probes for the
        // total, and vice versa. Bisection sub-probes stay direct —
        // hundreds of one-off sub-window entries would churn the memo's
        // LRU without any second consumer.
        (lo, hi) =>
          if (lo == s && hi == e)
            LokiScan.cachedStats(options.endpoint, selector, lo, hi)._1
          else LokiHttp.indexStats(options.endpoint, selector, lo, hi),
        s, e, eff,
        probeParallelism = options.statsProbeParallelism,
        shouldStop = () => System.nanoTime() > deadline)
    } catch {
      // never swallow interruption: an interrupted planner thread must
      // propagate, not masquerade as a balanced split
      case ie: InterruptedException => throw ie
      case ex @ (_: java.io.IOException | _: RuntimeException) =>
        // width fallback: stats endpoint absent/erroring — say so once,
        // identifiably, so production logs can tell a degraded split
        // from a balanced one
        LokiScan.log.warn(
          s"split=stats probes failed for query [$logql] " +
            s"(${ex.getClass.getSimpleName}: ${ex.getMessage}); " +
            "falling back to equal-width slices")
        None
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    // structured metadata rides the row-based decoder: the columnar
    // readers are hand-specialized to the 3-column wire shape, and the
    // metadata map would be a second repetition-structured column pair
    // for a diagnostics-scale projection (see LokiOptions doc)
    LokiReaderFactory(options.columnar && !options.structuredMetadata)

  /** Partitions for one CONCRETE window [s, e) — the micro-batch path
    * ([[LokiMicroBatchStream]]): width slices only (a per-batch
    * `split=stats` probe sequence would pay plan-time HTTP on every
    * micro-batch for a window that is usually seconds wide), same
    * pageSize/serverMax discipline as the batch path. A pushed LIMIT
    * keeps the single-partition shape exactly like batch.
    */
  private[loki] def partitionsFor(s: Long, e: Long): Array[InputPartition] = {
    val serverMax = Some(options.serverMaxEntries).filter(_ > 0)
    for (m <- serverMax; l <- limit) require(l <= m,
      s"pushed LIMIT $l exceeds server_max_entries $m — the server would " +
        "reject or clamp the request")
    val pageSize = effectivePageSize
    val n = if (limit.isDefined) 1 else math.max(options.numPartitions, 1)
    val eff = math.max(1L, math.min(n.toLong, e - s)).toInt
    if (eff == 1)
      Array(LokiInputPartition(
        options.endpoint, logql, Some(s), Some(e), limit, pageSize,
        requiredSchema, serverMax, direction = effectiveDirection))
    else
      // the batch path's width slicer — ONE slicing arithmetic, so a fix
      // to the batch clamps can never diverge the micro-batch windows
      widthBounds(s, e, eff).map { case (lo, hi) =>
        LokiInputPartition(
          options.endpoint, logql, Some(lo), Some(hi), None, pageSize,
          requiredSchema, serverMax, direction = effectiveDirection)
      }.toArray
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream = {
    require(!countOnly,
      "pushed COUNT(*) cannot stream — push_count applies to batch scans")
    new LokiMicroBatchStream(this)
  }
}

object LokiScan {
  private[loki] val log = org.slf4j.LoggerFactory.getLogger(classOf[LokiScan])

  /** Cross-instance stats-split bounds memo (see plannedBounds). True
    * LRU: a hit re-inserts the key at the back, so a session planning
    * many one-off windows evicts THOSE, not its hot repeated queries.
    * Bounded at 256 entries (eviction is a plan-time re-probe, never a
    * correctness event). Only successful stats placements are stored —
    * width fallbacks from probe failures stay uncached (see
    * plannedBounds).
    */
  /** The pure count-balanced boundary placement behind `split=stats`,
    * parameterized over the count source so LogQLProps can property-test
    * it against synthetic distributions without HTTP. Recursive bisection
    * builds a histogram fine only where the mass is (one probe per
    * split); boundaries land on bin edges at cumulative multiples of
    * total/eff.
    *
    * Invariants (property-tested): the returned slices are a disjoint,
    * strictly-increasing cover of [s, e) regardless of what the count
    * function reports — correctness never depends on the stats, only
    * balance does. Probe budget 64×eff: probe count is O(#clusters ·
    * log(window/cluster_width)) — sharp sub-second bursts in a month-wide
    * window cost ~20 probes each (SliceSmoke measured 462 on a 30-cluster
    * corpus); past the budget the remaining bins stay coarse (balance
    * degrades gracefully toward width-split, never correctness).
    */
  private[graft] def balancedCuts(
      count: (Long, Long) => Long,
      s: Long, e: Long, eff: Int,
      probeParallelism: Int = 1,
      shouldStop: () => Boolean = () => false): Option[Seq[(Long, Long)]] = {
    val total = count(s, e)
    if (total <= 0) return None
    val target = math.max(total / eff, 1L)
    val grain = math.max(target / 4, 1L)
    var probesLeft = 64 * eff
    // bins in time order, refined LEVEL-SYNCHRONOUSLY: every splittable
    // bin's midpoint count is probed as one batch — optionally in
    // parallel, the probes being independent index-only GETs — so
    // plan-time latency against a real endpoint is O(levels × RTT), not
    // O(probes × RTT) (round-8 verdict item 4: 462 serial probes at
    // ~20 ms RTT would be ~9 s of planning). `shouldStop` (the caller's
    // wall-clock budget) is consulted between levels: past it the
    // remaining bins stay coarse — balance degrades gracefully toward
    // width-split, and the placement below never depends on how far
    // refinement got. The result is deterministic in the counts alone —
    // which bins split depends only on their counts, never on probe
    // order or parallelism.
    var bins = Vector((s, e, total, 0))
    var frontier = true
    while (frontier && probesLeft > 0 && !shouldStop()) {
      val work = bins.zipWithIndex.collect {
        case ((lo, hi, cnt, d), i)
            if cnt > grain && hi - lo > 1000L && d < 48 => i
      }.take(probesLeft)
      if (work.isEmpty) frontier = false
      else {
        probesLeft -= work.size
        val mids = probeBatch(
          work.map { i => val b = bins(i); (i, b._1, b._1 + (b._2 - b._1) / 2) },
          count, probeParallelism)
        bins = bins.zipWithIndex.flatMap { case (b @ (lo, hi, cnt, d), i) =>
          mids.get(i) match {
            case Some(cl) =>
              val mid = lo + (hi - lo) / 2
              Vector((lo, mid, cl, d + 1), (mid, hi, cnt - cl, d + 1))
            case None => Vector(b)
          }
        }
      }
    }
    val cuts = Array.newBuilder[Long]
    var acc = 0L
    var i = 1
    bins.foreach { case (_, hi, c, _) =>
      acc += c
      if (i < eff && acc >= i * total / eff && hi < e) {
        cuts += hi
        i += 1
      }
    }
    val edges = (s +: cuts.result().toSeq) :+ e
    // a DEGENERATE placement — one slice where the caller asked for
    // several — can only mean refinement never produced a usable interior
    // edge (budget/stop fired before the first split, or one un-splittable
    // bin). Returning it would be strictly WORSE than the width fallback
    // (a partitions=N scan would serialize through one HTTP request) and
    // plannedBounds would cache the degenerate placement for every
    // subsequent plan of the query; None → uncached width split instead.
    // Partial refinements (≥2 slices) remain usable and cacheable.
    if (eff > 1 && edges.size <= 2) None
    else Some(edges.sliding(2).map { case Seq(lo, hi) => (lo, hi) }.toSeq)
  }

  /** Probe one refinement level's midpoints: (bin index, lo, mid) →
    * count(lo, mid), serial or on a bounded just-for-this-level pool.
    * Probe failures propagate with their original type (ExecutionException
    * unwrapped) so statsBounds's narrow catch sees the real IOException;
    * interruption propagates as InterruptedException from invokeAll.
    */
  private def probeBatch(
      work: Seq[(Int, Long, Long)],
      count: (Long, Long) => Long,
      parallelism: Int): Map[Int, Long] =
    if (parallelism <= 1 || work.size <= 1)
      work.map { case (i, lo, mid) => i -> count(lo, mid) }.toMap
    else {
      val pool = java.util.concurrent.Executors
        .newFixedThreadPool(math.min(parallelism, work.size))
      try {
        import scala.jdk.CollectionConverters._
        val tasks: Seq[java.util.concurrent.Callable[(Int, Long)]] =
          work.map { case (i, lo, mid) =>
            () => i -> count(lo, mid)
          }
        pool.invokeAll(tasks.asJava).asScala.map { f =>
          try f.get()
          catch {
            case ee: java.util.concurrent.ExecutionException =>
              throw Option(ee.getCause).getOrElse(ee)
          }
        }.toMap
      } finally pool.shutdownNow()
    }

  private type BoundsKey = (String, String, Long, Long, Int)
  private[loki] val boundsCache =
    scala.collection.mutable.LinkedHashMap.empty[BoundsKey, Seq[(Long, Long)]]

  private[loki] def cachedBounds(key: BoundsKey): Option[Seq[(Long, Long)]] =
    boundsCache.synchronized {
      boundsCache.remove(key) match {
        case Some(b) => boundsCache.update(key, b); Some(b) // refresh recency
        case None => None
      }
    }

  private[loki] def putBounds(key: BoundsKey, b: Seq[(Long, Long)]): Unit =
    boundsCache.synchronized {
      boundsCache.update(key, b)
      while (boundsCache.size > 256) boundsCache.remove(boundsCache.head._1)
    }

  /** Drop every cached bounds placement for `endpoint`. The memo key is
    * (endpoint, logql, window, eff) with NO data fingerprint — correct
    * for a live endpoint whose balance staleness is bounded by the LRU,
    * but an endpoint whose DATASET is replaced under the same address
    * (a test stub stopped and its port recycled by the OS for a later
    * stub, or an in-place clear+reseed) would serve the OLD corpus's
    * boundary placement to the new one: the relation stays exact
    * (slicing never affects correctness), but the balance the stats
    * split exists for silently degrades. The stub calls this from
    * stop()/clear(); a production cache invalidation on ingest would
    * hang off the same hook.
    */
  def dropBoundsFor(endpoint: String): Unit = {
    boundsCache.synchronized {
      val stale = boundsCache.keys.filter(_._1 == endpoint).toList
      stale.foreach(boundsCache.remove)
    }
    statsCache.synchronized {
      val stale = statsCache.keys.filter(_._1 == endpoint).toList
      stale.foreach(statsCache.remove)
    }
  }

  /** (entries, bytes) memo for [[LokiScan.estimateStatistics]] — same
    * LRU/per-endpoint-invalidation discipline as the bounds cache (the
    * optimizer may ask for statistics on every Scan rebuild).
    */
  private val statsCache = scala.collection.mutable.LinkedHashMap
    .empty[(String, String, Long, Long), (Long, Long)]

  private[loki] def cachedStats(
      endpoint: String, selector: String, s: Long, e: Long): (Long, Long) = {
    val key = (endpoint, selector, s, e)
    statsCache.synchronized {
      statsCache.remove(key).map { v =>
        statsCache.update(key, v); v // refresh recency
      }
    }.getOrElse {
      val v = LokiHttp.indexStatsFull(endpoint, selector, s, e)
      statsCache.synchronized {
        statsCache.update(key, v)
        while (statsCache.size > 256) statsCache.remove(statsCache.head._1)
      }
      v
    }
  }
}

case class LokiInputPartition(
    endpoint: String,
    logql: String,
    startNs: Option[Long],
    endNs: Option[Long],
    /** Pushed LIMIT — single request, reference shape. */
    limit: Option[Int],
    /** Page size for cursor pagination (query_limit option); mutually
      * exclusive with `limit` by construction in planInputPartitions.
      */
    pageSize: Option[Int],
    requiredSchema: StructType,
    /** The server's max_entries_limit contract (server_max_entries
      * option): the reader never requests a limit above it — see
      * [[LokiOptions.serverMaxEntries]].
      */
    serverMax: Option[Int] = None,
    /** COUNT(*) answered by one index/stats request (logql here is the
      * bare selector — canPushCount guarantees no line-filter stages).
      */
    countOnly: Boolean = false,
    /** Explicit `direction` for the single-request path (the `direction`
      * option): which n rows a LIMIT keeps (backward = newest, forward =
      * oldest). Never set on paged partitions — their cursors walk
      * forward by construction.
      */
    direction: Option[String] = None) extends InputPartition {

  /** The executor-side concrete window: defaults materialize at execute
    * time, like scan.rs:104-115 (now−30d…now). ONE definition for all
    * three readers (row, columnar, count) — the default is a semantic
    * contract, and a copy drifting in one reader would silently diverge
    * the paths that are differential-tested against each other.
    */
  def effectiveWindow: (Long, Long) =
    (startNs.getOrElse(LokiHttp.thirtyDaysAgoNs),
      endNs.getOrElse(LokiHttp.nowNs))
}

case class LokiReaderFactory(columnar: Boolean = true)
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[LokiInputPartition]
    if (p.countOnly) new LokiCountReader(p) else new LokiPartitionReader(p)
  }

  /** Columnar decode for BOTH scan shapes — the reference streams Arrow
    * batches end-to-end (scan.rs:200-213, batch 4096) and the row readers
    * were the remaining connector CPU gap: the wire parquet decodes
    * straight into column vectors (low-level column readers, no per-row
    * Group materialization) and Spark consumes ColumnarBatches. The paged
    * path (the 100 TB shape: unbounded scans page past the server cap)
    * runs its held-back max-ts-run cursor over the decoded timestamp
    * VECTOR — the emit range is always a page prefix, so completeness
    * needs no per-row materialization (see [[LokiColumnarPagedReader]]).
    * A pushed COUNT stays row-based (one stats-derived row).
    */
  override def supportColumnarReads(partition: InputPartition): Boolean =
    columnar && !partition.asInstanceOf[LokiInputPartition].countOnly

  override def createColumnarReader(
      partition: InputPartition): PartitionReader[ColumnarBatch] = {
    val p = partition.asInstanceOf[LokiInputPartition]
    if (p.pageSize.isEmpty) new LokiColumnarPartitionReader(p)
    else new LokiColumnarPagedReader(p)
  }
}

/** Executor-side reader: HTTP range query(-ies), buffered body, parquet
  * decode via the parquet-java Group API with column projection. Decode is
  * INCREMENTAL — one record materialized at a time, row group by row group
  * (the reference decodes in bounded batches the same way, scan.rs:200-213).
  * Holding only the response bytes plus one row keeps the reader's memory
  * bounded regardless of scan size; the earlier ArrayBuffer materialization
  * held body bytes and every decoded InternalRow simultaneously.
  *
  * PAGINATION (`pageSize`, from the `query_limit` option): the reference
  * issues ONE request with no `limit` param (scan.rs:113-115), and a real
  * Loki then truncates at its server-side query_range default — silent
  * row loss on any window bigger than ~100 entries. With a page size set,
  * the reader walks the window in `direction=forward` pages. The cursor
  * needs the timestamp column even when the projection pruned it, so the
  * decode always requests it and simply doesn't emit it.
  *
  * SAME-NS COMPLETENESS: Loki's only cursor is the `start` timestamp
  * (inclusive), so a page cut can land inside a run of rows sharing one
  * identical ns. Advancing to maxTs+1 would silently drop the rest of
  * that run (the round-9 boundary). Instead the reader never emits the
  * trailing max-ts run of a FULL page: rows strictly below the page's max
  * ts stream out, the max-ts run is held back and re-read by the next
  * request at `start = maxTs` — no content-equality or server-tie-order
  * assumption needed. The degenerate full page (every row at one ns,
  * where re-requesting at the same limit would loop) emits nothing and
  * retries the same cursor with a DOUBLED limit until the burst fits in
  * one page — re-anchoring to the requested page size once the cursor
  * advances, so payloads grow only while inside a burst; past the
  * adaptive ceiling it fails loudly with the ns and the needed
  * query_limit instead of dropping rows.
  */
class LokiPartitionReader(p: LokiInputPartition)
  extends PartitionReader[InternalRow] {

  private var parquetReader: ParquetFileReader = _

  // defaults evaluated at execute time (p.effectiveWindow)
  private lazy val rows: Iterator[InternalRow] = {
    val (start, end) = p.effectiveWindow
    p.pageSize match {
      case None =>
        val body = LokiHttp.queryRange(p.endpoint, p.logql, start, end, p.limit, p.direction)
        if (body.isEmpty) Iterator.empty else decode(body)
      case Some(ps) => pagedRows(start, end, ps)
    }
  }

  private def pagedRows(start0: Long, end: Long, ps0: Int): Iterator[InternalRow] =
    new Iterator[InternalRow] {
      // adaptive-limit ceiling for single-ns bursts: generous (a burst this
      // size is pathological data) but bounded, so a misbehaving server
      // can't grow requests forever — and never above the server's own
      // declared max_entries_limit (server_max_entries option): a request
      // past that contract is either rejected loudly (real Loki) or
      // silently clamped (middleware), and a clamped full page would make
      // the drain test truncate the window (round-11 ADVICE)
      private val maxPs =
        p.serverMax.getOrElse(math.max(ps0, 1 << 20))
      private var ps = math.min(ps0, maxPs)
      private var cursor = start0
      private var done = false      // emitted everything; no more fetches
      private var drained = false   // server window exhausted (short page seen)
      private var fetched = false
      private var page: Iterator[InternalRow] = Iterator.empty
      private var pageRows = 0
      // rows cleared for emission (flushed below-max runs, or the final tail)
      private val flushQ = scala.collection.mutable.Queue.empty[InternalRow]
      // the current page's trailing run at its max ts — provisional until a
      // higher ts supersedes it (flush) or the page proves short (flush) or
      // full (discard: the next request re-reads it from cursor = heldTs)
      private val held = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
      private var heldTs = Long.MinValue

      private def fetch(): Unit = {
        close() // release the previous page's parquet reader
        val body = LokiHttp.queryRange(
          p.endpoint, p.logql, cursor, end, Some(ps), Some("forward"))
        page = if (body.isEmpty) Iterator.empty else decode(body)
        pageRows = 0
        held.clear()
        heldTs = Long.MinValue
        fetched = true
      }

      override def hasNext: Boolean = {
        while (flushQ.isEmpty && !done) {
          if (!fetched) fetch() // first page
          else if (page.hasNext) {
            val r = page.next()
            pageRows += 1
            if (curTsNs > heldTs) {
              // the held run is superseded by a later ts — it can no
              // longer be cut by the page boundary, so it emits
              flushQ ++= held
              held.clear()
              heldTs = curTsNs
            } else if (curTsNs < heldTs) {
              // forward-direction responses are ascending by contract; an
              // out-of-order row would break the held-run completeness
              // argument, so fail loudly rather than risk silent loss
              throw new IllegalStateException(
                s"Loki scan: out-of-order forward response (ts $curTsNs " +
                s"after $heldTs) from ${p.endpoint}")
            }
            held += r
          } else if (drained || pageRows < ps) {
            // short/empty page: the window is exhausted — the trailing
            // run cannot be cut, emit it
            flushQ ++= held
            held.clear()
            drained = true
            done = flushQ.isEmpty
          } else if (heldTs <= cursor) {
            // degenerate FULL page: every row at the cursor's own ns, so
            // the cursor cannot advance. Re-requesting from the same
            // cursor at the same limit would loop; emit nothing and retry
            // with a doubled limit until the burst fits inside one
            // (then-short) page. (A full page entirely at some LATER ns
            // advances normally through the branch below.)
            if (ps >= maxPs)
              throw new IllegalStateException(
                s"Loki scan: more than $ps entries share the nanosecond " +
                s"timestamp $heldTs and the forward cursor cannot advance " +
                "past it; raise the query_limit option above the largest " +
                "same-timestamp burst" +
                p.serverMax.fold("")(m => s" (adaptive growth is capped " +
                  s"at server_max_entries=$m — a burst must fit strictly " +
                  "inside one page to prove itself complete)"))
            ps = math.min(ps.toLong * 2, maxPs.toLong).toInt
            held.clear()
            fetch()
          } else {
            // full page: rows below the max ts were flushed as they were
            // superseded; the trailing max-ts run may have been cut by
            // the page limit, so discard it and re-read from its ts
            // (start is inclusive). Strict progress: the guard above
            // ensures heldTs > cursor here. The limit re-anchors to the
            // user's page size: a doubled limit exists only to swallow a
            // single-ns burst, and keeping it for the rest of the window
            // would grow every later payload past what query_limit asked
            // for.
            cursor = heldTs
            ps = ps0
            fetch()
          }
        }
        if (done) close()
        flushQ.nonEmpty
      }

      override def next(): InternalRow = {
        if (!hasNext) throw new NoSuchElementException("exhausted Loki scan")
        flushQ.dequeue()
      }
    }

  private var current: InternalRow = _

  override def next(): Boolean =
    if (rows.hasNext) { current = rows.next(); true } else false

  override def get(): InternalRow = current

  // also reached on early termination (pushed LIMIT stops the scan mid-read)
  override def close(): Unit =
    if (parquetReader != null) { parquetReader.close(); parquetReader = null }

  // the just-decoded row's raw ns timestamp — the pagination cursor
  // source (updated in decode's iterator whether or not the projection
  // includes the column)
  private var curTsNs: Long = Long.MinValue

  private def decode(body: Array[Byte]): Iterator[InternalRow] = {
    parquetReader = ParquetFileReader.open(new ByteArrayInputFile(body))
    val fileSchema = parquetReader.getFooter.getFileMetaData.getSchema
    // projection: requested subset of the file schema, by column name
    // (the ProjectionMask.roots analog, scan.rs:203-206). Paging needs
    // the timestamp column for its cursor even when pruned from the
    // output projection.
    val wanted = p.requiredSchema.fieldNames
    val decodeCols =
      if (p.pageSize.isDefined && !wanted.contains("timestamp"))
        wanted :+ "timestamp"
      else wanted
    val requested = new MessageType(fileSchema.getName,
      decodeCols.map(n => fileSchema.getType(fileSchema.getFieldIndex(n))): _*)
    val columnIO = new ColumnIOFactory().getColumnIO(requested, fileSchema)
    new Iterator[InternalRow] {
      private var recordReader: org.apache.parquet.io.RecordReader[Group] = _
      private var remaining = 0L

      private def advance(): Boolean = {
        val pages = parquetReader.readNextRowGroup()
        if (pages == null) {
          close(); false
        } else {
          recordReader = columnIO.getRecordReader(pages, new GroupRecordConverter(requested))
          remaining = pages.getRowCount
          if (remaining == 0) advance() else true
        }
      }

      override def hasNext: Boolean = remaining > 0 || (parquetReader != null && advance())

      override def next(): InternalRow = {
        if (!hasNext) throw new NoSuchElementException("exhausted Loki scan")
        remaining -= 1
        val g = recordReader.read()
        if (p.pageSize.isDefined) curTsNs = g.getLong("timestamp", 0)
        toRow(g, wanted)
      }
    }
  }

  private def toRow(g: Group, wanted: Array[String]): InternalRow = {
    val values = new Array[Any](wanted.length)
    var i = 0
    while (i < wanted.length) {
      values(i) = wanted(i) match {
        case "timestamp" =>
          // Loki ns → Spark µs, truncating (§7.4(b))
          java.lang.Long.valueOf(g.getLong("timestamp", 0) / 1000L)
        case "labels" => mapColumn(g, "labels")
        case "metadata" => mapColumn(g, "metadata")
        case "line" =>
          UTF8String.fromBytes(g.getBinary("line", 0).getBytes)
        case other =>
          throw new IllegalStateException(s"unexpected column $other")
      }
      i += 1
    }
    new GenericInternalRow(values)
  }

  /** One `(MAP) { repeated key_value {key,value} }` column — labels and
    * (round 16) structured metadata share the wire shape.
    */
  private def mapColumn(g: Group, name: String): ArrayBasedMapData = {
    val grp = g.getGroup(name, 0)
    val n = grp.getFieldRepetitionCount("key_value")
    val keys = new Array[Any](n)
    val vals = new Array[Any](n)
    var j = 0
    while (j < n) {
      val kv = grp.getGroup("key_value", j)
      keys(j) = UTF8String.fromBytes(kv.getBinary("key", 0).getBytes)
      vals(j) = UTF8String.fromBytes(kv.getBinary("value", 0).getBytes)
      j += 1
    }
    ArrayBasedMapData(keys, vals)
  }
}

/** COUNT(*) answered by ONE `index/stats` request — the scan never runs
  * (see [[LokiOptions.pushCount]] for the accuracy contract). Time
  * defaults materialize executor-side exactly like the row reader's.
  */
class LokiCountReader(p: LokiInputPartition)
  extends PartitionReader[InternalRow] {
  private var done = false
  override def next(): Boolean = !done && { done = true; true }
  override def get(): InternalRow = {
    val (start, end) = p.effectiveWindow
    new GenericInternalRow(Array[Any](
      java.lang.Long.valueOf(LokiHttp.indexStats(p.endpoint, p.logql, start, end))))
  }
  override def close(): Unit = ()
}

/** Columnar decode of the wire parquet for the single-request path: the
  * response's column chunks stream straight into OnHeapColumnVectors via
  * parquet's low-level column readers — no per-row Group materialization,
  * no per-row InternalRow — and Spark consumes 4096-row ColumnarBatches
  * (the reference's batch size, scan.rs:200-213). The labels map
  * reconstructs from the key column's repetition levels (rep 0 starts a
  * row, rep 1 continues; definition 0 is an empty map), with the value
  * column consumed in lockstep — the two columns share one repetition
  * structure by schema.
  */
class LokiColumnarPartitionReader(p: LokiInputPartition)
  extends PartitionReader[ColumnarBatch] {

  import org.apache.parquet.column.ColumnReader
  import org.apache.parquet.column.impl.ColumnReadStoreImpl

  private val BatchRows = 4096
  private val wanted = p.requiredSchema.fieldNames

  private var parquetReader: ParquetFileReader = _
  private var fileSchema: MessageType = _
  private var requested: MessageType = _
  private var createdBy: String = _
  private var opened = false
  private var exhausted = false

  // current row group state
  private var groupRemaining = 0L
  private var tsReader: ColumnReader = _
  private var keyReader: ColumnReader = _
  private var valReader: ColumnReader = _
  private var lineReader: ColumnReader = _
  private var keyValsConsumed = 0L
  private var keyValsTotal = 0L

  private var batch: ColumnarBatch = _

  private def open(): Unit = {
    val (start, end) = p.effectiveWindow
    val body = LokiHttp.queryRange(p.endpoint, p.logql, start, end, p.limit, p.direction)
    if (body.nonEmpty) {
      parquetReader = ParquetFileReader.open(new ByteArrayInputFile(body))
      val md = parquetReader.getFooter.getFileMetaData
      fileSchema = md.getSchema
      createdBy = md.getCreatedBy
      requested =
        if (wanted.isEmpty) null // bare count: row counts only, no decode
        else new MessageType(fileSchema.getName,
          wanted.map(n => fileSchema.getType(fileSchema.getFieldIndex(n))): _*)
    } else exhausted = true
    opened = true
  }

  private def advanceRowGroup(): Boolean = {
    if (parquetReader == null) return false
    val pages = parquetReader.readNextRowGroup()
    if (pages == null) { exhausted = true; false }
    else if (pages.getRowCount == 0) advanceRowGroup()
    else {
      groupRemaining = pages.getRowCount
      if (requested != null) {
        val store = new ColumnReadStoreImpl(pages,
          new GroupRecordConverter(requested).getRootConverter, requested,
          createdBy)
        def rd(path: String*): ColumnReader =
          store.getColumnReader(requested.getColumnDescription(path.toArray))
        tsReader = if (wanted.contains("timestamp")) rd("timestamp") else null
        lineReader = if (wanted.contains("line")) rd("line") else null
        if (wanted.contains("labels")) {
          keyReader = rd("labels", "key_value", "key")
          valReader = rd("labels", "key_value", "value")
          keyValsConsumed = 0L
          keyValsTotal = keyReader.getTotalValueCount
        } else { keyReader = null; valReader = null }
      }
      true
    }
  }

  override def next(): Boolean = {
    if (!opened) open()
    if (batch != null) { batch.close(); batch = null }
    while (groupRemaining == 0 && !exhausted) {
      if (!advanceRowGroup()) return false
    }
    if (exhausted && groupRemaining == 0) return false
    val n = math.min(groupRemaining, BatchRows.toLong).toInt
    import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
    val vecs = OnHeapColumnVector.allocateColumns(n, p.requiredSchema)
    var c = 0
    while (c < wanted.length) {
      val v = vecs(c)
      wanted(c) match {
        case "timestamp" =>
          var r = 0
          while (r < n) {
            // Loki ns → Spark µs, truncating (§7.4(b)) — the row
            // reader's rule
            v.putLong(r, tsReader.getLong / 1000L)
            tsReader.consume()
            r += 1
          }
        case "line" =>
          var r = 0
          while (r < n) {
            val b = lineReader.getBinary.getBytes
            v.putByteArray(r, b, 0, b.length)
            lineReader.consume()
            r += 1
          }
        case "labels" =>
          val keys = v.getChild(0)
            .asInstanceOf[org.apache.spark.sql.execution.vectorized.WritableColumnVector]
          val vals = v.getChild(1)
            .asInstanceOf[org.apache.spark.sql.execution.vectorized.WritableColumnVector]
          var offset = 0
          var r = 0
          while (r < n) {
            var cnt = 0
            if (keyReader.getCurrentDefinitionLevel == 0) {
              // empty map: one (def 0) placeholder triplet, no value
              keyReader.consume(); valReader.consume()
              keyValsConsumed += 1
            } else {
              var more = true
              while (more) {
                val kb = keyReader.getBinary.getBytes
                val vb = valReader.getBinary.getBytes
                keys.appendByteArray(kb, 0, kb.length)
                vals.appendByteArray(vb, 0, vb.length)
                keyReader.consume(); valReader.consume()
                keyValsConsumed += 1
                cnt += 1
                more = keyValsConsumed < keyValsTotal &&
                  keyReader.getCurrentRepetitionLevel == 1
              }
            }
            v.putArray(r, offset, cnt)
            offset += cnt
            r += 1
          }
        case other =>
          throw new IllegalStateException(s"unexpected column $other")
      }
      c += 1
    }
    batch = new ColumnarBatch(vecs.map(_.asInstanceOf[
      org.apache.spark.sql.vectorized.ColumnVector]), n)
    groupRemaining -= n
    true
  }

  override def get(): ColumnarBatch = batch

  override def close(): Unit = {
    if (batch != null) { batch.close(); batch = null }
    if (parquetReader != null) { parquetReader.close(); parquetReader = null }
  }
}

/** Columnar decode for the PAGED path — the 100 TB scan shape (an
  * unbounded scan against a capped server walks the window in forward
  * pages). The row pager's held-back max-ts-run completeness argument
  * maps onto vectors directly: forward pages are ts-ascending, so the
  * rows that are SAFE to emit from a full page are exactly the prefix
  * strictly below the page's max timestamp — the trailing max-ts run
  * (which the page limit may have cut mid-run) is never emitted and the
  * next request re-reads it from `start = maxTs` (inclusive). A page
  * therefore decodes once into column vectors (the single-request
  * reader's wire-decode shape, no per-row Group/InternalRow
  * materialization) and emits ONE ColumnarBatch over the safe prefix;
  * the held-back tail is just the rows past the batch's numRows — no
  * copy, no row materialization. Short pages (window exhausted) emit
  * whole; the degenerate full page entirely at the cursor's own ns
  * doubles the limit exactly like the row pager (same loud failure past
  * the server cap). The timestamp column is always decoded for the
  * cursor — into a raw-ns array, never into the output vectors unless
  * projected.
  */
class LokiColumnarPagedReader(p: LokiInputPartition)
  extends PartitionReader[ColumnarBatch] {

  import org.apache.parquet.column.impl.ColumnReadStoreImpl
  import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector

  private val wanted = p.requiredSchema.fieldNames

  private val maxPs = p.serverMax.getOrElse(math.max(p.pageSize.get, 1 << 20))
  private var ps = math.min(p.pageSize.get, maxPs)
  private lazy val window = p.effectiveWindow
  private var cursor = Long.MinValue // initialized on first fetch
  private var started = false
  private var done = false
  private var batch: ColumnarBatch = _

  /** Decode one wire-parquet page body fully into column vectors +
    * the raw-ns timestamp array (cursor source). Enforces the
    * forward-ascending contract the held-run argument rests on.
    */
  private def decodePage(
      body: Array[Byte]): (Array[OnHeapColumnVector], Array[Long], Int) = {
    val reader = ParquetFileReader.open(new ByteArrayInputFile(body))
    try {
      val md = reader.getFooter.getFileMetaData
      val fileSchema = md.getSchema
      val total = reader.getRecordCount.toInt
      val tsNs = new Array[Long](total)
      val vecs = OnHeapColumnVector.allocateColumns(math.max(total, 1),
        p.requiredSchema)
      // decode needs the timestamp column for the cursor even when the
      // projection pruned it (the row pager's rule)
      val decodeCols =
        if (!wanted.contains("timestamp")) wanted :+ "timestamp" else wanted
      val requested = new MessageType(fileSchema.getName,
        decodeCols.map(n => fileSchema.getType(fileSchema.getFieldIndex(n))): _*)
      var rowBase = 0
      var mapOffset = 0
      var pages = reader.readNextRowGroup()
      while (pages != null) {
        val n = pages.getRowCount.toInt
        if (n > 0) {
          val store = new ColumnReadStoreImpl(pages,
            new GroupRecordConverter(requested).getRootConverter, requested,
            md.getCreatedBy)
          def rd(path: String*) =
            store.getColumnReader(requested.getColumnDescription(path.toArray))
          val tsReader = rd("timestamp")
          val emitTs = wanted.indexOf("timestamp")
          var r = 0
          while (r < n) {
            val ns = tsReader.getLong
            tsReader.consume()
            tsNs(rowBase + r) = ns
            if (rowBase + r > 0 && ns < tsNs(rowBase + r - 1))
              throw new IllegalStateException(
                s"Loki scan: out-of-order forward response (ts $ns after " +
                s"${tsNs(rowBase + r - 1)}) from ${p.endpoint}")
            // Loki ns → Spark µs, truncating (§7.4(b))
            if (emitTs >= 0) vecs(emitTs).putLong(rowBase + r, ns / 1000L)
            r += 1
          }
          val emitLine = wanted.indexOf("line")
          if (emitLine >= 0) {
            val lineReader = rd("line")
            r = 0
            while (r < n) {
              val b = lineReader.getBinary.getBytes
              vecs(emitLine).putByteArray(rowBase + r, b, 0, b.length)
              lineReader.consume()
              r += 1
            }
          }
          val emitLabels = wanted.indexOf("labels")
          if (emitLabels >= 0) {
            val keyReader = rd("labels", "key_value", "key")
            val valReader = rd("labels", "key_value", "value")
            val keys = vecs(emitLabels).getChild(0).asInstanceOf[
              org.apache.spark.sql.execution.vectorized.WritableColumnVector]
            val vals = vecs(emitLabels).getChild(1).asInstanceOf[
              org.apache.spark.sql.execution.vectorized.WritableColumnVector]
            val kvTotal = keyReader.getTotalValueCount
            var consumed = 0L
            r = 0
            while (r < n) {
              var cnt = 0
              if (keyReader.getCurrentDefinitionLevel == 0) {
                keyReader.consume(); valReader.consume()
                consumed += 1
              } else {
                var more = true
                while (more) {
                  val kb = keyReader.getBinary.getBytes
                  val vb = valReader.getBinary.getBytes
                  keys.appendByteArray(kb, 0, kb.length)
                  vals.appendByteArray(vb, 0, vb.length)
                  keyReader.consume(); valReader.consume()
                  consumed += 1
                  cnt += 1
                  more = consumed < kvTotal &&
                    keyReader.getCurrentRepetitionLevel == 1
                }
              }
              vecs(emitLabels).putArray(rowBase + r, mapOffset, cnt)
              mapOffset += cnt
              r += 1
            }
          }
          rowBase += n
        }
        pages = reader.readNextRowGroup()
      }
      (vecs, tsNs, rowBase)
    } finally reader.close()
  }

  override def next(): Boolean = {
    if (batch != null) { batch.close(); batch = null }
    if (!started) { cursor = window._1; started = true }
    while (!done) {
      val body = LokiHttp.queryRange(
        p.endpoint, p.logql, cursor, window._2, Some(ps), Some("forward"))
      if (body.isEmpty) { done = true; return false }
      val (vecs, tsNs, rows) = decodePage(body)
      if (rows == 0) { done = true; return false }
      if (rows < ps) {
        // short page: the window is exhausted — nothing can be cut
        done = true
        batch = new ColumnarBatch(vecs.map(_.asInstanceOf[
          org.apache.spark.sql.vectorized.ColumnVector]), rows)
        return true
      }
      // full page: the trailing max-ts run may be cut mid-run by the
      // page limit — emit only the prefix strictly below maxTs
      val maxTs = tsNs(rows - 1)
      var cut = rows - 1
      while (cut > 0 && tsNs(cut - 1) == maxTs) cut -= 1
      if (cut > 0) {
        cursor = maxTs
        ps = p.pageSize.get // re-anchor after any burst doubling
        batch = new ColumnarBatch(vecs.map(_.asInstanceOf[
          org.apache.spark.sql.vectorized.ColumnVector]), cut)
        return true
      }
      // whole page at ONE ns
      vecs.foreach(_.close())
      if (maxTs > cursor) {
        // ...at a LATER ns: cursor advances, re-read the run whole
        cursor = maxTs
        ps = p.pageSize.get
      } else {
        // ...at the cursor's own ns: the cursor cannot advance — retry
        // with a doubled limit until the burst fits in one (then-short)
        // page; past the ceiling fail loudly instead of dropping rows
        if (ps >= maxPs)
          throw new IllegalStateException(
            s"Loki scan: more than $ps entries share the nanosecond " +
            s"timestamp $maxTs and the forward cursor cannot advance " +
            "past it; raise the query_limit option above the largest " +
            "same-timestamp burst" +
            p.serverMax.fold("")(m => s" (adaptive growth is capped " +
              s"at server_max_entries=$m — a burst must fit strictly " +
              "inside one page to prove itself complete)"))
        ps = math.min(ps.toLong * 2, maxPs.toLong).toInt
      }
    }
    false
  }

  override def get(): ColumnarBatch = batch

  override def close(): Unit =
    if (batch != null) { batch.close(); batch = null }
}

package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.execution.SparkStrategy

/** Whole-operator custom plan: exact top-k rows per key group.
  *
  * The built-in expression of this operator is `row_number().over(Window
  * .partitionBy(keys).orderBy(ord)) <= k`, which sorts EVERY group in full —
  * at N rows per key that is O(N log N) per key and materializes the whole
  * partition. This operator keeps a bounded k-element heap per key (O(N log
  * k), O(k) memory per key), which is the difference between "sort 100 TB"
  * and "stream 100 TB through fixed-size heaps" for ANN-style top-k.
  *
  * Memory contract: in-memory state is O(distinct keys × k) rows per
  * partition. For high-cardinality keys that state no longer fits, so the
  * operator SPILLS: when retained rows exceed
  * `spark.graft.topk.maxRetainedRows`, the current heaps are drained to a
  * key-sorted temp file and the map restarts empty; at the end the spill
  * chunks merge by key (top-k is algebraic — top-k of a union is top-k of
  * the concatenated per-chunk top-k's), holding one chunk head plus one
  * key's candidate heap at a time. The spill path trades sequential disk
  * I/O for the OOM, exactly like the window variant's external sort would —
  * but still only ever writes ≤ k rows per key per chunk, not the full
  * input.
  *
  * Declared via [[GraftPlans.topKPerKey]]; planned by [[TopKStrategy]]
  * (registered in [[GraftExtensions]]). Spark inserts the key shuffle via
  * `requiredChildDistribution`, so pre-shuffle data locality and AQE still
  * apply.
  */
final case class TopKPerKey(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, "k must be positive")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerKey = copy(child = c)
}

final case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan,
    // partial = map-side pass BEFORE the key shuffle, the partial-
    // aggregation shape: top-k is algebraic (top-k of a union is top-k
    // of the concatenated per-partition top-k's — the same identity the
    // spill merge relies on), so each input partition pre-reduces to
    // ≤ keys×k rows and the exchange ships those instead of the full
    // child relation. The final (non-partial) exec above the shuffle
    // merges. For a shuffle carrying millions of grouped candidates into
    // a handful of key partitions (per-language top-k over corpus-scale
    // gram counts), this is the difference between shuffling the corpus
    // and shuffling keys×k×partitions rows into the skewed side.
    partial: Boolean = false) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def nodeName: String =
    if (partial) "TopKPerKeyPartial" else "TopKPerKey"

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) super.requiredChildDistribution
    else ClusteredDistribution(keys) :: Nil

  // row-set reduction preserves the child's partitioning (SparkPlan's
  // default is UnknownPartitioning, which made every downstream
  // clustering consumer re-shuffle the ≤ keys×k output)
  override def outputPartitioning:
      org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyExec =
    copy(child = c)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    val childOutput = child.output
    val nRowFields = childOutput.length
    val budget = conf.getConfString(
      TopKPerKeyExec.MAX_RETAINED_ROWS_KEY,
      TopKPerKeyExec.MAX_RETAINED_ROWS_DEFAULT.toString).toLong
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      // identity projection to UnsafeRow: heap/spill entries need a
      // stable binary form regardless of what InternalRow the child emits
      val rowProj = UnsafeProjection.create(
        childOutput.map(a => a: Expression), childOutput)
      val rowOrd = new LazilyGeneratedOrdering(sortOrder, childOutput)
      new TopKPartitionIterator(
        iter, keyProj, rowProj, rowOrd, limit, nRowFields, budget)
    }
  }
}

object TopKPerKeyExec {
  /** Per-partition retained-row budget before the heap map spills. */
  val MAX_RETAINED_ROWS_KEY = "spark.graft.topk.maxRetainedRows"
  val MAX_RETAINED_ROWS_DEFAULT: Long = 4L * 1024 * 1024
}

/** Per-partition top-k state machine: bounded per-key heaps, spill-to-disk
  * past the budget, key-merged emission. One instance per task.
  */
private final class TopKPartitionIterator(
    input: Iterator[InternalRow],
    keyProj: UnsafeProjection,
    rowProj: UnsafeProjection,
    rowOrd: LazilyGeneratedOrdering,
    k: Int,
    nRowFields: Int,
    budget: Long) extends Iterator[InternalRow] {

  import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, File, FileInputStream, FileOutputStream}

  private val heaps =
    new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
  private var retained = 0L
  private var spillFiles = List.empty[File]

  // spills must not leak on task failure/early termination
  locally {
    val ctx = org.apache.spark.TaskContext.get()
    if (ctx != null) {
      ctx.addTaskCompletionListener[Unit](_ => spillFiles.foreach(_.delete()))
    }
  }

  /** Lexicographic total order on key bytes — any consistent total order
    * groups equal keys adjacently across chunks (same values ⇒ identical
    * UnsafeRow bytes under one projection).
    */
  private def compareKeys(a: Array[Byte], b: Array[Byte]): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val c = java.lang.Byte.compareUnsigned(a(i), b(i))
      if (c != 0) return c
      i += 1
    }
    java.lang.Integer.compare(a.length, b.length)
  }

  private def drainHeapWorstFirst(h: java.util.PriorityQueue[UnsafeRow]): Array[UnsafeRow] = {
    val rows = new Array[UnsafeRow](h.size)
    var i = rows.length - 1
    while (i >= 0) { rows(i) = h.poll(); i -= 1 } // worst-first → best-first
    rows
  }

  /** Drain the heap map to a key-sorted chunk file and restart empty. */
  private def spill(): Unit = {
    val entries = new java.util.ArrayList[(Array[Byte], Array[UnsafeRow])](heaps.size())
    heaps.forEach { (key, h) => entries.add((key.getBytes, drainHeapWorstFirst(h))); () }
    entries.sort((x, y) => compareKeys(x._1, y._1))
    // spill into Spark's configured scratch dirs, not java.io.tmpdir: on
    // a real cluster spark.local.dir points at the large local volumes
    // while /tmp is typically the small root filesystem — Spark's own
    // spilling operators target the local dirs for the same reason
    val localDir = Option(org.apache.spark.SparkEnv.get)
      .map(_.conf.get("spark.local.dir", sys.props("java.io.tmpdir")))
      .getOrElse(sys.props("java.io.tmpdir"))
      .split(",").head.trim
    val f = File.createTempFile("graft-topk-spill", ".bin", new File(localDir))
    val out = new DataOutputStream(new BufferedOutputStream(new FileOutputStream(f), 1 << 16))
    try {
      entries.forEach { case (keyBytes, rows) =>
        out.writeInt(keyBytes.length); out.write(keyBytes)
        out.writeInt(rows.length)
        rows.foreach { r => val b = r.getBytes; out.writeInt(b.length); out.write(b) }
        ()
      }
    } finally out.close()
    spillFiles ::= f
    heaps.clear()
    retained = 0L
  }

  /** Sorted stream of (keyBytes, best-first rows) groups from one chunk. */
  private final class ChunkReader(f: File) {
    private val in = new DataInputStream(new BufferedInputStream(new FileInputStream(f), 1 << 16))
    var keyBytes: Array[Byte] = _
    var rows: Array[UnsafeRow] = _
    advance()
    def advance(): Boolean = {
      val first = try in.read() catch { case _: java.io.EOFException => -1 }
      if (first < 0) { in.close(); keyBytes = null; rows = null; false }
      else {
        val kLen = (first << 24) | (in.readUnsignedByte() << 16) |
          (in.readUnsignedByte() << 8) | in.readUnsignedByte()
        keyBytes = new Array[Byte](kLen); in.readFully(keyBytes)
        rows = new Array[UnsafeRow](in.readInt())
        var i = 0
        while (i < rows.length) {
          val b = new Array[Byte](in.readInt()); in.readFully(b)
          val r = new UnsafeRow(nRowFields)
          r.pointTo(b, b.length)
          rows(i) = r
          i += 1
        }
        true
      }
    }
  }

  // ---- consume the input eagerly (the operator is blocking by nature) ----
  locally {
    while (input.hasNext) {
      val row = input.next()
      val key = keyProj(row)
      var heap = heaps.get(key)
      if (heap == null) {
        heap = new java.util.PriorityQueue[UnsafeRow](k + 1, rowOrd.reverse)
        heaps.put(key.copy(), heap)
      }
      if (heap.size < k) {
        heap.add(rowProj(row).copy())
        retained += 1
        if (retained > budget) spill()
      } else if (rowOrd.compare(row, heap.peek()) < 0) {
        heap.poll()
        heap.add(rowProj(row).copy())
      }
    }
  }

  private val output: Iterator[InternalRow] =
    if (spillFiles.isEmpty) {
      // fast path: everything fit — emit straight from the heaps
      val buf = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
      heaps.values.forEach { h => buf ++= drainHeapWorstFirst(h); () }
      heaps.clear()
      buf.iterator
    } else {
      // merge path: the in-memory remainder becomes the last chunk, then
      // the key-sorted chunks merge — one group per chunk in memory, plus
      // one k-heap for the key being merged
      if (!heaps.isEmpty) spill()
      val readers = spillFiles.map(new ChunkReader(_)).filter(_.keyBytes != null)
      new Iterator[InternalRow] {
        private val pending = scala.collection.mutable.Queue.empty[InternalRow]
        private var live = readers
        private def fillNextKey(): Unit = {
          if (live.isEmpty) return
          val minKey = live.map(_.keyBytes).reduce((a, b) =>
            if (compareKeys(a, b) <= 0) a else b)
          // candidates for this key across chunks: ≤ chunks × k rows
          val heap = new java.util.PriorityQueue[UnsafeRow](k + 1, rowOrd.reverse)
          live.foreach { r =>
            if (compareKeys(r.keyBytes, minKey) == 0) {
              r.rows.foreach { row =>
                if (heap.size < k) { heap.add(row); () }
                else if (rowOrd.compare(row, heap.peek()) < 0) {
                  heap.poll(); heap.add(row); ()
                }
              }
              r.advance()
            }
          }
          live = live.filter(_.keyBytes != null)
          drainHeapWorstFirst(heap).foreach(pending.enqueue(_))
        }
        override def hasNext: Boolean = {
          while (pending.isEmpty && live.nonEmpty) fillNextKey()
          pending.nonEmpty
        }
        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException("exhausted top-k merge")
          pending.dequeue()
        }
      }
    }

  override def hasNext: Boolean = output.hasNext
  override def next(): InternalRow = output.next()
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      // two-level plan, exactly the partial/final aggregation shape:
      // map-side bounded heaps reduce each partition to ≤ keys×k rows,
      // the exchange (inserted by the final exec's required distribution)
      // ships only those, the final exec merges per key
      TopKPerKeyExec(keys, order, k,
        TopKPerKeyExec(keys, order, k, planLater(child), partial = true)) :: Nil
    case _ => Nil
  }
}

/** Declarative entry points for the custom plans. */
object GraftPlans {
  import org.apache.spark.sql.graft.ColumnShim

  /** Top-k rows of `df` per distinct value of `keyNames`, ranked by
    * `orderSpec` (column name → ascending?), best first. Attributes are
    * resolved here against the analyzed child (Spark 4's ColumnNode
    * wrappers don't resolve inside custom logical nodes). Requires
    * [[GraftExtensions]] on the session.
    */
  def topKPerKey(
      df: DataFrame,
      keyNames: Seq[String],
      orderSpec: Seq[(String, Boolean)],
      k: Int): DataFrame = {
    val plan = df.queryExecution.analyzed
    def attr(n: String): Attribute = {
      val matches = plan.output.filter(_.name == n)
      // ambiguity is an error, like Spark's own resolver: a post-join
      // relation with two same-named columns would otherwise silently
      // key/order on whichever came first — a wrong-but-plausible top-k
      if (matches.size > 1) {
        throw new IllegalArgumentException(
          s"column $n is ambiguous (${matches.size} matches) in " +
            plan.output.map(_.name).mkString(","))
      }
      matches.headOption.getOrElse(
        throw new IllegalArgumentException(
          s"column $n not in ${plan.output.map(_.name).mkString(",")}"))
    }
    val keys = keyNames.map(attr)
    val order = orderSpec.map { case (n, asc) =>
      SortOrder(attr(n),
        if (asc) org.apache.spark.sql.catalyst.expressions.Ascending
        else org.apache.spark.sql.catalyst.expressions.Descending)
    }
    ColumnShim.ofRows(df.sparkSession, TopKPerKey(keys, order, k, plan))
  }
}

package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection}
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
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyExec =
    copy(child = c)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    val childOutput = child.output
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val rowOrd = new LazilyGeneratedOrdering(sortOrder, childOutput)
      // per-key bounded heap; head = worst retained row
      val heaps = new java.util.HashMap[InternalRow, java.util.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](limit + 1, rowOrd.reverse)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < limit) {
          heap.add(row.copy())
        } else if (rowOrd.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy())
        }
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
      heaps.values.forEach { h =>
        val rows = new Array[InternalRow](h.size)
        var i = rows.length - 1
        while (i >= 0) { rows(i) = h.poll(); i -= 1 } // drain worst-first → best-first
        out ++= rows
      }
      out.iterator
    }
  }
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, planLater(child)) :: Nil
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
    def attr(n: String): Attribute =
      plan.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"column $n not in ${plan.output.map(_.name).mkString(",")}"))
    val keys = keyNames.map(attr)
    val order = orderSpec.map { case (n, asc) =>
      SortOrder(attr(n),
        if (asc) org.apache.spark.sql.catalyst.expressions.Ascending
        else org.apache.spark.sql.catalyst.expressions.Descending)
    }
    ColumnShim.ofRows(df.sparkSession, TopKPerKey(keys, order, k, plan))
  }
}

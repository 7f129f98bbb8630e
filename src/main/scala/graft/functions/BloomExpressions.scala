package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, Dataset}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership as a broadcast sketch + native codegen'd probe.
  *
  * The 100 TB shape for delta-vs-base exact dedup: the BASE corpus is
  * aggregated ONCE into a fixed-size bit array (log-depth treeReduce of
  * per-partition filters — no shuffle of the data), the sketch is
  * broadcast, and the delta probes it SCAN-LOCALLY. Bloom filters have no
  * false negatives, so a negative probe is definitive; positives (true
  * hits + fpp) go through an exact verification join that is
  * candidate-sized, not base-sized.
  */
object BloomSketch {

  /** Build a [[BloomFilter]] over a string column distributively:
    * per-partition filters merged log-depth (treeReduce), so the driver
    * receives one sketch — never the data. `expected`/`fpp` size the bit
    * array (bits ≈ 1.44 · expected · log2(1/fpp)); an over-estimate only
    * lowers the realized fpp. Insertion uses the UTF-8 bytes, matching
    * [[BloomMightContain]]'s probe by construction.
    */
  def build(col: Dataset[String], expected: Long, fpp: Double): BloomFilter = {
    val parts = col.rdd
      .mapPartitions { it =>
        val f = BloomFilter.create(math.max(expected, 1L), fpp)
        it.foreach(s => f.putBinary(s.getBytes("UTF-8")))
        Iterator(f)
      }
    // treeReduce throws on an empty RDD; mapPartitions emits one filter
    // per partition even for empty ones, so the only empty case is a
    // ZERO-partition RDD (an empty pre-filtered base corpus) — a legal
    // "no base yet" input that yields the empty sketch (every probe
    // false). getNumPartitions is metadata, no extra job.
    if (parts.getNumPartitions == 0) BloomFilter.create(math.max(expected, 1L), fpp)
    else parts.treeReduce((a, b) => { a.mergeInPlace(b); a })
  }

  def mightContain(bloom: Broadcast[BloomFilter], c: Column): Column =
    ColumnShim.column(BloomMightContain(ColumnShim.expression(c), bloom))
}

/** `bloom_might_contain(str)` against a broadcast sketch → boolean.
  * Probes the UTF8String's bytes directly (no String materialization);
  * the broadcast handle rides the expression, so the sketch ships once
  * per executor, not per task closure.
  */
case class BloomMightContain(child: Expression, bloom: Broadcast[BloomFilter])
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"
  override protected def nullSafeEval(input: Any): Any =
    bloom.value.mightContainBinary(input.asInstanceOf[UTF8String].getBytes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomBc", bloom,
      classOf[Broadcast[BloomFilter]].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = ((org.apache.spark.util.sketch.BloomFilter) " +
        s"$ref.value()).mightContainBinary($c.getBytes());")
  }
  override protected def withNewChildInternal(c: Expression): BloomMightContain =
    copy(child = c)
}

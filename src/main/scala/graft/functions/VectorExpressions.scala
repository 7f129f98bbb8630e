package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Vector similarity primitives as codegen-friendly Catalyst expressions.
  *
  * `cosine_sim` is the hot inner loop of brute-force ANN (evaluated once per
  * candidate pair — O(n·k) to O(n²) times per query batch), so it generates
  * a direct static call inside whole-stage codegen instead of falling back
  * to interpreted eval. Accumulation is sequential double-precision in
  * element order, matching DuckDB's `list_cosine_similarity` bit-for-bit,
  * which keeps the oracle comparison exact.
  */
object VectorOps {

  /** Sequential-order cosine similarity of two double arrays. Mismatched
    * lengths are an ERROR, not a silent prefix score: the function is
    * SQL-registered and user-callable, and a pipeline bug pairing a
    * 768-dim with a 512-dim vector would otherwise return a plausible
    * similarity over the shared prefix — DuckDB's
    * list_cosine_similarity (the oracle twin) rejects the same input.
    */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    if (a.numElements() != b.numElements()) {
      throw new IllegalArgumentException(
        s"cosine_sim: mismatched vector lengths ${a.numElements()} vs " +
          s"${b.numElements()}")
    }
    val n = a.numElements()
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Σ aᵢ·bᵢ over two double arrays, sequential in element order — the
    * same accumulation [[cosine]] performs for its dot (and, with a == b,
    * for its norms), exposed separately so hot pair loops can precompute
    * per-ROW norm factors once instead of re-deriving both norms per
    * PAIR: cos(a,b) = dotDouble(a,b) / (sqrt(dotDouble(a,a)) ·
    * sqrt(dotDouble(b,b))) reproduces cosine_sim bit-for-bit (identical
    * fold order, IEEE-exact sqrt/division) as long as the caller keeps
    * cosine's zero-norm → 0.0 guard.
    */
  def dotDouble(a: ArrayData, b: ArrayData): Double = {
    if (a.numElements() != b.numElements()) {
      throw new IllegalArgumentException(
        s"dot_double: mismatched vector lengths ${a.numElements()} vs " +
          s"${b.numElements()}")
    }
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }

  /** Σ aᵢ·bᵢ over two long arrays, sequential in element order — the
    * integer inner product of the ×1e6-quantized vector family. Same
    * fold order and wrapping int64 arithmetic as the
    * `aggregate(zip_with(a, b, _*_), 0L, _+_)` higher-order form it
    * replaces (HOFs are CodegenFallback — interpreted with per-element
    * boxing — which made them the hot path of the MMR scorer), so the
    * result is bit-identical on the ×1e6-quantized domain every caller
    * uses (64-dim folds peak ~2e13 ≪ int64). On OVERFLOW the two
    * diverge: the ANSI-mode HOF throws where this loop wraps — reachable
    * only where the replaced code crashed, never on the bounded
    * quantized vectors. Elements must be non-null (every caller
    * builds the arrays with transform over non-null doubles); mismatched
    * lengths are an error, as in [[cosine]].
    */
  def dotLong(a: ArrayData, b: ArrayData): Long = {
    if (a.numElements() != b.numElements()) {
      throw new IllegalArgumentException(
        s"dot_long: mismatched vector lengths ${a.numElements()} vs " +
          s"${b.numElements()}")
    }
    val n = a.numElements()
    var s = 0L
    var i = 0
    while (i < n) { s += a.getLong(i) * b.getLong(i); i += 1 }
    s
  }

  /** Σ (aᵢ−bᵢ)² over two long arrays — the integer squared-L2 of the
    * quantized k-means/IVF assignment loops. Same order/overflow
    * contract as [[dotLong]].
    */
  def l2sqLong(a: ArrayData, b: ArrayData): Long = {
    if (a.numElements() != b.numElements()) {
      throw new IllegalArgumentException(
        s"l2sq_long: mismatched vector lengths ${a.numElements()} vs " +
          s"${b.numElements()}")
    }
    val n = a.numElements()
    var s = 0L
    var i = 0
    while (i < n) {
      val d = a.getLong(i) - b.getLong(i)
      s += d * d
      i += 1
    }
    s
  }

  /** Intersection size of two SORTED long arrays — one merge scan, no
    * per-row set allocation. The hot inner loop of hashed-shingle
    * similarity verification (evaluated once per candidate pair).
    */
  def sortedIntersect(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  /** Sign-random-projection LSH signature: `bits` hyperplanes, each drawn
    * deterministically from (seed, plane index, dim index) via a splitmix64
    * step — no stored projection matrix, so executors recompute it locally
    * (nothing to broadcast; works at any cluster size).
    */
  def srpSignature(v: ArrayData, bits: Int, seed: Long): Long = {
    val n = v.numElements()
    var sig = 0L
    var p = 0
    while (p < bits) {
      var acc = 0.0
      var i = 0
      while (i < n) {
        // splitmix64 on (seed, p, i) → pseudo-random ±1 component
        var z = seed + 0x9e3779b97f4a7c15L * (p.toLong * 1048576L + i + 1L)
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        z = z ^ (z >>> 31)
        val comp = if ((z & 1L) == 0L) 1.0 else -1.0
        acc += comp * v.getDouble(i)
        i += 1
      }
      if (acc >= 0) sig |= (1L << p)
      p += 1
    }
    sig
  }
}

/** `cosine_sim(array<double>, array<double>)` → double. */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  // declared because the SQL registration makes this user-callable: an
  // undeclared int-array argument would pass analysis and misread
  // unsafe array memory at runtime
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VectorOps.cosine($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
}

/** `dot_double(array<double>, array<double>)` → double. */
case class DotDouble(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_double"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dotDouble(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VectorOps.dotDouble($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotDouble =
    copy(left = l, right = r)
}

/** `dot_long(array<bigint>, array<bigint>)` → bigint. */
case class DotLong(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "dot_long"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dotLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VectorOps.dotLong($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotLong =
    copy(left = l, right = r)
}

/** `l2sq_long(array<bigint>, array<bigint>)` → bigint. */
case class L2SqLong(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "l2sq_long"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.l2sqLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VectorOps.l2sqLong($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): L2SqLong =
    copy(left = l, right = r)
}

/** `sorted_intersect_count(array<bigint>, array<bigint>)` → int.
  * Both inputs MUST be sorted ascending (callers build them with
  * `sort_array`); the merge scan silently under-counts otherwise.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_count"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.sortedIntersect(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VectorOps.sortedIntersect($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedIntersectCount =
    copy(left = l, right = r)
}

/** `srp_sig(array<double>, bits, seed)` → bigint sign-projection signature. */
case class SrpSignature(child: Expression, bits: Int, seed: Long)
    extends UnaryExpression with ExpectsInputTypes {
  require(bits > 0 && bits <= 64, "bits must be in (0, 64]")
  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = LongType
  override def prettyName: String = "srp_sig"
  override protected def nullSafeEval(v: Any): Any =
    VectorOps.srpSignature(v.asInstanceOf[ArrayData], bits, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.VectorOps.srpSignature($v, $bits, ${seed}L);")
  override protected def withNewChildInternal(c: Expression): SrpSignature = copy(child = c)
}

package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for document fingerprinting at scale.
  *
  * These compute a whole signature in ONE pass over the token array.
  * The composable-built-ins alternative (`transform(sequence(0,k-1),
  * i -> array_min(transform(toks, t -> hash(t, i))))`) materializes k
  * intermediate arrays per row — at 100 TB that's the difference between one
  * scan-local pass and k of them. All hashing uses Spark's own Murmur3/XXH64
  * so results are deterministic across executors and Spark versions on the
  * same classpath.
  */
object TextHash {

  /** Unsigned-ish 32-bit murmur of a UTF8String with the given seed. */
  @inline def murmur(s: UTF8String, seed: Int): Long =
    Murmur3_x86_32.hashUnsafeBytes(
      s.getBaseObject, s.getBaseOffset, s.numBytes, seed).toLong & 0xffffffffL

  /** One-pass k-permutation MinHash over a token/shingle array.
    *
    * Uses Kirsch–Mitzenmacher double hashing: two base murmurs per element,
    * then `h_j = h1 + j·h2` — O(n + n·k·cheap) instead of n·k full hash
    * computations, the standard trick that makes large-k MinHash viable at
    * corpus scale without changing the collision analysis.
    */
  def minhashSignature(arr: ArrayData, k: Int): ArrayData = {
    val mins = Array.fill[Long](k)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h1 = murmur(s, 0x1fb7)
        val h2 = murmur(s, 0x9c27) | 1L // odd step → full cycle mod 2^32
        var v = h1
        var j = 0
        while (j < k) {
          if (v < mins(j)) mins(j) = v
          v = (v + h2) & 0xffffffffL
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** 64-bit SimHash over a token array: per-token 64-bit hash (two murmur32
    * halves), ±1 bit votes, sign of each vote → signature bit.
    */
  def simhash64(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h = (murmur(s, 0xcafe) << 32) | murmur(s, 0xbeef)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** One-pass per-row term-frequency map over a token array: the per-doc
    * tf relation WITHOUT a (doc, term) exchange — every token of a
    * document lives in its row, so the count is scan-local by
    * construction; exploding the map yields the same (term, tf) rows a
    * `groupBy(doc_id, term).count` would shuffle the whole token stream
    * for. Keys keep first-appearance order (LinkedHashMap) so repeated
    * runs produce byte-identical maps.
    */
  def termCounts(arr: ArrayData): MapData = {
    val m = new java.util.LinkedHashMap[UTF8String, Long]()
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        m.put(s, m.getOrDefault(s, 0L) + 1L)
      }
      i += 1
    }
    val keys = new Array[AnyRef](m.size)
    val vals = new Array[Any](m.size)
    val it = m.entrySet().iterator()
    i = 0
    while (it.hasNext) {
      val e = it.next()
      keys(i) = e.getKey
      vals(i) = e.getValue
      i += 1
    }
    new ArrayBasedMapData(
      new GenericArrayData(keys), new GenericArrayData(vals))
  }

  /** Polynomial rolling hash (base 1000003, mod 2^64) over the string's UTF-8
    * bytes — the cheap streaming fingerprint for exact-dup detection where
    * md5 is overkill.
    */
  /** Count of whitespace-delimited tokens equal to `word` — ONE byte scan,
    * no token-array allocation. Bit-equivalent to
    * `size(filter(split(text, " "), t => t === word))` for any input:
    * segments are the byte runs between single 0x20 delimiters (leading /
    * trailing / consecutive spaces produce empty segments, exactly like
    * `split`'s limit=-1 semantics), and 0x20 never occurs inside a
    * multi-byte UTF-8 sequence, so byte scanning is character-correct.
    * The HOF form it replaces is CodegenFallback — interpreted per-element
    * lambda eval over a freshly-split array, per marker word per row — and
    * was the whole hot loop of the langid scorer.
    */
  def tokenCount(text: UTF8String, word: UTF8String): Int = {
    val t = text.getBytes
    val w = word.getBytes
    val n = t.length
    val wl = w.length
    var c = 0
    var s = 0
    var i = 0
    while (i <= n) {
      if (i == n || t(i) == 0x20) {
        if (i - s == wl) {
          var j = 0
          var eq = true
          while (eq && j < wl) { if (t(s + j) != w(j)) eq = false; j += 1 }
          if (eq) c += 1
        }
        s = i + 1
      }
      i += 1
    }
    c
  }

  /** DISTINCT character trigrams of a string, first-occurrence order —
    * the pg_trgm index key generator as one native pass. Equivalent to
    * `array_distinct(transform(sequence(1, length(s) - 2),
    * i -> substring(s, i, 3)))` with the `length >= 3 → else array()`
    * guard folded in; positions are CODE POINTS (surrogate pairs count
    * once), matching SQL `substring`. The HOF form allocated a sequence
    * array + interpreted the lambda per trigram per row.
    */
  def charTrigrams(s: UTF8String): ArrayData = {
    val str = s.toString
    val cps = str.codePoints().toArray
    val n = cps.length
    if (n < 3) return new GenericArrayData(Array.empty[AnyRef])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i + 3 <= n) {
      val sb = new java.lang.StringBuilder(12)
      sb.appendCodePoint(cps(i))
      sb.appendCodePoint(cps(i + 1))
      sb.appendCodePoint(cps(i + 2))
      seen.add(UTF8String.fromString(sb.toString))
      i += 1
    }
    new GenericArrayData(seen.toArray(new Array[AnyRef](seen.size())))
  }

  def rollingFingerprint(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 1469598103934665603L // FNV offset basis as a non-zero start
    var i = 0
    while (i < bytes.length) {
      h = h * 1000003L + (bytes(i) & 0xff)
      i += 1
    }
    h
  }

  /** Winnowing fingerprint selection (the MOSS sketch, Schleimer/Wilkerson/
    * Aiken, SIGMOD 2003): hash every char k-gram with the seedless
    * polynomial rolling hash (base 1000003 mod 2^64 — the [[rollingFingerprint]]
    * scheme without the FNV offset, so a gram hash is the plain
    * `Σ byte_j · B^(k-1-j)` an oracle can replay term-by-term), then slide a
    * w-gram window and select each window's minimum (leftmost position on a
    * hash tie — deterministic, no run-state dependence). Returns the DISTINCT
    * selected hashes sorted ascending (signed order, matching any engine's
    * BIGINT sort). The winnowing guarantee: any match of length ≥ w+k−1
    * between two documents shares at least one selected hash, at ~2/(w+1)
    * the grams stored.
    *
    * One streaming pass per row: the gram hashes are computed incrementally
    * (subtract the outgoing byte's `B^(k-1)` term, multiply, add) and the
    * window minimum comes from a monotonic index deque — O(n) per document
    * total, not O(n·w). Fewer than w grams degrades to one whole-document
    * window; no grams (text shorter than k) selects nothing.
    */
  def winnowSelect(s: UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = s.getBytes
    val m = bytes.length - k + 1
    if (m <= 0) return new GenericArrayData(Array.emptyLongArray)
    val h = new Array[Long](m)
    var bk1 = 1L // B^(k-1) mod 2^64
    var j = 0
    while (j < k - 1) { bk1 *= 1000003L; j += 1 }
    var cur = 0L
    j = 0
    while (j < k) { cur = cur * 1000003L + (bytes(j) & 0xff); j += 1 }
    h(0) = cur
    var i = 1
    while (i < m) {
      cur = (cur - (bytes(i - 1) & 0xff) * bk1) * 1000003L + (bytes(i + k - 1) & 0xff)
      h(i) = cur
      i += 1
    }
    // monotonic deque of gram indices; back-pop is strictly-greater only, so
    // among equal hashes the earliest index stays ahead → front is the
    // LEFTMOST argmin of the current window
    val selected = new java.util.TreeSet[java.lang.Long]()
    val dq = new Array[Int](m)
    var head = 0
    var tail = 0
    i = 0
    while (i < m) {
      while (tail > head && h(dq(tail - 1)) > h(i)) tail -= 1
      dq(tail) = i
      tail += 1
      if (i >= w - 1) {
        while (dq(head) <= i - w) head += 1
        selected.add(h(dq(head)))
      }
      i += 1
    }
    // fewer grams than the window width: one whole-document window
    if (m < w) selected.add(h(dq(head)))
    val out = new Array[Long](selected.size)
    val it = selected.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }
}

/** `minhash_sig(tokens, k)` → array<bigint> of k MinHash values. */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(numHashes > 0 && numHashes <= 1024, "numHashes must be in (0, 1024]")
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"
  override protected def nullSafeEval(input: Any): Any =
    TextHash.minhashSignature(input.asInstanceOf[ArrayData], numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHash.minhashSignature($c, $numHashes);")
  override protected def withNewChildInternal(c: Expression): MinHashSignature = copy(child = c)
}

/** `simhash64(tokens)` → bigint signature. */
case class SimHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  override protected def nullSafeEval(input: Any): Any =
    TextHash.simhash64(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHash.simhash64($c);")
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
}

/** `winnow_fp(str, k, w)` → array<bigint> of distinct winnowing-selected
  * k-gram hashes, sorted ascending (see [[TextHash.winnowSelect]]).
  */
case class WinnowSelect(child: Expression, k: Int, w: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(k > 0 && w > 0, "winnow_fp: k and w must be positive")
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fp"
  override protected def nullSafeEval(input: Any): Any =
    TextHash.winnowSelect(input.asInstanceOf[UTF8String], k, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHash.winnowSelect($c, $k, $w);")
  override protected def withNewChildInternal(c: Expression): WinnowSelect = copy(child = c)
}

/** `term_counts(tokens)` → map<string,bigint> of per-row term frequencies
  * (see [[TextHash.termCounts]]). Input type is DECLARED (unlike the
  * Column-API-only expressions above) because the SQL registration makes
  * this user-callable: without it, `term_counts(array(1, 2))` would pass
  * analysis and misread unsafe array memory at runtime.
  */
case class TermCounts(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(StringType))
  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def prettyName: String = "term_counts"
  override protected def nullSafeEval(input: Any): Any =
    TextHash.termCounts(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHash.termCounts($c);")
  override protected def withNewChildInternal(c: Expression): TermCounts = copy(child = c)
}

/** `rolling_fp(str)` → bigint rolling-hash fingerprint. */
case class RollingFingerprint(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_fp"
  override protected def nullSafeEval(input: Any): Any =
    TextHash.rollingFingerprint(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHash.rollingFingerprint($c);")
  override protected def withNewChildInternal(c: Expression): RollingFingerprint = copy(child = c)
}

/** `token_count(text, word)` → int (see [[TextHash.tokenCount]]). */
case class TokenCount(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType, StringType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "token_count"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextHash.tokenCount(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.TextHash.tokenCount($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): TokenCount =
    copy(left = l, right = r)
}

/** `char_trigrams(str)` → array<string> (see [[TextHash.charTrigrams]]). */
case class CharTrigrams(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_trigrams"
  override protected def nullSafeEval(input: Any): Any =
    TextHash.charTrigrams(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHash.charTrigrams($c);")
  override protected def withNewChildInternal(c: Expression): CharTrigrams = copy(child = c)
}

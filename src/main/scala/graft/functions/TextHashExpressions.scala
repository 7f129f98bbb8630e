package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
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

  /** Polynomial rolling hash (base 1000003, mod 2^64) over the string's UTF-8
    * bytes — the cheap streaming fingerprint for exact-dup detection where
    * md5 is overkill.
    */
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
}

/** `minhash_sig(tokens, k)` → array<bigint> of k MinHash values. */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {
  require(numHashes > 0 && numHashes <= 1024, "numHashes must be in (0, 1024]")
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
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  override protected def nullSafeEval(input: Any): Any =
    TextHash.simhash64(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHash.simhash64($c);")
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
}

/** `rolling_fp(str)` → bigint rolling-hash fingerprint. */
case class RollingFingerprint(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_fp"
  override protected def nullSafeEval(input: Any): Any =
    TextHash.rollingFingerprint(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHash.rollingFingerprint($c);")
  override protected def withNewChildInternal(c: Expression): RollingFingerprint = copy(child = c)
}

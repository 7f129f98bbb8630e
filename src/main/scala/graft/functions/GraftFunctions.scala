package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnShim

/** Column-API wrappers + SQL registration for the graft expressions. */
object GraftFunctions {

  private def toCol(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    ColumnShim.column(e)

  private def ex(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    ColumnShim.expression(c)

  def minhash_sig(tokens: Column, k: Int): Column =
    toCol(MinHashSignature(ex(tokens), k))

  def simhash64(tokens: Column): Column = toCol(SimHash64(ex(tokens)))

  def rolling_fp(s: Column): Column = toCol(RollingFingerprint(ex(s)))

  def winnow_fp(s: Column, k: Int, w: Int): Column =
    toCol(WinnowSelect(ex(s), k, w))

  def cosine_sim(a: Column, b: Column): Column = toCol(CosineSim(ex(a), ex(b)))

  def sorted_intersect_count(a: Column, b: Column): Column =
    toCol(SortedIntersectCount(ex(a), ex(b)))

  def dot_double(a: Column, b: Column): Column = toCol(DotDouble(ex(a), ex(b)))

  def dot_long(a: Column, b: Column): Column = toCol(DotLong(ex(a), ex(b)))

  def l2sq_long(a: Column, b: Column): Column = toCol(L2SqLong(ex(a), ex(b)))

  def term_counts(tokens: Column): Column = toCol(TermCounts(ex(tokens)))

  def token_count(text: Column, word: Column): Column =
    toCol(TokenCount(ex(text), ex(word)))

  def char_trigrams(s: Column): Column = toCol(CharTrigrams(ex(s)))

  def srp_sig(v: Column, bits: Int, seed: Long): Column =
    toCol(SrpSignature(ex(v), bits, seed))

  def log_template(line: Column): Column = toCol(LogTemplate(ex(line)))

  def logfmt_get(line: Column, key: Column): Column =
    toCol(LogfmtGet(ex(line), ex(key)))

  def loki_json_get(line: Column, path: Column): Column =
    toCol(LokiJsonGet(ex(line), ex(path)))

  def loki_pattern_get(line: Column, template: Column, field: Column): Column =
    toCol(LokiPatternGet(ex(line), ex(template), ex(field)))

  def loki_pattern_match(line: Column, template: Column): Column =
    toCol(LokiPatternMatch(ex(line), ex(template)))

  def loki_ip_match(value: Column, pattern: Column): Column =
    toCol(LokiIpMatch(ex(value), ex(pattern)))

  def loki_line_ip(line: Column, pattern: Column): Column =
    toCol(LokiLineIp(ex(line), ex(pattern)))

  def loki_unwrap(v: Column): Column = toCol(LokiUnwrap(ex(v)))

  def loki_duration_seconds(v: Column): Column =
    toCol(LokiDurationSeconds(ex(v)))

  def loki_bytes(v: Column): Column = toCol(LokiBytes(ex(v)))

  def loki_regexp_get(line: Column, pattern: Column, group: Column): Column =
    toCol(LokiRegexpGet(ex(line), ex(pattern), ex(group)))

  /** Word n-gram shingles from a token array, via built-in higher-order
    * functions only (stays fully inside whole-stage codegen):
    * `shingles(["a","b","c","d"], 3) = ["a b c", "b c d"]`.
    *
    * PERFORMANCE TRAP: `tokens` is referenced INSIDE the transform lambda
    * (`slice(tokens, …)`), and lambda bodies are evaluated once per output
    * ELEMENT — so passing a computed expression (e.g. `split(text, " ")`)
    * re-computes it per shingle, turning the row cost O(|tokens|) into
    * O(|tokens|²) (measured 1.4 s → 0.39 s on the sf0.1 gram explode after
    * materializing). Pass a materialized column (project the split into a
    * named column first); only the higher-order ARGUMENT position
    * (`filter(arr, …)`'s first slot) is evaluated once per row.
    */
  def shingles(tokens: Column, n: Int): Column = {
    // per-gram construction is n 1-based element_at lookups interleaved
    // with literal spaces — NOT slice + concat_ws: slice allocates a
    // fresh ArrayData per gram, and dropping it measured 1.8× on the
    // sf0.1 3-gram explode (0.56 s → 0.31 s). concat null-propagates
    // where concat_ws skipped nulls, but `split` (every caller's token
    // source) never yields null elements, so the gram strings are
    // identical.
    def gram(i: Column): Column = concat(
      (0 until n).flatMap { j =>
        val e = element_at(tokens, i + j)
        if (j == 0) Seq(e) else Seq(lit(" "), e)
      }: _*)
    when(size(tokens) >= n,
      transform(sequence(lit(1), size(tokens) - (n - 1)), gram(_)))
      .otherwise(array(concat_ws(" ", tokens)))
  }

  private type Expr = org.apache.spark.sql.catalyst.expressions.Expression

  private def intArg(es: Seq[Expr], i: Int): Int =
    es(i).eval().asInstanceOf[Number].intValue()
  private def longArg(es: Seq[Expr], i: Int): Long =
    es(i).eval().asInstanceOf[Number].longValue()

  /** (name → builder) pairs consumed by BOTH SQL registration paths —
    * one list so extension injection and temp-function registration
    * cannot drift (they were maintained as two verbatim copies, and
    * srp_sig had already drifted: Column-API-only, absent from both).
    */
  private val sqlBuilders: Seq[(String, Seq[Expr] => Expr)] = Seq(
    "minhash_sig" -> (es => MinHashSignature(es.head, intArg(es, 1))),
    "simhash64" -> (es => SimHash64(es.head)),
    "rolling_fp" -> (es => RollingFingerprint(es.head)),
    "winnow_fp" -> (es => WinnowSelect(es.head, intArg(es, 1), intArg(es, 2))),
    "cosine_sim" -> (es => CosineSim(es.head, es(1))),
    "term_counts" -> (es => TermCounts(es.head)),
    "token_count" -> (es => TokenCount(es.head, es(1))),
    "char_trigrams" -> (es => CharTrigrams(es.head)),
    "sorted_intersect_count" -> (es => SortedIntersectCount(es.head, es(1))),
    "dot_double" -> (es => DotDouble(es.head, es(1))),
    "dot_long" -> (es => DotLong(es.head, es(1))),
    "l2sq_long" -> (es => L2SqLong(es.head, es(1))),
    "srp_sig" -> (es => SrpSignature(es.head, intArg(es, 1), longArg(es, 2))),
    "log_template" -> (es => LogTemplate(es.head)),
    "logfmt_get" -> (es => LogfmtGet(es.head, es(1))),
    "loki_json_get" -> (es => LokiJsonGet(es.head, es(1))),
    "loki_pattern_get" -> (es => LokiPatternGet(es.head, es(1), es(2))),
    "loki_pattern_match" -> (es => LokiPatternMatch(es.head, es(1))),
    "loki_ip_match" -> (es => LokiIpMatch(es.head, es(1))),
    "loki_line_ip" -> (es => LokiLineIp(es.head, es(1))),
    "loki_unwrap" -> (es => LokiUnwrap(es.head)),
    "loki_duration_seconds" -> (es => LokiDurationSeconds(es.head)),
    "loki_bytes" -> (es => LokiBytes(es.head)),
    "loki_regexp_get" -> (es => LokiRegexpGet(es.head, es(1), es(2))))

  /** Make the custom expressions SQL-callable in every session built with
    * [[graft.plans.GraftExtensions]].
    */
  def inject(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    sqlBuilders.foreach { case (name, build) =>
      e.injectFunction(
        (FunctionIdentifier(name), new ExpressionInfo("graft", name), build))
    }
  }

  /** Register SQL names for the custom expressions on this session. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    sqlBuilders.foreach { case (name, build) =>
      reg.createOrReplaceTempFunction(name, build, "scala_udf")
    }
  }
}

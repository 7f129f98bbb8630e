package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native log-template normalizer — the hot loop of pattern mining
  * (`loki_log_patterns` / `loki_drain_templates`): every scanned line is
  * normalized before anything else happens, so at corpus scale this
  * projection IS the operator's CPU. The composable alternative is four
  * chained `regexp_replace` calls; each is a full `java.util.regex` pass
  * with per-position backtracking machinery, and the chain re-materializes
  * the string three times even when nothing matches. This implementation
  * makes four HAND passes (uuid → ip → hex → num, the
  * [[graft.operators.ConnectorOps]] rule order) with plain char scans, and
  * a pass that matches nothing returns its input UNALLOCATED — the common
  * case for most classes on most lines.
  *
  * Semantics are EXACTLY the regex chain's (the DuckDB oracle replays that
  * chain, so any divergence fails the driver gate; LogTemplateProps pins
  * equivalence against `String.replaceAll` on adversarial inputs):
  *
  *   - uuid: the fixed 8-4-4-4-12 hex shape, ANY case, NO word-boundary
  *     requirement (matches mid-token, like the rule).
  *   - ip: four maximal digit runs of length 1-3 joined by '.', word
  *     boundaries on both ends. A 4+-digit segment fails the whole match —
  *     the backtracking outcome of `\d{1,3}\.`: any shorter prefix of the
  *     run is followed by a digit, never '.'.
  *   - hex: a whole word-char token (boundaries = ASCII \w transitions,
  *     Java's and RE2's shared default) that is entirely lowercase hex,
  *     length ≥ 8, containing at least one a-f letter. This is what the
  *     rule's by-first-letter-position alternation denotes: every
  *     alternative is anchored `\b…\b` and every interior end position
  *     precedes a word char, so a match can only span a full all-hex token.
  *   - num: a maximal digit run with one optional '.'+digits fraction, no
  *     boundary requirement.
  *
  * Scanning resumes AFTER each replacement (java.util.regex's replaceAll
  * contract), and each pass runs on the PREVIOUS pass's output — the
  * sequential-passes semantics matter: a uuid consumes hex runs that the
  * hex pass must never see, which is why this is four cheap passes rather
  * than one prioritized scan (a single scan classifies `123550e8400…` as a
  * hex token before discovering the uuid starting three chars in).
  */
object LogTemplateUtil {

  @inline private def isWord(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '_'
  @inline private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'
  @inline private def isHexAny(c: Char): Boolean =
    isDigit(c) || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')
  @inline private def isHexLower(c: Char): Boolean =
    isDigit(c) || (c >= 'a' && c <= 'f')

  /** One scan-and-replace pass: `matchEnd(s, i)` returns the exclusive
    * match end at position i or -1. Allocation-free when nothing matches.
    */
  private def pass(s: String, rep: String)(matchEnd: (String, Int) => Int): String = {
    val n = s.length
    var i = 0
    var sb: java.lang.StringBuilder = null
    while (i < n) {
      val e = matchEnd(s, i)
      if (e > i) {
        if (sb == null) {
          sb = new java.lang.StringBuilder(n + 16)
          sb.append(s, 0, i)
        }
        sb.append(rep)
        i = e
      } else {
        if (sb != null) sb.append(s.charAt(i))
        i += 1
      }
    }
    if (sb == null) s else sb.toString
  }

  private def uuidEnd(s: String, i: Int): Int = {
    if (i + 36 > s.length) return -1
    var p = i
    var g = 0
    while (g < 5) {
      val len = if (g == 0) 8 else if (g == 4) 12 else 4
      var k = 0
      while (k < len) {
        if (!isHexAny(s.charAt(p))) return -1
        p += 1; k += 1
      }
      if (g < 4) {
        if (s.charAt(p) != '-') return -1
        p += 1
      }
      g += 1
    }
    p
  }

  private def ipEnd(s: String, i: Int): Int = {
    if (i > 0 && isWord(s.charAt(i - 1))) return -1
    val n = s.length
    var p = i
    var seg = 0
    while (seg < 4) {
      val start = p
      while (p < n && isDigit(s.charAt(p))) p += 1
      val run = p - start
      if (run < 1 || run > 3) return -1
      if (seg < 3) {
        if (p >= n || s.charAt(p) != '.') return -1
        p += 1
      }
      seg += 1
    }
    if (p < n && isWord(s.charAt(p))) return -1
    p
  }

  private def hexEnd(s: String, i: Int): Int = {
    if (i > 0 && isWord(s.charAt(i - 1))) return -1
    if (!isWord(s.charAt(i))) return -1
    val n = s.length
    var p = i
    var hasLetter = false
    var allHex = true
    while (p < n && isWord(s.charAt(p))) {
      val c = s.charAt(p)
      if (isHexLower(c)) {
        if (!isDigit(c)) hasLetter = true
      } else allHex = false
      p += 1
    }
    if (allHex && hasLetter && p - i >= 8) p else -1
  }

  private def numEnd(s: String, i: Int): Int = {
    if (!isDigit(s.charAt(i))) return -1
    val n = s.length
    var p = i
    while (p < n && isDigit(s.charAt(p))) p += 1
    if (p + 1 < n && s.charAt(p) == '.' && isDigit(s.charAt(p + 1))) {
      p += 1
      while (p < n && isDigit(s.charAt(p))) p += 1
    }
    p
  }

  def template(s: String): String = {
    val a = pass(s, "<uuid>")(uuidEnd)
    val b = pass(a, "<ip>")(ipEnd)
    val c = pass(b, "<hex>")(hexEnd)
    pass(c, "<num>")(numEnd)
  }

  def template(s: UTF8String): UTF8String = {
    val in = s.toString
    val out = template(in)
    if (out eq in) s else UTF8String.fromString(out)
  }
}

/** `log_template(line)` → the typed-placeholder template (see
  * [[LogTemplateUtil]]).
  */
case class LogTemplate(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "log_template"
  override protected def nullSafeEval(input: Any): Any =
    LogTemplateUtil.template(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.LogTemplateUtil.template($c);")
  override protected def withNewChildInternal(c: Expression): LogTemplate = copy(child = c)
}

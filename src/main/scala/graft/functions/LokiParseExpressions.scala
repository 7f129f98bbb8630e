package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.loki.LokiParsers

/** Host-side accessors with LOKI parser-stage semantics (round 15) —
  * the SQL-visible face of `| logfmt` / `| json` label extraction, so a
  * predicate or grouping over them translates to a pushed pipeline
  * stage EXACTLY (the expression and the wire conformance surface run
  * the same [[LokiParsers]] code — see its scaladoc for the value
  * model: missing ≡ empty ≡ parse-failure ≡ SQL NULL).
  *
  * `get_json_object(line, '$.k')` remains supported for the equality
  * pushdown idiom (its Jackson streaming semantics are property-pinned
  * against [[LokiParsers.jsonGet]] on the pushable shapes), but only
  * these expressions carry the full op surface (!=, =~, !~, GROUP BY):
  * Spark's function returns '' for an empty json string value where the
  * label model must read ABSENT, and only an expression owning both
  * sides can promise exactness there.
  */
case class LogfmtGet(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType, StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "logfmt_get"
  override protected def nullSafeEval(line: Any, key: Any): Any =
    LokiParsers.logfmtGetUTF8(
      line.asInstanceOf[UTF8String], key.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, k) =>
      s"""${ev.value} = graft.sources.loki.LokiParsers.logfmtGetUTF8($l, $k);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LogfmtGet =
    copy(left = newLeft, right = newRight)
}

/** `loki_pattern_get(line, '<ip> - <user> [<ts>]', 'user')` — Loki
  * `| pattern` capture extraction (see [[LokiParsers.patternGet]]:
  * both-ends-anchored template, lazy captures, non-match / invalid
  * template / absent / empty capture ≡ SQL NULL).
  */
case class LokiPatternGet(
    first: Expression, second: Expression, third: Expression)
  extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
  with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(StringType, StringType, StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "loki_pattern_get"
  override protected def nullSafeEval(line: Any, tmpl: Any, field: Any): Any =
    LokiParsers.patternGetUTF8(
      line.asInstanceOf[UTF8String], tmpl.asInstanceOf[UTF8String],
      field.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, t, f) =>
      s"""${ev.value} = graft.sources.loki.LokiParsers.patternGetUTF8($l, $t, $f);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): LokiPatternGet =
    copy(first = f, second = s, third = t)
}

/** `loki_pattern_match(line, '<_>error<_>')` — the Loki 3.x pattern
  * LINE FILTERS `|>` / `!>` (round 16; see
  * [[LokiParsers.patternMatchUTF8]]): boolean anchored-template match
  * with the `| pattern` parser's own matcher, so a predicate over it
  * translates to a pushed `|> `tmpl`` / `!> `tmpl`` stage exactly.
  * Invalid template ≡ SQL NULL (never pushed — the translator requires
  * a compiling template; real Loki rejects such queries at parse).
  */
case class LokiPatternMatch(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType, StringType)
  override def dataType: DataType =
    org.apache.spark.sql.types.BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "loki_pattern_match"
  override protected def nullSafeEval(line: Any, tmpl: Any): Any =
    LokiParsers.patternMatchUTF8(
      line.asInstanceOf[UTF8String], tmpl.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, { (l, t) =>
      val tmp = ctx.freshName("patmatch")
      s"""java.lang.Boolean $tmp =
         |  graft.sources.loki.LokiParsers.patternMatchUTF8($l, $t);
         |${ev.isNull} = $tmp == null;
         |${ev.value} = ${ev.isNull} ? false : $tmp.booleanValue();""".stripMargin
    })
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LokiPatternMatch =
    copy(left = newLeft, right = newRight)
}

/** `loki_ip_match(labels['addr'], '10.0.0.0/16')` — the ip() LABEL
  * filter (round 16; see [[LokiParsers.ipMatchUTF8]]): the whole value
  * parses as an IPv4 inside the pattern's range (single / "a-b" range /
  * CIDR). Unparsable value → false (so the negation keeps it);
  * pattern outside the IPv4 subset → SQL NULL (never pushed).
  */
case class LokiIpMatch(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType, StringType)
  override def dataType: DataType =
    org.apache.spark.sql.types.BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "loki_ip_match"
  override protected def nullSafeEval(v: Any, p: Any): Any =
    LokiParsers.ipMatchUTF8(
      v.asInstanceOf[UTF8String], p.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, { (v, p) =>
      val tmp = ctx.freshName("ipmatch")
      s"""java.lang.Boolean $tmp =
         |  graft.sources.loki.LokiParsers.ipMatchUTF8($v, $p);
         |${ev.isNull} = $tmp == null;
         |${ev.value} = ${ev.isNull} ? false : $tmp.booleanValue();""".stripMargin
    })
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LokiIpMatch =
    copy(left = newLeft, right = newRight)
}

/** `loki_line_ip(line, '10.0.0.5-10.0.0.59')` — the ip() LINE filter
  * (round 16; see [[LokiParsers.lineContainsIp]] for the shared
  * candidate-boundary rule): does the line contain an IPv4 in range?
  * Predicates over it push as `|= ip("…")` / `!= ip("…")`.
  */
case class LokiLineIp(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType, StringType)
  override def dataType: DataType =
    org.apache.spark.sql.types.BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "loki_line_ip"
  override protected def nullSafeEval(l: Any, p: Any): Any =
    LokiParsers.lineIpUTF8(
      l.asInstanceOf[UTF8String], p.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, { (l, p) =>
      val tmp = ctx.freshName("lineip")
      s"""java.lang.Boolean $tmp =
         |  graft.sources.loki.LokiParsers.lineIpUTF8($l, $p);
         |${ev.isNull} = $tmp == null;
         |${ev.value} = ${ev.isNull} ? false : $tmp.booleanValue();""".stripMargin
    })
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LokiLineIp =
    copy(left = newLeft, right = newRight)
}

/** `loki_regexp_get(line, '(?<ev>[a-z]+) took (?<ms>\\d+)', 'ms')` —
  * Loki `| regexp` named-capture extraction (round 16; see
  * [[LokiParsers.regexpGet]]): Java-dialect pattern, unanchored find,
  * no-match / no-such-group / empty capture / uncompilable pattern ≡
  * SQL NULL. Predicates and GROUP BYs over it push as a `| regexp`
  * stage when [[graft.sources.loki.LogQL.javaToRe2Named]] accepts the
  * pattern.
  */
case class LokiRegexpGet(
    first: Expression, second: Expression, third: Expression)
  extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
  with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(StringType, StringType, StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "loki_regexp_get"
  override protected def nullSafeEval(line: Any, pat: Any, grp: Any): Any =
    LokiParsers.regexpGetUTF8(
      line.asInstanceOf[UTF8String], pat.asInstanceOf[UTF8String],
      grp.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, p, g) =>
      s"""${ev.value} = graft.sources.loki.LokiParsers.regexpGetUTF8($l, $p, $g);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): LokiRegexpGet =
    copy(first = f, second = s, third = t)
}

/** `loki_unwrap(v)` — Loki `| unwrap` numeric conversion of an extracted
  * label value (round 16; see [[LokiParsers.unwrapValue]] for the
  * Go-ParseFloat model): NULL in, unparsable, or out-of-range ⇒ SQL NULL
  * — exactly the rows a pushed `| unwrap gpN | __error__=""` drops, so
  * `avg(loki_unwrap(logfmt_get(line,'duration')))` translates to
  * `avg_over_time(… | unwrap gpN …)` exactly. A plain
  * `CAST(… AS DOUBLE)` does NOT translate (Spark's cast trims
  * whitespace and accepts `1.5d` suffixes the wire conversion rejects).
  */
case class LokiUnwrap(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "loki_unwrap"
  override protected def nullSafeEval(v: Any): Any =
    LokiParsers.unwrapUTF8(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, { v =>
      val tmp = ctx.freshName("unwrapped")
      s"""java.lang.Double $tmp = graft.sources.loki.LokiParsers.unwrapUTF8($v);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.doubleValue(); }""".stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): LokiUnwrap =
    copy(child = newChild)
}

/** `loki_duration_seconds(v)` — Loki `| unwrap duration_seconds(x)`
  * conversion (Go time.ParseDuration model, see
  * [[LokiParsers.durationSeconds]]): `"250ms"` → 0.25, `"1h30m"` →
  * 5400.0; unparsable / missing-unit / NULL ⇒ SQL NULL ≡ the wire's
  * error-filtered row.
  */
case class LokiDurationSeconds(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "loki_duration_seconds"
  override protected def nullSafeEval(v: Any): Any =
    LokiParsers.durationSecondsUTF8(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, { v =>
      val tmp = ctx.freshName("durSecs")
      s"""java.lang.Double $tmp = graft.sources.loki.LokiParsers.durationSecondsUTF8($v);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.doubleValue(); }""".stripMargin
    })
  override protected def withNewChildInternal(
      newChild: Expression): LokiDurationSeconds = copy(child = newChild)
}

/** `loki_bytes(v)` — Loki `| unwrap bytes(x)` conversion (go-humanize
  * ParseBytes model, see [[LokiParsers.bytesValue]]): `"3 MiB"` →
  * 3145728.0, `"5kB"` → 5000.0.
  */
case class LokiBytes(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "loki_bytes"
  override protected def nullSafeEval(v: Any): Any =
    LokiParsers.bytesValueUTF8(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, { v =>
      val tmp = ctx.freshName("bytesVal")
      s"""java.lang.Double $tmp = graft.sources.loki.LokiParsers.bytesValueUTF8($v);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.doubleValue(); }""".stripMargin
    })
  override protected def withNewChildInternal(
      newChild: Expression): LokiBytes = copy(child = newChild)
}

/** `loki_json_get(line, 'a.b')` — jsonexpr-style dotted-path extraction
  * (see [[LokiParsers.jsonGet]]).
  */
case class LokiJsonGet(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType, StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "loki_json_get"
  override protected def nullSafeEval(line: Any, path: Any): Any =
    LokiParsers.jsonGetUTF8(
      line.asInstanceOf[UTF8String], path.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, p) =>
      s"""${ev.value} = graft.sources.loki.LokiParsers.jsonGetUTF8($l, $p);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LokiJsonGet =
    copy(left = newLeft, right = newRight)
}

package graft.sources.loki

import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties for the metadata-response decoders
  * ([[LokiHttp.parseStringArray]] / [[LokiHttp.parseObjectArray]]): an
  * independently-written JSON encoder in the generator round-trips
  * through the production parser for arbitrary label names/values —
  * quotes, backslashes, braces, brackets, control chars, unicode. Lives
  * in the source package (the decoders are private[loki] by design).
  */
object LokiHttpProps extends Properties("LokiHttpCodec") {

  /** Independent JSON string encoder — deliberately a DIFFERENT (but
    * equally standards-valid) representation from the stub's `jsonStr`:
    * `\n`/`\r`/`\t` go out as `\u000a`-style escapes instead of the
    * shorthand, `\b`/`\f`/`\/` use the shorthand escapes the stub never
    * emits, and `/` is escaped. A decoder blind spot shared with the
    * stub's encoding choices (e.g. the `\b`→literal-'b' mis-decode this
    * suite originally could not see) cannot hide behind representation
    * overlap.
    */
  private def enc(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '/' => "\\/"
      case '\b' => "\\b"
      case '\f' => "\\f"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private val hard: Gen[String] =
    Gen.chooseNum(0, 8).flatMap(len => Gen.listOfN(len, Gen.frequency(
      5 -> Gen.alphaNumChar,
      2 -> Gen.oneOf('"', '\\', '{', '}', '[', ']', ',', ':', '/'),
      1 -> Gen.oneOf('\n', '\t', '\b', '\f', '\u0001'),
      1 -> Gen.oneOf('é', '日'))).map(_.mkString))

  /** Threw AND carried the decoder's own diagnostic: a bare
    * `Prop.throws(classOf[RuntimeException])` also accepts an
    * accidental StringIndexOutOfBounds/NumberFormat crash, shipping a
    * regression as a "loud failure".
    */
  private def diesWith(substr: String)(f: => Any): Prop =
    try { f; Prop.falsified } catch {
      case e: RuntimeException =>
        Prop(e.getMessage != null && e.getMessage.contains(substr))
    }

  property("parseStringArray inverts encoding for any value bytes") =
    Prop.forAll(Gen.listOf(hard).map(_.take(6))) { vs =>
      val body =
        s"""{"status":"success","data":[${vs.map(enc).mkString(",")}]}"""
      LokiHttp.parseStringArray(body) == vs
    }

  property("parseObjectArray inverts encoding for any label maps") =
    Prop.forAll(Gen.listOf(Gen.listOf(Gen.zip(
      Gen.identifier.map(_.take(6)), hard)).map(_.take(4))).map(_.take(4))) { objs =>
      // distinct keys per object (JSON object semantics)
      val clean = objs.map(_.distinctBy(_._1))
      val body = s"""{"status":"success","data":[${
        clean.map(o => "{" + o.map { case (k, v) => s"${enc(k)}:${enc(v)}" }
          .mkString(",") + "}").mkString(",")
      }]}"""
      LokiHttp.parseObjectArray(body) == clean
    }

  /** (metric kvs, samples) generator for the volume decoder: arbitrary
    * label bytes, non-negative values, optionally fractional sample
    * timestamps (Prometheus renders them either way).
    */
  private val seriesGen: Gen[(List[(String, String)], List[(Long, Long)])] =
    Gen.zip(
      Gen.listOf(Gen.zip(Gen.identifier.map(_.take(6)), hard)).map(_.take(4))
        .map(_.distinctBy(_._1)),
      Gen.nonEmptyListOf(Gen.zip(
        Gen.chooseNum(0L, 4102444800L),
        Gen.chooseNum(0L, Long.MaxValue / 2))).map(_.take(5)))

  private def encSeries(
      metric: List[(String, String)],
      samples: List[(Long, Long)],
      matrix: Boolean,
      frac: Boolean): String = {
    val m = "{" + metric.map { case (k, v) => s"${enc(k)}:${enc(v)}" }
      .mkString(",") + "}"
    def ts(t: Long) = if (frac) s"$t.000" else t.toString
    if (matrix) {
      val vs = samples.map { case (t, v) => s"[${ts(t)},${enc(v.toString)}]" }
        .mkString(",")
      s"""{"metric":$m,"values":[$vs]}"""
    } else
      s"""{"metric":$m,"value":[${ts(samples.head._1)},${enc(samples.head._2.toString)}]}"""
  }

  property("parseMetricSamples inverts vector/matrix encoding for any labels") =
    Prop.forAll(
      Gen.listOf(seriesGen).map(_.take(4)),
      Gen.oneOf(true, false),
      Gen.oneOf(true, false)) { (series, matrix, frac) =>
      val kept = series.map { case (m, ss) =>
        (m, if (matrix) ss else ss.take(1))
      }
      val body = s"""{"status":"success","data":{"resultType":"${
        if (matrix) "matrix" else "vector"}","result":[${
        kept.map { case (m, ss) => encSeries(m, ss, matrix, frac) }.mkString(",")
      }]}}"""
      LokiHttp.parseMetricSamples(body) == kept
    }

  property("truncated / malformed volume bodies fail loudly") =
    Prop.forAll(seriesGen) { case (m, ss) =>
      val whole = s"""{"status":"success","data":{"resultType":"matrix",""" +
        s""""result":[${encSeries(m, ss, matrix = true, frac = false)}]}}"""
      diesWith("truncated")(
        LokiHttp.parseMetricSamples(whole.dropRight(3))) &&
        diesWith("has no result field")(
          LokiHttp.parseMetricSamples("""{"status":"success","data":{}}""")) &&
        diesWith("element has no value")(
          LokiHttp.parseMetricSamples(
            """{"status":"success","data":{"result":[{"metric":{}}]}}""")) &&
        // an unpaired metric key (truncated/corrupt object) dies rather
        // than misattributing the series to a shorter label set
        diesWith("unpaired metric key")(
          LokiHttp.parseMetricSamples(
            """{"status":"success","data":{"result":[""" +
              """{"metric":{"a":"b","c"},"value":[1,"2"]}]}}""")) &&
        // a non-integer sample value dies with the decoder's own
        // diagnostic, not a context-free NumberFormatException
        diesWith("non-integer sample value")(
          LokiHttp.parseMetricSamples(
            """{"status":"success","data":{"result":[""" +
              """{"metric":{"a":"b"},"value":[1,"2.5"]}]}}"""))
    }

  property("truncated / malformed metadata bodies fail loudly") =
    Prop.forAll(hard) { v =>
      val whole = s"""{"status":"success","data":[${enc(v)}]}"""
      diesWith("truncated")(
        LokiHttp.parseStringArray(whole.dropRight(2))) &&
        diesWith("has no data field")(
          LokiHttp.parseStringArray("""{"status":"success"}""")) &&
        diesWith("truncated")(
          LokiHttp.parseObjectArray(
            s"""{"status":"success","data":[{${enc("k")}:${enc(v)}"""))
    }
}

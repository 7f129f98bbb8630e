package graft.sources.loki

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

/** Minimal HTTP helpers over the JDK client. One shared client per JVM:
  * HttpClient is immutable and thread-safe, and a client per request would
  * pay connection setup on every partition scan / push batch — needless
  * churn on the N-partition scale-out path. Endpoints used (reference wire
  * surface):
  *   - GET  /loki/api/v1/status/buildinfo   (table.rs:60-73)
  *   - GET  /loki/api/v1/query_range        (scan.rs:177-216)
  *   - POST /loki/api/v1/push               (insert.rs:142-165)
  */
object LokiHttp {

  private lazy val client: HttpClient =
    HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(10)).build()

  /** Transient statuses a retry can heal: throttling and gateway/server
    * hiccups. 4xx contract errors (bad query, over-limit) are permanent
    * and fail immediately.
    */
  private def transient(status: Int): Boolean =
    status == 429 || status == 500 || status == 502 || status == 503 ||
      status == 504

  /** Bounded retry with exponential backoff + jitter for the wire calls.
    * A 100 TB paged scan issues thousands of requests per task; without
    * in-reader retry a single transient 503 fails the TASK and Spark
    * re-reads the whole partition's pages. All retried calls are safe:
    * the GETs are idempotent, and the push POST is at-least-once by the
    * sink contract (identical (ts, labels, line) replays collapse
    * server-side). Connection-level IOExceptions retry on the same
    * schedule; interruption propagates immediately (a cancelled task
    * must not sit in backoff).
    */
  private def withRetry[T](what: String)(send: () => HttpResponse[T])(
      status: HttpResponse[T] => Int): HttpResponse[T] = {
    val attempts = 4
    var k = 0
    var last: Either[Throwable, HttpResponse[T]] = null
    while (k < attempts) {
      if (k > 0) {
        val backoffMs = (200L << (k - 1)) +
          java.util.concurrent.ThreadLocalRandom.current().nextLong(100L)
        Thread.sleep(backoffMs)
      }
      try {
        val resp = send()
        if (!transient(status(resp))) return resp
        last = Right(resp)
      } catch {
        case ie: InterruptedException => throw ie
        case io: java.io.IOException => last = Left(io)
      }
      k += 1
    }
    last match {
      case Right(resp) => resp // caller renders the terminal status error
      case Left(io) => throw new RuntimeException(
        s"Loki $what failed after $attempts attempts: ${io.getMessage}", io)
    }
  }

  def checkConnection(endpoint: String): Unit = {
    val req = HttpRequest.newBuilder(URI.create(s"$endpoint/loki/api/v1/status/buildinfo"))
      .timeout(Duration.ofSeconds(10)).GET().build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() != 200) {
      throw new IllegalStateException(
        s"Loki connection check failed: HTTP ${resp.statusCode()} from $endpoint")
    }
  }

  /** query_range with the parquet wire encoding (scan.rs:120:
    * `Accept: application/vnd.apache.parquet`; requires Loki's
    * `frontend.support_parquet_encoding`). Returns the raw body.
    */
  def queryRange(
      endpoint: String,
      logql: String,
      startNs: Long,
      endNs: Long,
      limit: Option[Int],
      // Some("forward") is the PAGINATION path (reader cursor walks the
      // window oldest-first); Some("backward") is the explicit newest-n
      // `direction` option; None omits the param like the reference
      // (scan.rs:106-121), leaving Loki's default direction (backward)
      direction: Option[String] = None): Array[Byte] = {
    val enc = java.net.URLEncoder.encode(logql, "UTF-8")
    val limitParam = limit.map(n => s"&limit=$n").getOrElse("")
    val dirParam = direction.map(d => s"&direction=$d").getOrElse("")
    val uri = URI.create(
      s"$endpoint/loki/api/v1/query_range?query=$enc&start=$startNs&end=$endNs$limitParam$dirParam")
    val req = HttpRequest.newBuilder(uri)
      .timeout(Duration.ofMinutes(5))
      .header("Accept", "application/vnd.apache.parquet")
      .GET().build()
    val resp = withRetry("query_range")(() =>
      client.send(req, HttpResponse.BodyHandlers.ofByteArray()))(_.statusCode())
    if (resp.statusCode() != 200) {
      throw new RuntimeException(
        s"Loki query_range failed: HTTP ${resp.statusCode()}: " +
          new String(resp.body(), "UTF-8").take(500))
    }
    resp.body()
  }

  /** query_range in METRIC mode — a LogQL metric query (`sum by (…)
    * (count_over_time({…}[step]))`) answered as a Prometheus-style JSON
    * matrix instead of a log stream. This is the 100 TB aggregation
    * path: the server evaluates the range aggregation next to its chunks
    * and ships back #series × #steps samples, not rows. `stepNs` must be
    * a positive whole-second multiple — the `step` param speaks duration
    * seconds and the response's sample timestamps carry second precision
    * (the same contract [[indexVolumeRange]] enforces).
    */
  def queryRangeMetric(
      endpoint: String,
      logql: String,
      startNs: Long,
      endNs: Long,
      stepNs: Long): Seq[(Seq[(String, String)], Seq[(Long, Long)])] = {
    require(stepNs > 0 && stepNs % 1000000000L == 0,
      s"metric query step must be a positive whole-second multiple of ns, " +
        s"got $stepNs")
    val enc = java.net.URLEncoder.encode(logql, "UTF-8")
    parseMetricSamples(getJson("query_range(metric)", URI.create(
      s"$endpoint/loki/api/v1/query_range?query=$enc&start=$startNs" +
        s"&end=$endNs&step=${stepNs / 1000000000L}s")))
  }

  /** [[queryRangeMetric]] with FLOAT sample values — unwrapped range
    * aggregations (`avg_over_time(… | unwrap x …)`) carry float64
    * samples where the entry-counting kinds are whole numbers. Integer
    * kinds decode exactly through this path too (float64 is exact to
    * 2^53, far past any per-bucket entry/byte count), so the metric
    * reader uses it uniformly.
    */
  def queryRangeMetricD(
      endpoint: String,
      logql: String,
      startNs: Long,
      endNs: Long,
      stepNs: Long): Seq[(Seq[(String, String)], Seq[(Long, Double)])] = {
    require(stepNs > 0 && stepNs % 1000000000L == 0,
      s"metric query step must be a positive whole-second multiple of ns, " +
        s"got $stepNs")
    val enc = java.net.URLEncoder.encode(logql, "UTF-8")
    parseMetricSamplesD(getJson("query_range(metric)", URI.create(
      s"$endpoint/loki/api/v1/query_range?query=$enc&start=$startNs" +
        s"&end=$endNs&step=${stepNs / 1000000000L}s")))
  }

  /** `GET /loki/api/v1/index/stats` — entry count for a stream SELECTOR
    * over [startNs, endNs). Powers the `split=stats` plan-time boundary
    * placement: index-only, so each probe is cheap on real Loki (it reads
    * the TSDB index, not chunks). Real Loki accepts only a stream
    * selector here (no line-filter stages), which is fine for balancing —
    * line-filter selectivity shifts slice sizes uniformly, not boundaries.
    * Returns the `entries` field.
    */
  def indexStats(
      endpoint: String,
      selector: String,
      startNs: Long,
      endNs: Long): Long =
    indexStatsFull(endpoint, selector, startNs, endNs)._1

  /** index/stats `(entries, bytes)` — the scan-statistics report needs
    * both (row count for join planning, bytes for the broadcast size
    * estimate); [[indexStats]] keeps the entries-only shape its callers
    * use.
    */
  def indexStatsFull(
      endpoint: String,
      selector: String,
      startNs: Long,
      endNs: Long): (Long, Long) = {
    val enc = java.net.URLEncoder.encode(selector, "UTF-8")
    val uri = URI.create(
      s"$endpoint/loki/api/v1/index/stats?query=$enc&start=$startNs&end=$endNs")
    val req = HttpRequest.newBuilder(uri)
      .timeout(Duration.ofSeconds(30)).GET().build()
    val resp = withRetry("index/stats")(() =>
      client.send(req, HttpResponse.BodyHandlers.ofString()))(_.statusCode())
    if (resp.statusCode() != 200) {
      throw new RuntimeException(
        s"Loki index/stats failed: HTTP ${resp.statusCode()}: ${resp.body().take(500)}")
    }
    // {"streams":S,"chunks":C,"bytes":B,"entries":E}
    def field(name: String): Long = {
      val m = java.util.regex.Pattern.compile("\"" + name + "\"\\s*:\\s*(\\d+)")
        .matcher(resp.body())
      if (!m.find()) throw new RuntimeException(
        s"Loki index/stats: no $name field in: ${resp.body().take(200)}")
      m.group(1).toLong
    }
    (field("entries"), field("bytes"))
  }

  /** Minimal parse of the metadata response shape
    * `{"status":"success","data":["a","b",…]}` → the data strings.
    * Handles the standard JSON escapes; anything structurally off fails
    * loudly with the body prefix.
    */
  private[loki] def parseStringArray(body: String): Seq[String] = {
    val start = dataArrayStart(body)
    val end = scanToCloser(body, start, ']')
    if (end < 0) throw new RuntimeException(
      s"Loki metadata response truncated: ${body.take(200)}")
    parseStringArrayRaw(body.substring(start, end))
  }

  /** Index just past the `"data"` field's `[`; loud on a missing field. */
  private def dataArrayStart(body: String): Int = {
    val di = body.indexOf("\"data\"")
    if (di < 0) throw new RuntimeException(
      s"Loki metadata response has no data field: ${body.take(200)}")
    val bi = body.indexOf('[', di)
    if (bi < 0) throw new RuntimeException(
      s"Loki metadata data field is not an array: ${body.take(200)}")
    bi + 1
  }

  /** First `closer` at/after `from` OUTSIDE any quoted string (escape
    * aware), or −1.
    */
  private def scanToCloser(body: String, from: Int, closer: Char): Int = {
    var i = from
    var inStr = false
    while (i < body.length) {
      val c = body.charAt(i)
      if (inStr) {
        if (c == '\\') i += 1
        else if (c == '"') inStr = false
      } else if (c == '"') inStr = true
      else if (c == closer) return i
      i += 1
    }
    -1
  }

  private def getJson(what: String, uri: URI): String = {
    val req = HttpRequest.newBuilder(uri)
      .timeout(Duration.ofSeconds(30)).GET().build()
    val resp = withRetry(what)(() =>
      client.send(req, HttpResponse.BodyHandlers.ofString()))(_.statusCode())
    if (resp.statusCode() != 200) throw new RuntimeException(
      s"Loki $what failed: HTTP ${resp.statusCode()}: ${resp.body().take(500)}")
    resp.body()
  }

  /** `GET /loki/api/v1/labels` — distinct label names in the window.
    * The window is always sent explicitly: real Loki's metadata default
    * (last 6 h) silently narrows an unwindowed census.
    */
  def labelNames(endpoint: String, startNs: Long, endNs: Long): Seq[String] =
    parseStringArray(getJson("labels", URI.create(
      s"$endpoint/loki/api/v1/labels?start=$startNs&end=$endNs")))

  /** `GET /loki/api/v1/label/<name>/values` — distinct values of one
    * label; `selector` (optional) narrows to matching streams.
    */
  def labelValues(
      endpoint: String,
      label: String,
      startNs: Long,
      endNs: Long,
      selector: Option[String] = None): Seq[String] = {
    val q = selector.map(s =>
      "&query=" + java.net.URLEncoder.encode(s, "UTF-8")).getOrElse("")
    val name = java.net.URLEncoder.encode(label, "UTF-8")
    parseStringArray(getJson("label_values", URI.create(
      s"$endpoint/loki/api/v1/label/$name/values?start=$startNs&end=$endNs$q")))
  }

  /** Parse the series response shape
    * `{"status":"success","data":[{"k":"v",…},…]}` → one (key, value)
    * seq per stream, in WIRE order (consumers that need canonical order
    * sort — [[LokiMetaReader]] does). Flat string→string objects only —
    * exactly what the endpoint returns.
    */
  private[loki] def parseObjectArray(body: String): Seq[Seq[(String, String)]] = {
    var i = dataArrayStart(body)
    val out = Seq.newBuilder[Seq[(String, String)]]
    while (i < body.length && body.charAt(i) != ']') {
      body.charAt(i) match {
        case '{' =>
          // the object's true end — '}' inside quoted values skipped
          val end = scanToCloser(body, i, '}')
          if (end < 0) throw new RuntimeException(
            s"Loki series response truncated: ${body.take(200)}")
          // one flat object: the string-array walk over its k/v strings —
          // they alternate key, value
          val kv = parseStringArrayRaw(body.substring(i, end + 1))
          out += kv.grouped(2).collect { case Seq(k, v) => (k, v) }.toSeq
          i = end + 1
        case _ => i += 1 // comma / whitespace
      }
    }
    if (i >= body.length) throw new RuntimeException(
      s"Loki series response truncated: ${body.take(200)}")
    out.result()
  }

  /** All JSON strings in `chunk`, in order (escape-aware). */
  private def parseStringArrayRaw(chunk: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val sb = new StringBuilder
    var inStr = false
    var i = 0
    while (i < chunk.length) {
      val c = chunk.charAt(i)
      if (inStr) {
        if (c == '\\' && i + 1 < chunk.length) {
          chunk.charAt(i + 1) match {
            case '"' => sb += '"'; i += 1
            case '\\' => sb += '\\'; i += 1
            case '/' => sb += '/'; i += 1
            case 'n' => sb += '\n'; i += 1
            case 'r' => sb += '\r'; i += 1
            case 't' => sb += '\t'; i += 1
            // the full JSON escape set: a standards-compliant producer
            // may emit \b and \f, which the default branch used to
            // mis-decode as the literal letters
            case 'b' => sb += '\b'; i += 1
            case 'f' => sb += '\f'; i += 1
            case 'u' if i + 5 < chunk.length =>
              sb += Integer.parseInt(chunk.substring(i + 2, i + 6), 16).toChar
              i += 5
            case o => sb += o; i += 1
          }
        } else if (c == '"') { out += sb.toString; sb.clear(); inStr = false }
        else sb += c
      } else if (c == '"') inStr = true
      i += 1
    }
    out.result()
  }

  /** `GET /loki/api/v1/series` — distinct label sets (streams) in the
    * window, optionally narrowed by a `match[]` selector.
    */
  def series(
      endpoint: String,
      startNs: Long,
      endNs: Long,
      selector: Option[String] = None): Seq[Seq[(String, String)]] = {
    val q = selector.map(s =>
      "&match%5B%5D=" + java.net.URLEncoder.encode(s, "UTF-8")).getOrElse("")
    parseObjectArray(getJson("series", URI.create(
      s"$endpoint/loki/api/v1/series?start=$startNs&end=$endNs$q")))
  }

  /** Index of the closing quote of the JSON string opening at
    * `openQuote` (escape-aware), or −1.
    */
  private def stringEnd(s: String, openQuote: Int): Int = {
    var i = openQuote + 1
    while (i < s.length) {
      s.charAt(i) match {
        case '\\' => i += 1
        case '"' => return i
        case _ =>
      }
      i += 1
    }
    -1
  }

  /** Index of the closer matching the `{`/`[` at `open`, accounting for
    * NESTED objects/arrays and quoted strings, or −1. The flat-object
    * scans above can use [[scanToCloser]]; the Prometheus-style volume
    * response nests (`result` elements hold a metric object and a value
    * array), so its walk needs real depth tracking.
    */
  private def scanToMatching(body: String, open: Int): Int = {
    var i = open
    var depth = 0
    var inStr = false
    while (i < body.length) {
      val c = body.charAt(i)
      if (inStr) {
        if (c == '\\') i += 1
        else if (c == '"') inStr = false
      } else c match {
        case '"' => inStr = true
        case '{' | '[' => depth += 1
        case '}' | ']' =>
          depth -= 1
          if (depth == 0) return i
        case _ =>
      }
      i += 1
    }
    -1
  }

  /** Parse a Prometheus-style vector/matrix response — the shape of real
    * Loki's `index/volume` / `index/volume_range` endpoints:
    *
    * {{{
    *   {"status":"success","data":{"resultType":"vector","result":[
    *     {"metric":{"k":"v"},"value":[1712345600,"123"]}, …]}}
    *   {"status":"success","data":{"resultType":"matrix","result":[
    *     {"metric":{"k":"v"},"values":[[1712300000,"12"],…]}, …]}}
    * }}}
    *
    * → one (sorted metric kvs, samples) per series; each sample is
    * (epoch SECONDS, numeric value). Vector elements decode as a single
    * sample. Element fields are walked structurally (depth- and
    * string-aware), so a label VALUE containing `"metric"`/`"values"` or
    * brackets cannot derail the scan; anything structurally off fails
    * loudly with the body prefix.
    */
  private[loki] def parseMetricSamples(
      body: String): Seq[(Seq[(String, String)], Seq[(Long, Long)])] =
    parseMetricSamplesWith(body) { (vs, die) =>
      try vs.toLong catch {
        case _: NumberFormatException => die(s"has a non-integer sample value")
      }
    }

  /** Float-valued variant for unwrapped range aggregations. */
  private[loki] def parseMetricSamplesD(
      body: String): Seq[(Seq[(String, String)], Seq[(Long, Double)])] =
    parseMetricSamplesWith(body) { (vs, die) =>
      try java.lang.Double.parseDouble(vs) catch {
        case _: NumberFormatException => die(s"has a non-numeric sample value")
      }
    }

  private def parseMetricSamplesWith[V](body: String)(
      conv: (String, String => Nothing) => V): Seq[(Seq[(String, String)], Seq[(Long, V)])] = {
    def die(msg: String): Nothing =
      throw new RuntimeException(s"Loki volume response $msg: ${body.take(200)}")
    val ri = body.indexOf("\"result\"")
    if (ri < 0) die("has no result field")
    val ro = body.indexOf('[', ri)
    if (ro < 0) die("result field is not an array")
    val rc = scanToMatching(body, ro)
    if (rc < 0) die("truncated")

    val out = Seq.newBuilder[(Seq[(String, String)], Seq[(Long, V)])]
    var i = ro + 1
    while (i < rc) {
      body.charAt(i) match {
        case '{' =>
          val end = scanToMatching(body, i)
          if (end < 0 || end > rc) die("truncated")
          out += parseSeriesElement(body.substring(i, end + 1), die, conv)
          i = end + 1
        case ',' => i += 1
        case c if c.isWhitespace => i += 1
        // a bare string/number/array element here is structurally off —
        // silently skipping it would drop a series under the documented
        // "anything structurally off fails loudly" contract
        case _ => die("has a malformed result array")
      }
    }
    out.result()
  }

  /** Walk a flat-braced element's TOP-LEVEL `"key": value` fields
    * structurally (depth- and string-aware), handing each (key, raw
    * value chunk) to `f`. Shared by the metric- and pattern-element
    * parsers.
    */
  private def forEachTopLevelField(
      el: String, die: String => Nothing)(f: (String, String) => Unit): Unit = {
    var i = 1 // past the element's '{'
    while (i < el.length - 1) {
      el.charAt(i) match {
        case '"' =>
          val ke = stringEnd(el, i)
          if (ke < 0) die("truncated")
          val key = parseStringArrayRaw(el.substring(i, ke + 1)).head
          val ci = el.indexOf(':', ke + 1)
          if (ci < 0) die("truncated")
          var v = ci + 1
          while (v < el.length && el.charAt(v).isWhitespace) v += 1
          val ve = el.charAt(v) match {
            case '{' | '[' => scanToMatching(el, v)
            case '"' => stringEnd(el, v)
            case _ => // bare literal: runs to the next ',' or the closing '}'
              var j = v
              while (j < el.length && el.charAt(j) != ',' && el.charAt(j) != '}') j += 1
              j - 1
          }
          if (ve < 0) die("truncated")
          f(key, el.substring(v, ve + 1))
          i = ve + 1
        case _ => i += 1
      }
    }
  }

  /** Walk the `[…]` sample arrays inside a `values`/`samples` chunk. */
  private def forEachSampleArray(
      chunk: String, die: String => Nothing)(f: String => Unit): Unit = {
    var j = 1
    while (j < chunk.length - 1) {
      chunk.charAt(j) match {
        case '[' =>
          val se = scanToMatching(chunk, j)
          if (se < 0) die("truncated")
          f(chunk.substring(j, se + 1))
          j = se + 1
        case ',' => j += 1
        case c if c.isWhitespace => j += 1
        case _ => die("has a malformed values array")
      }
    }
  }

  /** One `result` element `{"metric":{…},"value(s)":…}` → (metric kvs,
    * samples). Walks the element's TOP-LEVEL fields structurally.
    */
  private def parseSeriesElement[V](
      el: String, die: String => Nothing,
      conv: (String, String => Nothing) => V): (Seq[(String, String)], Seq[(Long, V)]) = {
    var metric: Option[Seq[(String, String)]] = None
    var samples: Option[Seq[(Long, V)]] = None
    forEachTopLevelField(el, die) { (key, chunk) =>
      key match {
        case "metric" =>
          val flat = parseStringArrayRaw(chunk)
          // strict pairing: an unpaired trailing key means a
          // truncated/corrupt metric — misattributing the series
          // would be worse than failing
          if (flat.size % 2 != 0) die("has an unpaired metric key")
          metric = Some(flat.grouped(2)
            .collect { case Seq(k, vv) => (k, vv) }.toSeq)
        case "value" => samples = Some(Seq(parseSample(chunk, die, conv)))
        case "values" =>
          val ss = Seq.newBuilder[(Long, V)]
          forEachSampleArray(chunk, die)(s => ss += parseSample(s, die, conv))
          samples = Some(ss.result())
        case _ => // resultType etc. — ignored
      }
    }
    (metric.getOrElse(die("element has no metric")),
      samples.getOrElse(die("element has no value")))
  }

  private val samplePattern =
    java.util.regex.Pattern.compile("^\\[\\s*(-?\\d+)(?:\\.\\d+)?\\s*,")

  /** `[<ts>,"<value>"]` → (ts floor seconds, value). Prometheus sample
    * timestamps may carry a fractional part; the value is a quoted
    * numeric string converted by `conv` (whole integers for the volume/
    * entry-count callers, float64 for unwrapped aggregations) —
    * anything else dies with the body prefix like every other
    * malformed-shape path here.
    */
  private def parseSample[V](
      chunk: String, die: String => Nothing,
      conv: (String, String => Nothing) => V): (Long, V) = {
    val m = samplePattern.matcher(chunk)
    if (!m.find()) die(s"has a malformed sample")
    val vs = parseStringArrayRaw(chunk)
    if (vs.size != 1) die(s"has a malformed sample value")
    (m.group(1).toLong, conv(vs.head, die))
  }

  /** `GET /loki/api/v1/index/volume` — aggregate log volume (bytes) per
    * series (or per label name under `aggregateBy=labels`) for the
    * matching streams — real Loki's capacity census, index-only
    * server-side. Top-`limit` series by volume (server default 100).
    */
  def indexVolume(
      endpoint: String,
      selector: String,
      startNs: Long,
      endNs: Long,
      targetLabels: Seq[String] = Nil,
      aggregateBy: Option[String] = None,
      limit: Int = 0): Seq[(Seq[(String, String)], Long)] =
    parseMetricSamples(getJson("index/volume", URI.create(
      s"$endpoint/loki/api/v1/index/volume?" + volumeParams(
        selector, startNs, endNs, targetLabels, aggregateBy, limit))))
      .map { case (m, samples) => (m, samples.map(_._2).sum) }

  /** `GET /loki/api/v1/index/volume_range` — the step-bucketed form:
    * volume per series per `stepNs` bucket from `startNs` (the capacity
    * TREND). Samples are (bucket-start epoch seconds, bytes), ascending;
    * empty buckets are omitted (Prometheus matrix shape).
    */
  def indexVolumeRange(
      endpoint: String,
      selector: String,
      startNs: Long,
      endNs: Long,
      stepNs: Long,
      targetLabels: Seq[String] = Nil,
      aggregateBy: Option[String] = None,
      limit: Int = 0): Seq[(Seq[(String, String)], Seq[(Long, Long)])] = {
    // the public method enforces its own documented contract: the step
    // param speaks whole seconds, and a sub-second stepNs from a direct
    // caller (bypassing the plan-time guard) would integer-divide to
    // step=0s on the wire — a silently degenerate request
    require(stepNs > 0 && stepNs % 1000000000L == 0,
      s"volume_range stepNs must be a positive whole-second multiple, " +
        s"got $stepNs")
    parseMetricSamples(getJson("index/volume_range", URI.create(
      s"$endpoint/loki/api/v1/index/volume_range?" + volumeParams(
        selector, startNs, endNs, targetLabels, aggregateBy, limit) +
        // step speaks DURATION, not epoch units: real Loki parses it as
        // float seconds or a Prometheus duration string (unlike
        // start/end, which take epoch ns) — stepNs is whole-second by
        // the require above, so the division is exact
        s"&step=${stepNs / 1000000000L}s")))
  }

  private def volumeParams(
      selector: String,
      startNs: Long,
      endNs: Long,
      targetLabels: Seq[String],
      aggregateBy: Option[String],
      limit: Int): String = {
    val enc = java.net.URLEncoder.encode(selector, "UTF-8")
    s"query=$enc&start=$startNs&end=$endNs" +
      (if (targetLabels.nonEmpty)
        "&targetLabels=" + java.net.URLEncoder.encode(
          targetLabels.mkString(","), "UTF-8")
      else "") +
      aggregateBy.map(a => s"&aggregateBy=$a").getOrElse("") +
      (if (limit > 0) s"&limit=$limit" else "")
  }

  /** Parse the pattern-detection response shape of real Loki's
    * `GET /loki/api/v1/patterns`:
    *
    * {{{
    *   {"status":"success","data":[
    *     {"pattern":"<_> level=error <_>","samples":[[1712300000,12],…]},
    *     …]}
    * }}}
    *
    * → one (pattern, samples) per detected pattern; each sample is
    * (epoch SECONDS, count) — here the count is a BARE number, unlike
    * the quoted string values of the Prometheus-style metric shape.
    * Structural walk, loud on anything off, like every parser here.
    */
  private val bareSamplePattern = java.util.regex.Pattern.compile(
    "^\\[\\s*(-?\\d+)(?:\\.\\d+)?\\s*,\\s*(-?\\d+)(?:\\.\\d+)?\\s*\\]$")

  private[loki] def parsePatternSamples(
      body: String): Seq[(String, Seq[(Long, Long)])] = {
    def die(msg: String): Nothing =
      throw new RuntimeException(
        s"Loki patterns response $msg: ${body.take(200)}")
    val start = dataArrayStart(body)
    val rc = scanToMatching(body, start - 1) // the data array's closer
    if (rc < 0) die("truncated")
    val out = Seq.newBuilder[(String, Seq[(Long, Long)])]
    var i = start
    while (i < rc) {
      body.charAt(i) match {
        case '{' =>
          val end = scanToMatching(body, i)
          if (end < 0 || end > rc) die("truncated")
          val el = body.substring(i, end + 1)
          var pattern: Option[String] = None
          var samples: Option[Seq[(Long, Long)]] = None
          forEachTopLevelField(el, die) { (key, chunk) =>
            key match {
              case "pattern" =>
                if (!chunk.startsWith("\"")) die("has a non-string pattern")
                pattern = parseStringArrayRaw(chunk).headOption
                  .orElse(Some("")) // the empty pattern "" parses to none
              case "samples" =>
                val ss = Seq.newBuilder[(Long, Long)]
                forEachSampleArray(chunk, die) { s =>
                  val m = bareSamplePattern.matcher(s)
                  if (!m.matches()) die("has a malformed sample")
                  ss += ((m.group(1).toLong, m.group(2).toLong))
                }
                samples = Some(ss.result())
              case _ => // ignored
            }
          }
          out += ((pattern.getOrElse(die("element has no pattern")),
            samples.getOrElse(die("element has no samples"))))
          i = end + 1
        case ',' => i += 1
        case c if c.isWhitespace => i += 1
        case _ => die("has a malformed data array")
      }
    }
    out.result()
  }

  /** `GET /loki/api/v1/patterns` — real Loki's server-side log-pattern
    * detection (Drain-style templates with `<_>` placeholders, counted
    * per `step` bucket). The census counterpart of the Spark-side
    * template mining (`loki_log_patterns`/`loki_drain_templates`):
    * index/pattern-store-backed on a real Loki, so a template census
    * over a month of logs never streams chunks to the client. `stepNs`
    * None → one bucket spanning the window.
    */
  def patterns(
      endpoint: String,
      selector: String,
      startNs: Long,
      endNs: Long,
      stepNs: Option[Long] = None): Seq[(String, Seq[(Long, Long)])] = {
    stepNs.foreach(s => require(s > 0 && s % 1000000000L == 0,
      s"patterns stepNs must be a positive whole-second multiple, got $s"))
    val enc = java.net.URLEncoder.encode(selector, "UTF-8")
    parsePatternSamples(getJson("patterns", URI.create(
      s"$endpoint/loki/api/v1/patterns?query=$enc&start=$startNs&end=$endNs" +
        stepNs.map(s => s"&step=${s / 1000000000L}s").getOrElse(""))))
  }

  /** Epoch ns → RFC3339Nano (`2024-01-01T00:00:00.000000001Z`), the
    * highest-precision time dialect the delete endpoint accepts.
    */
  def rfc3339Nano(ns: Long): String =
    java.time.Instant
      .ofEpochSecond(Math.floorDiv(ns, 1000000000L),
        Math.floorMod(ns, 1000000000L)).toString

  /** `POST /loki/api/v1/delete` — real Loki's compactor delete API: file
    * a deletion request for the log lines matching `query` (selector +
    * optional line-filter stages). The compactor's window is INCLUSIVE
    * on both ends — an entry is deleted when start ≤ ts ≤ end (round-15
    * advice; the earlier epoch-second mapping of the SQL-exclusive
    * `ts < E` to `end=E` silently over-deleted the entry timestamped
    * exactly E) — so both bounds here are inclusive epoch ns, shipped as
    * RFC3339Nano (the endpoint accepts RFC3339 alongside epoch seconds,
    * and only the nano form can express an exclusive SQL bound exactly
    * as `end = E − 1ns`). Callers translate: [start, end) ⇒
    * (startNs, endNs − 1). The request is asynchronous on a real Loki
    * (the compactor applies it after `delete_request_cancel_period`);
    * the testkit stub applies immediately, modeling the post-compaction
    * state a conformance test would poll for.
    */
  def deleteRequest(
      endpoint: String,
      query: String,
      startInclNs: Option[Long],
      endInclNs: Option[Long]): Unit = {
    val enc = java.net.URLEncoder.encode(query, "UTF-8")
    def t(ns: Long): String =
      java.net.URLEncoder.encode(rfc3339Nano(ns), "UTF-8")
    val uri = URI.create(s"$endpoint/loki/api/v1/delete?query=$enc" +
      startInclNs.map(s => s"&start=${t(s)}").getOrElse("") +
      endInclNs.map(e => s"&end=${t(e)}").getOrElse(""))
    val req = HttpRequest.newBuilder(uri)
      .timeout(Duration.ofSeconds(30))
      .POST(HttpRequest.BodyPublishers.noBody()).build()
    val resp = withRetry("delete")(() =>
      client.send(req, HttpResponse.BodyHandlers.ofString()))(_.statusCode())
    if (resp.statusCode() / 100 != 2) throw new RuntimeException(
      s"Loki delete failed: HTTP ${resp.statusCode()}: ${resp.body().take(500)}")
  }

  /** `DELETE /loki/api/v1/delete?request_id=` — cancel a filed deletion
    * request inside the compactor's cancel grace period (round 15): the
    * request is REMOVED from the store and its rows survive. Past the
    * grace period (status processed) real Loki answers 400 — surfaced
    * as an exception, as is 404 for an unknown id. Transient 5xx retry
    * like the filing; a 4xx is terminal.
    */
  def cancelDeleteRequest(endpoint: String, requestId: String): Unit = {
    val uri = URI.create(s"$endpoint/loki/api/v1/delete?request_id=" +
      java.net.URLEncoder.encode(requestId, "UTF-8"))
    val req = HttpRequest.newBuilder(uri)
      .timeout(Duration.ofSeconds(30)).DELETE().build()
    val resp = withRetry("delete(cancel)")(() =>
      client.send(req, HttpResponse.BodyHandlers.ofString()))(_.statusCode())
    if (resp.statusCode() / 100 != 2) throw new RuntimeException(
      s"Loki delete cancel failed: HTTP ${resp.statusCode()}: " +
        resp.body().take(500))
  }

  /** `GET /loki/api/v1/delete` — list delete requests:
    * (request_id, query, start_s, end_s, status) per request, parsed
    * from the endpoint's flat-object array (string ids/queries/statuses,
    * bare-numeric second timestamps).
    */
  def deleteRequests(
      endpoint: String): Seq[(String, String, Long, Long, String)] = {
    val body = getJson("delete(list)", URI.create(s"$endpoint/loki/api/v1/delete"))
    def die(msg: String): Nothing = throw new RuntimeException(
      s"Loki delete list response $msg: ${body.take(200)}")
    // top-level array (no data wrapper on this endpoint)
    val open = body.indexOf('[')
    if (open < 0) die("is not an array")
    val close = scanToMatching(body, open)
    if (close < 0) die("truncated")
    val out = Seq.newBuilder[(String, String, Long, Long, String)]
    var i = open + 1
    while (i < close) {
      body.charAt(i) match {
        case '{' =>
          val end = scanToMatching(body, i)
          if (end < 0 || end > close) die("truncated")
          val el = body.substring(i, end + 1)
          var id, query, status: Option[String] = None
          var startT, endT: Option[Long] = None
          def num(chunk: String): Long =
            try chunk.trim.takeWhile(c => c.isDigit || c == '-').toLong
            catch { case _: NumberFormatException => die("has a bad timestamp") }
          forEachTopLevelField(el, die) { (key, chunk) =>
            key match {
              case "request_id" => id = parseStringArrayRaw(chunk).headOption
              case "query" => query = parseStringArrayRaw(chunk).headOption
              case "status" => status = parseStringArrayRaw(chunk).headOption
              case "start_time" => startT = Some(num(chunk))
              case "end_time" => endT = Some(num(chunk))
              case _ => // created_at etc. — ignored
            }
          }
          out += ((id.getOrElse(die("element has no request_id")),
            query.getOrElse(die("element has no query")),
            startT.getOrElse(die("element has no start_time")),
            endT.getOrElse(die("element has no end_time")),
            status.getOrElse(die("element has no status"))))
          i = end + 1
        case ',' => i += 1
        case c if c.isWhitespace => i += 1
        case _ => die("has a malformed array")
      }
    }
    out.result()
  }

  /** push-API POST; body is the JSON `{"streams":[...]}` payload. */
  def push(endpoint: String, json: String): Unit = {
    val req = HttpRequest.newBuilder(URI.create(s"$endpoint/loki/api/v1/push"))
      .timeout(Duration.ofMinutes(1))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(json)).build()
    val resp = withRetry("push")(() =>
      client.send(req, HttpResponse.BodyHandlers.ofString()))(_.statusCode())
    if (resp.statusCode() / 100 != 2) {
      throw new RuntimeException(
        s"Loki push failed: HTTP ${resp.statusCode()}: ${resp.body().take(500)}")
    }
  }

  def nowNs: Long = System.currentTimeMillis() * 1000000L

  /** Default scan window: now − 30 d … now (utils.rs:3-12), evaluated at
    * execute time like the reference (scan.rs:107-111).
    */
  def thirtyDaysAgoNs: Long = nowNs - 30L * 24 * 3600 * 1000000000L
}

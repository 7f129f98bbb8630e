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
      // forward=true is the PAGINATION path (reader cursor walks the
      // window oldest-first); the default omits the param like the
      // reference (scan.rs:106-121), leaving Loki's default direction
      forward: Boolean = false): Array[Byte] = {
    val enc = java.net.URLEncoder.encode(logql, "UTF-8")
    val limitParam = limit.map(n => s"&limit=$n").getOrElse("")
    val dirParam = if (forward) "&direction=forward" else ""
    val uri = URI.create(
      s"$endpoint/loki/api/v1/query_range?query=$enc&start=$startNs&end=$endNs$limitParam$dirParam")
    val req = HttpRequest.newBuilder(uri)
      .timeout(Duration.ofMinutes(5))
      .header("Accept", "application/vnd.apache.parquet")
      .GET().build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofByteArray())
    if (resp.statusCode() != 200) {
      throw new RuntimeException(
        s"Loki query_range failed: HTTP ${resp.statusCode()}: " +
          new String(resp.body(), "UTF-8").take(500))
    }
    resp.body()
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
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
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

  /** push-API POST; body is the JSON `{"streams":[...]}` payload. */
  def push(endpoint: String, json: String): Unit = {
    val req = HttpRequest.newBuilder(URI.create(s"$endpoint/loki/api/v1/push"))
      .timeout(Duration.ofMinutes(1))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(json)).build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
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

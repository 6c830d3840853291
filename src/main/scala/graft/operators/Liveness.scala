package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}

/** C10 URL-liveness enrichment (`utils_tools.py:92-108`: HTTP HEAD,
  * browser UA, 10 s timeout, follow redirects, `status == 200`).
  *
  * The reference calls this INSIDE its ingestion loop — a side-effecting
  * network probe per row. Here it is an explicitly quarantined
  * enrichment stage (SURVEY.md §2.10 "side-effecting"): never part of a
  * query plan, run on demand against the distinct provider URLs, results
  * written to a liveness table that plans JOIN against. Retries/replays
  * of query plans therefore never re-fire network calls.
  *
  * The transport is pluggable and STUBBED by default (this environment
  * has no egress): [[StubProbe]] answers deterministically from the URL
  * string. [[HttpProbe]] is the real java.net implementation; it is
  * executed live in OperatorsSpec against a loopback JDK HttpServer
  * (real sockets, HEAD + UA + redirect-follow semantics verified on the
  * wire), so only the EGRESS is absent here, not the transport.
  */
object Liveness {

  /** A probe answers: is this URL alive? Must be thread-safe. */
  type Probe = String => Boolean

  /** Deterministic no-network stand-in: alive iff the URL parses and is
    * http(s). Keeps tests and oracles stable.
    */
  val StubProbe: Probe = { url =>
    try {
      val u = java.net.URI.create(url)
      u.getScheme == "http" || u.getScheme == "https"
    } catch { case _: Exception => false }
  }

  /** The reference's actual probe semantics, for deployments with
    * network access: HEAD, browser UA, 10 s timeout, redirects followed,
    * alive ⇔ terminal status 200.
    */
  val HttpProbe: Probe = { url =>
    try {
      val client = java.net.http.HttpClient.newBuilder()
        .followRedirects(java.net.http.HttpClient.Redirect.NORMAL)
        .connectTimeout(java.time.Duration.ofSeconds(10))
        .build()
      val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
        .method("HEAD", java.net.http.HttpRequest.BodyPublishers.noBody())
        .header("User-Agent", "Mozilla/5.0")
        .timeout(java.time.Duration.ofSeconds(10))
        .build()
      client.send(req, java.net.http.HttpResponse.BodyHandlers.discarding())
        .statusCode() == 200
    } catch { case _: Exception => false }
  }

  /** Probe the DISTINCT values of `urlCol` with bounded per-partition
    * request rate, yielding a (url, is_active) liveness table. Dedup
    * happens BEFORE probing (one request per unique URL fleet-wide);
    * `maxPerSecond` throttles each partition independently, so total
    * rate = partitions × maxPerSecond — size partitions accordingly.
    */
  def probeUrls(spark: SparkSession, df: DataFrame, urlCol: String,
                probe: Probe = StubProbe, maxPerSecond: Int = 10): DataFrame = {
    val urls = df.select(urlCol).na.drop().distinct()
    implicit val enc = Encoders.tuple(Encoders.STRING, Encoders.scalaBoolean)
    val minIntervalNanos = 1000000000L / math.max(1, maxPerSecond)
    urls.mapPartitions { (it: Iterator[Row]) =>
      var last = 0L
      it.map { r =>
        val now = System.nanoTime()
        val wait = (last + minIntervalNanos) - now
        if (last != 0L && wait > 0) Thread.sleep(wait / 1000000, (wait % 1000000).toInt)
        last = System.nanoTime()
        val url = r.getString(0)
        (url, probe(url))
      }
    }.toDF("url", "is_active")
  }
}

package graft

import graft.sources.{PagedLister, S3HttpPager}
import org.scalatest.funsuite.AnyFunSuite

import java.net.InetSocketAddress

/** The paged listing protocol against an ACTUAL paginating HTTP server —
  * the integration the page-level [[PagedLister]] specs can't give:
  * every page is a real `GET ?list-type=2&prefix&start-after&max-keys`
  * over a socket, the server truncates at max-keys like S3 does, and a
  * request log lets the tests assert the cursor discipline (what the
  * client ASKED for, not just what it got). The emulator implements the
  * ListObjectsV2 response shape — `ListBucketResult` with
  * `Contents/{Key,LastModified,Size}`, `IsTruncated`,
  * `NextContinuationToken` — over an in-memory sorted key set.
  */
class S3HttpPagerSpec extends AnyFunSuite {

  private final case class Obj(key: String, mtimeMillis: Long, size: Long)

  /** One logged request: (prefix, startAfter, maxKeys). */
  private final case class Req(prefix: String, startAfter: String,
      maxKeys: Int)

  /** Minimal ListObjectsV2 emulator over `objs` (kept sorted by key).
    * `reverse = true` serves keys in DESCENDING order — the
    * broken-server arm. Returns (server, baseUrl, requestLog).
    */
  /** When `auth` is set, the emulator VERIFIES each request's SigV4
    * `Authorization` header the way S3 does — it re-derives the
    * signature from the RAW request (method, path, decoded query, the
    * actual transmitted header values named in SignedHeaders) with the
    * shared secret and rejects any mismatch with 403. A client that
    * signs different parameters than it sends, drops a signed header,
    * or derives the key wrongly fails here even though S3SigV4Spec's
    * vectors pass.
    */
  private def startEmulator(objs: Seq[Obj], reverse: Boolean = false,
      auth: Option[graft.sources.S3SigV4.Credentials] = None,
      authRegion: String = "us-east-1") = {
    val sorted = objs.sortBy(_.key)
    val log = new java.util.concurrent.CopyOnWriteArrayList[Req]()
    val server = com.sun.net.httpserver.HttpServer
      .create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
      val params = Option(ex.getRequestURI.getRawQuery).getOrElse("")
        .split("&").filter(_.nonEmpty).map { kv =>
          val i = kv.indexOf('=')
          val k = java.net.URLDecoder.decode(kv.take(i), "UTF-8")
          val v = java.net.URLDecoder.decode(kv.drop(i + 1), "UTF-8")
          k -> v
        }.toMap
      val authorized = auth.forall { creds =>
        import graft.sources.S3SigV4
        Option(ex.getRequestHeaders.getFirst("Authorization"))
          .exists { hdr =>
            val sigRe = ".*Signature=([0-9a-f]{64})$".r
            val signedRe = ".*SignedHeaders=([^,]+),.*".r
            (hdr, hdr) match {
              case (sigRe(sig), signedRe(names)) =>
                val hdrs = names.split(";").toSeq.map(n =>
                  n -> Option(ex.getRequestHeaders.getFirst(n)).getOrElse(""))
                val amzDate = ex.getRequestHeaders.getFirst("x-amz-date")
                val payload = ex.getRequestHeaders
                  .getFirst("x-amz-content-sha256")
                val cr = S3SigV4.canonicalRequest("GET",
                  ex.getRequestURI.getPath,
                  params.toSeq, hdrs, payload)
                val scope = s"${amzDate.take(8)}/$authRegion/s3/aws4_request"
                val want = S3SigV4.signatureHex(
                  S3SigV4.signingKey(creds.secretKey, amzDate.take(8),
                    authRegion, "s3"),
                  S3SigV4.stringToSign(amzDate, scope, cr))
                hdr.contains(s"Credential=${creds.accessKey}/$scope") &&
                  want == sig
              case _ => false
            }
          }
      }
      if (!authorized) {
        val body = "<Error><Code>SignatureDoesNotMatch</Code></Error>"
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
        ex.sendResponseHeaders(403, body.length.toLong)
        ex.getResponseBody.write(body)
        ex.close()
      } else {
      val prefix = params.getOrElse("prefix", "")
      val after = params.getOrElse("start-after", "")
      val maxKeys = math.min(params.getOrElse("max-keys", "1000").toInt,
        1000)
      log.add(Req(prefix, after, maxKeys))
      val matching = sorted
        .filter(o => o.key.startsWith(prefix) && o.key > after)
      val pageRows = matching.take(maxKeys)
      val page = if (reverse) pageRows.reverse else pageRows
      val truncated = matching.size > maxKeys
      def esc(s: String) = s.replace("&", "&amp;").replace("<", "&lt;")
        .replace(">", "&gt;")
      val xml = new StringBuilder
      xml ++= """<?xml version="1.0" encoding="UTF-8"?>"""
      xml ++= "<ListBucketResult><Name>test-bucket</Name>"
      xml ++= s"<Prefix>${esc(prefix)}</Prefix>"
      xml ++= s"<KeyCount>${page.size}</KeyCount>"
      xml ++= s"<MaxKeys>$maxKeys</MaxKeys>"
      xml ++= s"<IsTruncated>$truncated</IsTruncated>"
      if (truncated)
        xml ++= s"<NextContinuationToken>tok-${esc(page.last.key)}" +
          "</NextContinuationToken>"
      page.foreach { o =>
        xml ++= "<Contents>"
        xml ++= s"<Key>${esc(o.key)}</Key>"
        xml ++= s"<LastModified>${java.time.Instant
          .ofEpochMilli(o.mtimeMillis)}</LastModified>"
        xml ++= s"<Size>${o.size}</Size>"
        xml ++= "<StorageClass>STANDARD</StorageClass></Contents>"
      }
      xml ++= "</ListBucketResult>"
      val bytes = xml.toString
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)
      ex.getResponseHeaders.add("Content-Type", "application/xml")
      ex.sendResponseHeaders(200, bytes.length.toLong)
      ex.getResponseBody.write(bytes)
      ex.close()
      }
    })
    server.start()
    (server, s"http://127.0.0.1:${server.getAddress.getPort}", log)
  }

  private def withEmulator[A](objs: Seq[Obj], reverse: Boolean = false)(
      body: (S3HttpPager, java.util.List[Req]) => A): A = {
    val (server, url, log) = startEmulator(objs, reverse)
    try body(new S3HttpPager(url), log)
    finally server.stop(0)
  }

  test("multi-page drain over a real socket: every key, in order, with the cursor advancing to each page's last key") {
    val objs = (0 until 2537).map(i =>
      Obj(f"t/2024/01/02/f$i%06d.parquet", 10000L + i, 10L + i))
    withEmulator(objs) { (pager, log) =>
      val got = PagedLister.listAll(pager, "t/", pageSize = 1000)
      assert(got.map(_.key) === objs.map(_.key))
      // entries carry the server's mtime/size through the XML round-trip
      assert(got.head.mtimeMillis === 10000L && got.head.size === 10L)
      assert(got.last.mtimeMillis === 10000L + 2536)
      // 2537 keys at 1000/page = 3 requests (the last page is short, so
      // the truncation loop stops without a 4th)
      assert(log.size === 3)
      assert(log.get(0) === Req("t/", "", 1000))
      assert(log.get(1) === Req("t/", objs(999).key, 1000))
      assert(log.get(2) === Req("t/", objs(1999).key, 1000))
    }
  }

  test("a drain whose total is an exact page multiple pays one extra empty page — and no more") {
    val objs = (0 until 2000).map(i =>
      Obj(f"t/k$i%05d.parquet", 1L, 1L))
    withEmulator(objs) { (pager, log) =>
      val got = PagedLister.listAll(pager, "t/", pageSize = 1000)
      assert(got.size === 2000)
      // full page → maybe-truncated → one extra request that comes back
      // empty; a fourth would mean the loop ignored the empty signal
      assert(log.size === 3)
      assert(log.get(2).startAfter === objs.last.key)
    }
  }

  test("date-aware listing over HTTP prunes earlier days SERVER-side: no request ever lists them") {
    def ts(s: String): Long = java.time.Instant.parse(s).toEpochMilli
    val objs = Seq(
      Obj("t/LOAD00000001.parquet", ts("2023-12-01T00:00:00Z"), 5L),
      Obj("t/2024/01/01/a.parquet", // before the start day
        ts("2024-01-01T12:00:00Z"), 5L),
      Obj("t/2024/01/02/b.parquet", // inside the window
        ts("2024-01-02T10:00:00Z"), 5L),
      Obj("t/2024/01/02/b2.parquet", // day ok, mtime before start
        ts("2024-01-02T08:00:00Z"), 5L),
      Obj("t/2024/01/03/c.parquet", // inside
        ts("2024-01-03T10:00:00Z"), 5L),
      Obj("t/2024/01/04/d.parquet", // after stop
        ts("2024-01-04T10:00:00Z"), 5L),
      Obj("t/2024/01/03/junk.txt", // non-parquet
        ts("2024-01-03T10:00:00Z"), 5L))
    withEmulator(objs) { (pager, log) =>
      val got = PagedLister.listDateAware(pager, "t",
        startMillis = ts("2024-01-02T09:00:00Z"),
        stopMillis = Some(ts("2024-01-04T00:00:00Z")))
      // LOAD always kept (and first); CDC files window on mtime
      assert(got.map(_.path) === Seq("t/LOAD00000001.parquet",
        "t/2024/01/02/b.parquet", "t/2024/01/03/c.parquet"))
      assert(got.head.isLoad && got.tail.forall(!_.isLoad))
      // the protocol's pruning promise: the date pass STARTS its cursor
      // at the start day's directory, so 2024/01/01 keys are never
      // transferred — verified on the server's own request log
      val datePass = log.asInstanceOf[java.util.List[Req]]
      assert(datePass.stream().anyMatch(r =>
        r.prefix == "t/" && r.startAfter == "t/2024/01/02/"))
      assert(datePass.stream().anyMatch(r => r.prefix == "t/LOAD"))
    }
  }

  test("SigV4-signed drain: the server verifies every request's signature (incl. session token)") {
    import graft.sources.S3SigV4
    val creds = S3SigV4.Credentials("AKIDEXAMPLE",
      "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY", Some("SESSIONTOKEN"))
    val objs = (0 until 1537).map(i =>
      Obj(f"t/2024/01/02/f$i%06d.parquet", 10000L + i, 10L + i))
    val (server, url, log) = startEmulator(objs, auth = Some(creds))
    try {
      val pager = new S3HttpPager(url, credentials = Some(creds),
        clock = () => "20240102T000000Z")
      val got = PagedLister.listAll(pager, "t/", pageSize = 1000)
      assert(got.map(_.key) === objs.map(_.key))
      // both pages travelled signed (the 403 arm below proves the
      // server actually checks)
      assert(log.size === 2)
    } finally server.stop(0)
  }

  test("an unsigned request against a verifying endpoint fails loudly with 403") {
    import graft.sources.S3SigV4
    val creds = S3SigV4.Credentials("AKIDEXAMPLE", "topsecret")
    val (server, url, _) = startEmulator(
      Seq(Obj("t/a.parquet", 1L, 1L)), auth = Some(creds))
    try {
      val e = intercept[IllegalArgumentException] {
        PagedLister.listAll(new S3HttpPager(url), "t/", pageSize = 1000)
      }
      assert(e.getMessage.contains("403"))
    } finally server.stop(0)
  }

  test("a signature derived from the wrong secret is rejected — the server re-derives, not just parses") {
    import graft.sources.S3SigV4
    val (server, url, _) = startEmulator(
      Seq(Obj("t/a.parquet", 1L, 1L)),
      auth = Some(S3SigV4.Credentials("AKIDEXAMPLE", "the-real-secret")))
    try {
      val wrong = new S3HttpPager(url, credentials =
        Some(S3SigV4.Credentials("AKIDEXAMPLE", "a-guessed-secret")))
      val e = intercept[IllegalArgumentException] {
        PagedLister.listAll(wrong, "t/", pageSize = 1000)
      }
      assert(e.getMessage.contains("403"))
    } finally server.stop(0)
  }

  test("a server answering out of order fails the drain loudly instead of skipping keys") {
    val objs = (0 until 20).map(i => Obj(f"t/k$i%03d.parquet", 1L, 1L))
    withEmulator(objs, reverse = true) { (pager, _) =>
      val e = intercept[IllegalArgumentException] {
        PagedLister.listAll(pager, "t/", pageSize = 10)
      }
      assert(e.getMessage.contains("ascending keys"))
    }
  }

  test("signed host omits scheme-default ports, keeps explicit non-default ones") {
    // HttpURLConnection drops :80/:443 from the transmitted Host header,
    // so the SIGNED host must match what the server will see — an
    // endpoint written http://host:80/ signing "host:80" would 403 on
    // every request (the live emulator above always binds an ephemeral
    // port, so the default-port branch needs this unit pin)
    def hostOf(endpoint: String): String =
      S3HttpPager.signedHostFor(new java.net.URI(endpoint))
    assert(hostOf("http://s3.example.com:80") === "s3.example.com")
    assert(hostOf("https://s3.example.com:443") === "s3.example.com")
    assert(hostOf("http://s3.example.com") === "s3.example.com")
    assert(hostOf("https://s3.example.com") === "s3.example.com")
    // non-default stays, matching the transmitted header (emulators)
    assert(hostOf("http://127.0.0.1:9444") === "127.0.0.1:9444")
    // the CROSS-scheme defaults are NOT default for that scheme
    assert(hostOf("http://s3.example.com:443") === "s3.example.com:443")
    assert(hostOf("https://s3.example.com:80") === "s3.example.com:80")
  }
}

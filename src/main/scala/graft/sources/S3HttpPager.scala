package graft.sources

import graft.sources.PagedLister.{PageEntry, PageLister}

/** [[PagedLister.PageLister]] over a REAL ListObjectsV2 HTTP endpoint —
  * the wire form of the listing protocol the reference speaks
  * (/root/reference/src/s3/s3_operator.rs:208-275 issues exactly these
  * requests through the AWS SDK). Each [[page]] call is one
  * `GET {endpoint}/?list-type=2&prefix=…&start-after=…&max-keys=…`
  * and parses the XML `ListBucketResult` (`Contents/Key`,
  * `Contents/LastModified` ISO-8601, `Contents/Size`).
  *
  * The stateless `start-after` form is used on every request (valid
  * ListObjectsV2: a request without a continuation token starts a fresh
  * listing strictly after that key), because [[PagedLister.listAll]]
  * owns the cursor — it advances to the last key of each full page, so
  * no server-side token state is needed and a retried page is
  * idempotent. With `credentials` set, every request carries AWS
  * SigV4 headers ([[S3SigV4.signedHeaders]] — the signing the
  * reference gets from the AWS SDK's credential chain); without them,
  * requests go anonymous (public buckets, test emulators, local object
  * stores). JDK-only client (HttpURLConnection + the built-in
  * DocumentBuilder) — no added dependencies.
  *
  * @param clock injectable `x-amz-date` supplier (specs pin it to the
  *        published signing vectors' timestamp)
  */
final class S3HttpPager(endpoint: String,
    connectTimeoutMs: Int = 10000, readTimeoutMs: Int = 30000,
    credentials: Option[S3SigV4.Credentials] = None,
    region: String = "us-east-1",
    clock: () => String = S3SigV4.nowAmzDate _)
    extends PageLister {

  private val base = endpoint.stripSuffix("/")
  private val baseUri = new java.net.URI(base)

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8")

  def page(prefix: String, startAfter: String, pageSize: Int)
      : Seq[PageEntry] = {
    // S3 hard-caps max-keys at 1000: a larger request comes back with
    // 1000 keys + IsTruncated=true, which listAll's "short page = done"
    // inference would read as end-of-listing — silently dropping every
    // remaining key. Fail loudly here instead of listing incompletely.
    require(pageSize <= 1000,
      s"ListObjectsV2 max-keys is capped at 1000 by S3; got $pageSize")
    val params = Seq("list-type" -> "2", "max-keys" -> pageSize.toString,
      "prefix" -> prefix) ++
      (if (startAfter.nonEmpty) Seq("start-after" -> startAfter) else Nil)
    val url = new java.net.URI(s"$base/?" + params.map { case (k, v) =>
      s"$k=${enc(v)}" }.mkString("&")).toURL
    val conn = url.openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setConnectTimeout(connectTimeoutMs)
    conn.setReadTimeout(readTimeoutMs)
    conn.setRequestMethod("GET")
    credentials.foreach { creds =>
      val host = S3HttpPager.signedHostFor(baseUri)
      val path = Option(baseUri.getPath).getOrElse("")
        .stripSuffix("/") + "/"
      S3SigV4.signedHeaders("GET", host, path, params, creds, region,
          "s3", clock())
        .foreach { case (k, v) =>
          if (k != "host") conn.setRequestProperty(k, v)
        } // host is set by the HTTP stack from the URL itself
    }
    try {
      val code = conn.getResponseCode
      require(code == 200, s"ListObjectsV2 GET $url returned HTTP $code")
      val in = conn.getInputStream
      val (entries, truncated) =
        try parseListing(in)
        finally in.close()
      // consistency guard: a server that truncates BELOW our max-keys
      // (a stricter emulator cap, a quota) would hand listAll a short
      // page it reads as end-of-listing — surface the mismatch instead
      require(!truncated.contains(true) || entries.size >= pageSize,
        s"server truncated the listing at ${entries.size} keys but " +
          s"max-keys was $pageSize — its page cap is smaller than " +
          "requested; lower pageSize to its cap or keys will be dropped")
      entries
    } finally conn.disconnect()
  }

  /** Parse a `ListBucketResult` document into page entries, in document
    * order (the server contract says ascending key order — [[PagedLister
    * .listAll]] asserts it, so a misbehaving server fails loudly rather
    * than silently skipping keys), plus the document's `IsTruncated`
    * flag when present (None for servers that omit it).
    */
  private def parseListing(in: java.io.InputStream)
      : (Seq[PageEntry], Option[Boolean]) = {
    val dbf = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    // untrusted XML: no DTDs, no external entities
    dbf.setFeature(
      "http://apache.org/xml/features/disallow-doctype-decl", true)
    dbf.setXIncludeAware(false)
    dbf.setExpandEntityReferences(false)
    val doc = dbf.newDocumentBuilder().parse(in)
    val truncated = {
      val ns = doc.getElementsByTagName("IsTruncated")
      if (ns.getLength == 0) None
      else Some(ns.item(0).getTextContent.trim.equalsIgnoreCase("true"))
    }
    val contents = doc.getElementsByTagName("Contents")
    val entries = (0 until contents.getLength).map { i =>
      val el = contents.item(i).asInstanceOf[org.w3c.dom.Element]
      def text(tag: String): String = {
        val ns = el.getElementsByTagName(tag)
        require(ns.getLength == 1,
          s"Contents entry $i: expected one <$tag>, got ${ns.getLength}")
        ns.item(0).getTextContent
      }
      PageEntry(
        key = text("Key"),
        mtimeMillis = java.time.Instant.parse(text("LastModified"))
          .toEpochMilli,
        size = text("Size").toLong)
    }
    (entries, truncated)
  }
}

object S3HttpPager {
  /** The host string that goes into the SigV4 canonical request.
    * HttpURLConnection omits SCHEME-DEFAULT ports from the Host header
    * it transmits, so an endpoint written `http://host:80/` (or
    * `https://host:443/`) must sign plain `host` — signing `host:80`
    * while the server sees `host` fails verification on every request
    * with 403. Non-default ports (the usual emulator/test shape) are
    * kept, matching the transmitted header.
    */
  private[graft] def signedHostFor(baseUri: java.net.URI): String = {
    val defaultPort =
      if (baseUri.getScheme == "https") 443 else 80
    baseUri.getHost +
      (if (baseUri.getPort > 0 && baseUri.getPort != defaultPort)
        s":${baseUri.getPort}" else "")
  }
}

package graft.sources

/** AWS Signature Version 4 request signing — the auth layer the
  * reference's S3 listing client gets from the AWS SDK
  * (/root/reference/src/s3/s3_operator.rs builds its client from the
  * standard credential chain; every ListObjectsV2 request it sends is
  * SigV4-signed). Implemented from the PUBLIC signing specification
  * ("Signature Version 4 signing process", AWS general reference):
  *
  *   1. canonical request  = METHOD \n uri \n query \n headers \n
  *                           signedHeaderNames \n payloadHash
  *   2. string to sign     = AWS4-HMAC-SHA256 \n timestamp \n scope \n
  *                           hex(sha256(canonicalRequest))
  *   3. signing key        = HMAC chain secret→date→region→service→
  *                           "aws4_request"
  *   4. signature          = hex(hmac(signingKey, stringToSign))
  *
  * JDK-only (javax.crypto + MessageDigest), verified against the
  * published example vectors (the `get-vanilla-query` family) in
  * S3SigV4Spec, and exercised end-to-end by S3HttpPagerSpec's in-test
  * HTTP server, which re-derives the signature server-side and rejects
  * a request whose Authorization header does not match.
  */
object S3SigV4 {

  final case class Credentials(accessKey: String, secretKey: String,
      sessionToken: Option[String] = None)

  private val Algorithm = "AWS4-HMAC-SHA256"

  /** Hex sha256 of an empty payload — every GET we sign. */
  val EmptyPayloadHash: String =
    "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855"

  private def hex(b: Array[Byte]): String =
    b.map(x => f"$x%02x").mkString

  private[graft] def sha256Hex(s: String): String =
    hex(java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8)))

  private def hmac(key: Array[Byte], data: String): Array[Byte] = {
    val mac = javax.crypto.Mac.getInstance("HmacSHA256")
    mac.init(new javax.crypto.spec.SecretKeySpec(key, "HmacSHA256"))
    mac.doFinal(data.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  /** AWS's URI-encoding rules (NOT java.net.URLEncoder's): unreserved
    * characters `A–Z a–z 0–9 - _ . ~` stay literal, space is `%20`
    * (never `+`), everything else percent-encodes its UTF-8 bytes with
    * UPPERCASE hex; `/` is encoded in query strings but kept literal in
    * object-key paths.
    */
  private[graft] def uriEncode(s: String,
      encodeSlash: Boolean = true): String = {
    val sb = new StringBuilder
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8).foreach { b =>
      val c = (b & 0xff).toChar
      if (c.isLetterOrDigit && c < 128 || "-_.~".contains(c)) sb.append(c)
      else if (c == '/' && !encodeSlash) sb.append(c)
      else sb.append(f"%%${b & 0xff}%02X")
    }
    sb.toString
  }

  /** Canonical query string: parameters sorted by encoded name then
    * encoded value, joined `k=v` with `&`.
    */
  private[graft] def canonicalQuery(
      params: Seq[(String, String)]): String =
    params.map { case (k, v) => (uriEncode(k), uriEncode(v)) }
      .sorted.map { case (k, v) => s"$k=$v" }.mkString("&")

  /** Canonical headers: lowercased names, trimmed values (runs of
    * spaces collapsed), sorted by name, each `name:value\n`.
    */
  private def canonicalHeaders(headers: Seq[(String, String)])
      : (String, String) = {
    val norm = headers.map { case (k, v) =>
      (k.toLowerCase(java.util.Locale.ROOT),
        v.trim.replaceAll("\\s+", " "))
    }.sortBy(_._1)
    (norm.map { case (k, v) => s"$k:$v\n" }.mkString,
      norm.map(_._1).mkString(";"))
  }

  private[graft] def canonicalRequest(method: String, path: String,
      query: Seq[(String, String)], headers: Seq[(String, String)],
      payloadHash: String): String = {
    val (ch, signed) = canonicalHeaders(headers)
    Seq(method, uriEncode(path, encodeSlash = false), canonicalQuery(query),
      ch, signed, payloadHash).mkString("\n")
  }

  private[graft] def stringToSign(amzDate: String, scope: String,
      canonicalRequestStr: String): String =
    Seq(Algorithm, amzDate, scope, sha256Hex(canonicalRequestStr))
      .mkString("\n")

  private[graft] def signingKey(secret: String, date: String,
      region: String, service: String): Array[Byte] = {
    val kDate = hmac(("AWS4" + secret)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8), date)
    val kRegion = hmac(kDate, region)
    val kService = hmac(kRegion, service)
    hmac(kService, "aws4_request")
  }

  private[graft] def signatureHex(signingKey: Array[Byte],
      stringToSignStr: String): String = hex(hmac(signingKey, stringToSignStr))

  /** Sign one request: returns every header the caller must set —
    * `host`, `x-amz-date`, `x-amz-content-sha256`, `authorization`
    * (and `x-amz-security-token` for temporary credentials). The
    * signature covers exactly these headers plus host, so a replayed
    * request with any of them altered fails server-side verification.
    *
    * @param amzDate `yyyyMMdd'T'HHmmss'Z'` UTC request timestamp —
    *        injectable so specs can pin the published vectors' clock
    */
  def signedHeaders(method: String, host: String, path: String,
      query: Seq[(String, String)], creds: Credentials, region: String,
      service: String, amzDate: String,
      payloadHash: String = EmptyPayloadHash): Map[String, String] = {
    val date = amzDate.take(8)
    val scope = s"$date/$region/$service/aws4_request"
    val baseHeaders = Seq("host" -> host, "x-amz-date" -> amzDate,
      "x-amz-content-sha256" -> payloadHash) ++
      creds.sessionToken.map("x-amz-security-token" -> _).toSeq
    val cr = canonicalRequest(method, path, query, baseHeaders, payloadHash)
    val sts = stringToSign(amzDate, scope, cr)
    val sig = hex(hmac(
      signingKey(creds.secretKey, date, region, service), sts))
    val signedNames = baseHeaders.map(_._1.toLowerCase(java.util.Locale.ROOT))
      .sorted.mkString(";")
    (baseHeaders :+ ("authorization" ->
      (s"$Algorithm Credential=${creds.accessKey}/$scope, " +
        s"SignedHeaders=$signedNames, Signature=$sig"))).toMap
  }

  /** Current UTC timestamp in the `x-amz-date` wire format. */
  def nowAmzDate(): String =
    java.time.format.DateTimeFormatter.ofPattern("yyyyMMdd'T'HHmmss'Z'")
      .withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.now())
}

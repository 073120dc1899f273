package graft

import graft.sources.S3SigV4
import org.scalatest.funsuite.AnyFunSuite

/** [[S3SigV4]] against AWS's PUBLISHED example vectors (the worked
  * `GET /?Action=ListUsers&Version=2010-05-08` example of the
  * "Signature Version 4 signing process" documentation, and the
  * signing-key derivation example) — every intermediate artifact is
  * pinned: canonical-request hash, string-to-sign, derived signing
  * key, final signature. A signer that matches all four interoperates
  * with real S3; S3HttpPagerSpec then drives the header path against a
  * live verifying HTTP server.
  */
class S3SigV4Spec extends AnyFunSuite {

  // the published example credentials (AWS documentation constants)
  private val Secret = "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY"
  private val AmzDate = "20150830T123600Z"
  private val Scope = "20150830/us-east-1/iam/aws4_request"

  private val query = Seq("Action" -> "ListUsers", "Version" -> "2010-05-08")
  private val headers = Seq(
    "host" -> "iam.amazonaws.com",
    "x-amz-date" -> AmzDate,
    "content-type" -> "application/x-www-form-urlencoded; charset=utf-8")

  private def canonical = S3SigV4.canonicalRequest("GET", "/", query,
    headers, S3SigV4.EmptyPayloadHash)

  test("canonical request hashes to the published vector") {
    assert(canonical.startsWith("GET\n/\nAction=ListUsers&Version=2010-05-08\n"))
    assert(canonical.contains(
      "content-type:application/x-www-form-urlencoded; charset=utf-8\n"))
    assert(canonical.contains("\ncontent-type;host;x-amz-date\n"))
    assert(S3SigV4.sha256Hex(canonical) ===
      "f536975d06c0309214f805bb90ccff089219ecd68b2577efef23edd43b7e1a59")
  }

  test("string to sign matches the published vector") {
    assert(S3SigV4.stringToSign(AmzDate, Scope, canonical) ===
      s"""AWS4-HMAC-SHA256
         |$AmzDate
         |$Scope
         |f536975d06c0309214f805bb90ccff089219ecd68b2577efef23edd43b7e1a59"""
        .stripMargin)
  }

  test("derived signing key matches the published vector") {
    val k = S3SigV4.signingKey(Secret, "20150830", "us-east-1", "iam")
    assert(k.map(b => f"$b%02x").mkString ===
      "c4afb1cc5771d871763a393e44b703571b55cc28424d1a5e86da6ed3c154a4b9")
  }

  test("final signature matches the published vector") {
    val sts = S3SigV4.stringToSign(AmzDate, Scope, canonical)
    val k = S3SigV4.signingKey(Secret, "20150830", "us-east-1", "iam")
    assert(S3SigV4.signatureHex(k, sts) ===
      "5d672d79c15b13162d9279b0855cfba6789a8edb4c82c400e06b5924a6f2b5d7")
  }

  test("uriEncode follows AWS rules, not URLEncoder's") {
    assert(S3SigV4.uriEncode("AZaz09-_.~") === "AZaz09-_.~") // unreserved
    assert(S3SigV4.uriEncode("a b") === "a%20b") // space is %20, never +
    assert(S3SigV4.uriEncode("a/b") === "a%2Fb") // query: slash encoded
    assert(S3SigV4.uriEncode("a/b", encodeSlash = false) === "a/b") // path
    assert(S3SigV4.uriEncode("€") === "%E2%82%AC") // UTF-8 bytes, upper hex
    assert(S3SigV4.uriEncode("a+b=c&d") === "a%2Bb%3Dc%26d")
  }

  test("canonical query sorts by encoded name and encodes values") {
    assert(S3SigV4.canonicalQuery(Seq("prefix" -> "t/2024/",
      "list-type" -> "2", "start-after" -> "t/2024/01/02/x y.parquet")) ===
      "list-type=2&prefix=t%2F2024%2F" +
        "&start-after=t%2F2024%2F01%2F02%2Fx%20y.parquet")
  }

  test("signedHeaders emits the full header set incl. session token") {
    val h = S3SigV4.signedHeaders("GET", "s3.example.com:9000", "/",
      Seq("list-type" -> "2"),
      S3SigV4.Credentials("AKID", "sk", Some("TOKEN")),
      "us-east-1", "s3", AmzDate)
    assert(h("x-amz-date") === AmzDate)
    assert(h("x-amz-content-sha256") === S3SigV4.EmptyPayloadHash)
    assert(h("x-amz-security-token") === "TOKEN")
    val auth = h("authorization")
    assert(auth.startsWith("AWS4-HMAC-SHA256 Credential=AKID/20150830/" +
      "us-east-1/s3/aws4_request, "))
    assert(auth.contains("SignedHeaders=host;x-amz-content-sha256;" +
      "x-amz-date;x-amz-security-token, "))
    assert(auth.matches(".*Signature=[0-9a-f]{64}$"))
  }
}

package graft.functions

import java.nio.charset.StandardCharsets.UTF_8
import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

/** AWS Signature Version 4 signing math — the deterministic core of the
  * reference's push to Amazon Managed Prometheus
  * (`collector/internal/utils/prometheus.go:129-167`, which delegates to
  * the sigv4 round-tripper). The algorithm is public AWS documentation
  * ("Signature Version 4 signing process"): a canonical request is
  * hashed into a string-to-sign, and an HMAC-SHA256 chain over
  * (date, region, service, "aws4_request") derives the signing key.
  *
  * The network send itself is out of the deterministic surface (AWS
  * infra); everything UP TO the Authorization header value is pure
  * string/hash arithmetic and is re-expressed here. The hash-only part
  * (payload hash, canonical request, string-to-sign) is DuckDB-oracle
  * checked by the `prom_push_sigv4` entry; the HMAC chain (binary
  * intermediates — not expressible in the oracle's VARCHAR-only sha256)
  * is pinned by Sigv4Spec against the AWS documentation's published
  * example vector.
  */
object Sigv4 {

  private def hmacSha256(key: Array[Byte], msg: Array[Byte]): Array[Byte] = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(key, "HmacSHA256"))
    mac.doFinal(msg)
  }

  private def hex(b: Array[Byte]): String =
    b.map("%02x".format(_)).mkString

  def sha256Hex(s: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    hex(md.digest(s.getBytes(UTF_8)))
  }

  /** kSigning = HMAC(HMAC(HMAC(HMAC("AWS4"+secret, date), region),
    * service), "aws4_request") — the per-day derived signing key. */
  def signingKey(secret: String, dateStamp: String, region: String,
                 service: String): Array[Byte] =
    Seq(dateStamp, region, service, "aws4_request")
      .foldLeft(s"AWS4$secret".getBytes(UTF_8)) { (k, part) =>
        hmacSha256(k, part.getBytes(UTF_8))
      }

  /** Canonical request per the SigV4 spec: method, URI, query string,
    * canonical headers (each `name:value\n`), signed-header list,
    * lowercase-hex payload hash — newline-joined. Headers must already
    * be lowercase-named and sorted. */
  def canonicalRequest(method: String, uri: String, query: String,
                       headers: Seq[(String, String)],
                       payloadSha256: String): String = {
    val canonHeaders = headers.map { case (n, v) => s"$n:$v" }.mkString("\n")
    val signedHeaders = headers.map(_._1).mkString(";")
    Seq(method, uri, query, canonHeaders, "", signedHeaders, payloadSha256)
      .mkString("\n")
  }

  def stringToSign(amzDate: String, scope: String,
                   canonicalRequestSha256: String): String =
    Seq("AWS4-HMAC-SHA256", amzDate, scope, canonicalRequestSha256)
      .mkString("\n")

  /** Final lowercase-hex signature over the string-to-sign. */
  def sign(secret: String, dateStamp: String, region: String,
           service: String, stringToSign: String): String =
    hex(hmacSha256(signingKey(secret, dateStamp, region, service),
      stringToSign.getBytes(UTF_8)))

  /** The full Authorization header value the signed POST would carry. */
  def authorizationHeader(accessKeyId: String, dateStamp: String,
                          region: String, service: String,
                          signedHeaders: String, signature: String): String =
    s"AWS4-HMAC-SHA256 Credential=$accessKeyId/$dateStamp/$region/$service/aws4_request, " +
      s"SignedHeaders=$signedHeaders, Signature=$signature"
}

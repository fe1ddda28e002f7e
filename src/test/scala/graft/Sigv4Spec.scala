package graft

import graft.functions.Sigv4
import graft.operators.PromPush
/** SigV4 signing math, pinned against the AWS documentation's own
  * published example (the GET iam ListUsers walkthrough in "Signature
  * Version 4 signing process"), plus the prom_push_sigv4 entry's
  * signature over real rows. */
class Sigv4Spec extends SparkTestBase {

  private val docSecret = "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY"

  test("AWS docs example: canonical request hash and final signature") {
    val creq = Sigv4.canonicalRequest(
      method = "GET", uri = "/", query = "Action=ListUsers&Version=2010-05-08",
      headers = Seq(
        "content-type" -> "application/x-www-form-urlencoded; charset=utf-8",
        "host" -> "iam.amazonaws.com",
        "x-amz-date" -> "20150830T123600Z"),
      payloadSha256 = Sigv4.sha256Hex(""))
    val ch = Sigv4.sha256Hex(creq)
    assert(ch == "f536975d06c0309214f805bb90ccff089219ecd68b2577efef23edd43b7e1a59",
      "canonical request hash must match the AWS documentation example")
    val sts = Sigv4.stringToSign("20150830T123600Z",
      "20150830/us-east-1/iam/aws4_request", ch)
    val sig = Sigv4.sign(docSecret, "20150830", "us-east-1", "iam", sts)
    assert(sig == "5d672d79c15b13162d9279b0855cfba6789a8edb4c82c400e06b5924a6f2b5d7",
      "signature must match the AWS documentation example")
  }

  test("empty-payload sha256 is the well-known constant") {
    assert(Sigv4.sha256Hex("") ==
      "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855")
  }

  test("prom_push_sigv4 rows sign deterministically and consistently") {
    val rows = PromPush.pushSigv4(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val sts = r.getString(4)
      // the entry's own staging is internally consistent
      val parts = sts.split("\n", -1)
      assert(parts.length == 4 && parts(0) == "AWS4-HMAC-SHA256" &&
        parts(1) == PromPush.AmzDate && parts(2) == PromPush.Scope)
      assert(parts(3) == r.getString(3), "string_to_sign embeds creq_sha256")
      // signing is a pure function: twice over the same row, same result
      val s1 = Sigv4.sign(docSecret, PromPush.DateStamp, PromPush.Region,
        PromPush.Service, sts)
      val s2 = Sigv4.sign(docSecret, PromPush.DateStamp, PromPush.Region,
        PromPush.Service, sts)
      assert(s1 == s2 && s1.length == 64 && s1.matches("[0-9a-f]{64}"))
      val auth = Sigv4.authorizationHeader("AKIDEXAMPLE", PromPush.DateStamp,
        PromPush.Region, PromPush.Service, PromPush.SignedHeaders, s1)
      assert(auth.startsWith("AWS4-HMAC-SHA256 Credential=AKIDEXAMPLE/" +
        s"${PromPush.DateStamp}/${PromPush.Region}/${PromPush.Service}/aws4_request"))
      assert(auth.endsWith(s"Signature=$s1"))
    }
    // distinct payloads sign to distinct signatures
    val sigs = rows.map(r => Sigv4.sign(docSecret, PromPush.DateStamp,
      PromPush.Region, PromPush.Service, r.getString(4)))
    assert(sigs.distinct.length == rows.length)
  }
}

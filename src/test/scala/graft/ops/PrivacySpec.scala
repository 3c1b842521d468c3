package graft.ops

import graft.SparkSpec

class PrivacySpec extends SparkSpec {
  import spark.implicits._

  private val samples = Seq(
    (1L, "contact me at jane.doe+spam@example.co.uk or 555-123-4567"),
    (2L, "server at 192.168.0.1 responded"),
    (3L, "totally clean text with no identifiers"),
    (4L, "two mails: a@b.io c.d@e-corp.com and ip 10.0.0.255"))
    .toDF("doc_id", "text")

  test("detect counts each PII class") {
    val got = Privacy.detect(samples, "text")
      .select("doc_id", "n_emails", "n_phones", "n_ips", "has_pii")
      .as[(Long, Long, Long, Long, Int)].collect().sortBy(_._1)
    assert(got(0) == ((1L, 1L, 1L, 0L, 1)))
    assert(got(1) == ((2L, 0L, 0L, 1L, 1)))
    assert(got(2) == ((3L, 0L, 0L, 0L, 0)))
    assert(got(3) == ((4L, 2L, 0L, 1L, 1)))
  }

  test("redaction replaces spans with typed placeholders and is idempotent") {
    val red = samples.select($"doc_id", Privacy.redact($"text").as("r"))
      .as[(Long, String)].collect().sortBy(_._1).toMap
    assert(red(1L) == "contact me at <EMAIL> or <PHONE>")
    assert(red(2L) == "server at <IP> responded")
    assert(red(3L) == "totally clean text with no identifiers")
    assert(red(4L) == "two mails: <EMAIL> <EMAIL> and ip <IP>")
    val twice = samples.select(Privacy.redact(Privacy.redact($"text")).as("r"))
      .as[String].collect().toSet
    assert(twice == red.values.toSet, "redaction is idempotent")
  }
}

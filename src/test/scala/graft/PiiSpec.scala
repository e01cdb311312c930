package graft

import graft.ext.Pii
import org.apache.spark.sql.functions._

class PiiSpec extends SparkSpec {
  import spark.implicits._

  test("detect: each pattern fires on its shape and nothing else") {
    val docs = Seq(
      (1L, "mail me at a.b+c%d@sub.example.co today"),
      (2L, "call +1 555 123 4567 or +44 020 555 1234"),
      (3L, "ssn is 123-45-6789."),
      (4L, "host 192.168.0.1 and 10.0.0.255"),
      (5L, "plain words only, no identifiers here"),
    ).toDF("doc_id", "text")
    val d = Pii.detect(docs).collect().map(r => r.getLong(0) ->
      (r.getAs[Long]("n_email"), r.getAs[Long]("n_phone"),
        r.getAs[Long]("n_ssn"), r.getAs[Long]("n_ipv4"))).toMap
    assert(d(1L) == ((1L, 0L, 0L, 0L)))
    assert(d(2L) == ((0L, 2L, 0L, 0L)))
    assert(d(3L) == ((0L, 0L, 1L, 0L)))
    assert(d(4L) == ((0L, 0L, 0L, 2L)))
    assert(d(5L) == ((0L, 0L, 0L, 0L)))
  }

  test("redact: registry order keeps an email's host from leaking as a bare match") {
    val out = Pii.redact(Seq(
      (1L, "write 9a9@10.0.0.1.net from 10.0.0.1 ssn 123-45-6789"),
    ).toDF("doc_id", "text")).select("redacted").as[String].head()
    // the email (including its dotted-quad host) is consumed as ONE email
    // match; the standalone address still redacts as an IP
    assert(out == "write [EMAIL] from [IP] ssn [SSN]")
  }

  test("redact leaves clean text byte-identical") {
    val clean = "the quick brown fox at example dot com"
    val out = Pii.redact(Seq((1L, clean)).toDF("doc_id", "text"))
      .select("redacted").as[String].head()
    assert(out == clean)
  }

  test("domainStats: per-domain doc/url counts, blocklist drops the domain entirely") {
    val docs = Seq(
      (1L, "see https://a.example.org/x and https://a.example.org/y"),
      (2L, "see https://a.example.org/z plus http://bad.tracker.net/p"),
      (3L, "only http://bad.tracker.net/q here"),
      (4L, "no urls at all"),
    ).toDF("doc_id", "text")
    val got = Pii.domainStats(docs, Seq("bad.tracker.net")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(("a.example.org", 2L, 3L)))
  }
}

package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection/redaction and URL/domain hygiene (north-star extension:
  * the privacy + provenance gates every training-data pipeline runs
  * before export).
  *
  * Every pattern is written in the regex intersection of Java
  * (`java.util.regex`, Spark's engine) and RE2 (DuckDB's engine) —
  * character classes, bounded repetition, ASCII `\b` — so the oracle
  * replays the exact same matches. Detection and redaction are pure
  * per-row projections: one corpus scan, zero shuffles at any scale.
  * Domain stats add the one unavoidable domain-keyed aggregation
  * (map-side combinable).
  */
object Pii {

  /** Pattern registry: type → (regex, redaction placeholder). Order
    * matters for redaction — emails first (an email's domain must not
    * survive as a bare-domain match), phones before SSN-shaped digit
    * runs. */
  val patterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]"),
    ("phone", "\\+[0-9]{1,2} [0-9]{3} [0-9]{3} [0-9]{4}", "[PHONE]"),
    ("ssn", "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b", "[SSN]"),
    ("ipv4", "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "[IP]"),
  )

  private val urlRe = "https?://[A-Za-z0-9.-]+[A-Za-z0-9./_%-]*"
  private val domainRe = "https?://([A-Za-z0-9.-]+)"

  /** Per-type match counts (`n_email`, `n_phone`, …) — the triage signal
    * that routes documents to redaction or the reject pile. */
  def detect(docs: DataFrame, textCol: String = "text"): DataFrame =
    patterns.foldLeft(docs) { case (df, (name, re, _)) =>
      df.withColumn(s"n_$name",
        size(regexp_extract_all(col(textCol), lit(re), lit(0))).cast("long"))
    }

  /** Replace every match with its typed placeholder, in registry order
    * (email's full form is consumed before the bare-IP/digit patterns
    * can bite its pieces). */
  def redactCol(text: Column): Column =
    patterns.foldLeft(text) { case (c, (_, re, mask)) =>
      regexp_replace(c, lit(re), lit(mask))
    }

  def redact(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn("redacted", redactCol(col(textCol)))

  /** Per-domain URL stats with a provenance blocklist: explode every URL
    * match, extract the host, drop blocklisted hosts, aggregate. The
    * blocklist is a literal predicate (bounded metadata) — a broadcast
    * anti-join only becomes necessary when the blocklist itself is a
    * table. */
  def domainStats(docs: DataFrame, blocklist: Seq[String],
                  textCol: String = "text"): DataFrame = {
    val urls = docs.select(col("doc_id"),
        explode(regexp_extract_all(col(textCol), lit(urlRe), lit(0))).as("url"))
      .select(col("doc_id"),
        regexp_extract(col("url"), domainRe, 1).as("domain"))
      .where(col("domain") =!= "" && !col("domain").isin(blocklist: _*))
    urls.groupBy("domain")
      .agg(countDistinct(col("doc_id")).as("n_docs"), count(lit(1)).as("n_urls"))
  }
}

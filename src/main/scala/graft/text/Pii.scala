package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PII detection + redaction over `documents(doc_id, text, …)` — the
  * scrubbing pass a training-data pipeline runs before anything else
  * ships: count and mask email addresses, IPv4 literals, and
  * plus-prefixed phone numbers.
  *
  * Pattern discipline: every regex is written in the Java-regex ∩ RE2
  * portable subset (explicit `[0-9]` classes — `\d` and `\s` are NOT
  * portable, see [[TextAnalysis.WsChars]]; `\b` is ASCII word-boundary
  * in both engines), so the DuckDB oracle matches byte-for-byte.
  * Detection counts come from the ORIGINAL text (an IPv4 inside an
  * email host counts as both); redaction is sequential
  * email → IP → phone, identically ordered in both engines, so a
  * address consumed by `<EMAIL>` is not re-masked as an IP.
  *
  * Scale shape: pure per-row map work, zero shuffle, all codegen'd
  * regexp — the cheapest operator class in the engine. NULL text
  * null-propagates through counts, verdict, and redaction (same
  * policy as [[TextAnalysis.fingerprints]]: NULL is not "clean").
  */
object Pii {

  /** user@host.tld with the usual atom characters; 2+ alpha TLD. */
  val EmailRe: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  /** Dotted quad, word-bounded so trailing octets don't re-match. */
  val Ipv4Re: String = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
  /** E.164-ish: plus-prefixed run of 7..15 digits (bare digit runs are
    * ids/quantities far more often than phones — precision over recall). */
  val PhoneRe: String = "\\+[0-9]{7,15}"

  def piiScrub(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        regexp_count(col("text"), lit(EmailRe)).cast("long").as("n_emails"),
        regexp_count(col("text"), lit(Ipv4Re)).cast("long").as("n_ips"),
        regexp_count(col("text"), lit(PhoneRe)).cast("long").as("n_phones"),
        regexp_replace(
          regexp_replace(
            regexp_replace(col("text"), lit(EmailRe), lit("<EMAIL>")),
            lit(Ipv4Re), lit("<IP>")),
          lit(PhoneRe), lit("<PHONE>")).as("redacted"))
      .withColumn("n_pii", col("n_emails") + col("n_ips") + col("n_phones"))
      .withColumn("has_pii", col("n_pii") > 0L)
      .select(col("doc_id"), col("n_emails"), col("n_ips"), col("n_phones"),
        col("n_pii"), col("has_pii"), col("redacted"))

  def piiScrubSql: String =
    s"""WITH p AS (
       |  SELECT doc_id,
       |    CAST(len(regexp_extract_all(text, '$EmailRe')) AS BIGINT) AS n_emails,
       |    CAST(len(regexp_extract_all(text, '$Ipv4Re')) AS BIGINT) AS n_ips,
       |    CAST(len(regexp_extract_all(text, '$PhoneRe')) AS BIGINT) AS n_phones,
       |    regexp_replace(regexp_replace(regexp_replace(text,
       |      '$EmailRe', '<EMAIL>', 'g'),
       |      '$Ipv4Re', '<IP>', 'g'),
       |      '$PhoneRe', '<PHONE>', 'g') AS redacted
       |  FROM documents
       |)
       |SELECT doc_id, n_emails, n_ips, n_phones,
       |  n_emails + n_ips + n_phones AS n_pii,
       |  n_emails + n_ips + n_phones > 0 AS has_pii,
       |  redacted
       |FROM p
       |ORDER BY doc_id, n_emails, n_ips, n_phones, n_pii, has_pii, redacted""".stripMargin
}

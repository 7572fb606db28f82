package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Structured PII accounting + redaction for training-data curation.
  *
  * Web text leaks emails, IP addresses and phone numbers; pipelines
  * that feed LLM pre-training redact them BEFORE tokenization (the
  * BigCode/StarCoder and CCNet lineages both ship exactly this regex
  * family). This operator complements [[TextOps.redactPii]] (the
  * quick email/URL/digit-run rewrite): it adds IPv4 and
  * international-phone categories and — the part a rewrite alone
  * can't give — PER-CATEGORY MATCH COUNTS, which is what downstream
  * policy needs (`pii_total > k` drop rules, per-source audit
  * metrics). Redaction is a pure per-row string rewrite — map-only,
  * no shuffle, scan-bound at 100 TB — so every operator here is a
  * column expression chain that stays inside whole-stage codegen.
  *
  * Pattern notes:
  *  - Every pattern is written in the common subset of java.util.regex
  *    and RE2 (no backreferences, no lookaround) so the DuckDB oracle
  *    can run the SAME pattern verbatim — the regex string itself is
  *    part of the certified contract.
  *  - Phone matching is international-format only (leading `+`): bare
  *    national formats collide with dates, ids and prices; the
  *    false-positive cost of redacting those exceeds the recall gain.
  *    Callers with labeled data can widen the pattern.
  *  - Redaction is sequential (email → IPv4 → phone) and each stage
  *    counts matches on ITS input, so a digit run inside an email
  *    never double-counts as a phone: it is already `<EMAIL>` by the
  *    time the phone stage scans.
  */
object PiiOps {

  /** RFC-5322-ish address, the pragmatic crawl subset. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9][A-Za-z0-9.-]*\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4; `\b` keeps version strings like 1.2.3.4.5 out. */
  val Ipv4Pattern = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

  /** International phone: `+` country code then 7-14 more digits with
    * optional single separators (space, dash, dot, parens). */
  val PhonePattern =
    "\\+[0-9]{1,3}[ .-]?(?:\\([0-9]{1,4}\\)[ .-]?)?[0-9]{2,4}(?:[ .-]?[0-9]{2,4}){1,3}"

  val EmailToken = "<EMAIL>"
  val Ipv4Token = "<IP>"
  val PhoneToken = "<PHONE>"

  /** text → (redacted text, per-category match counts). NULL text
    * passes through as NULL with zero counts (null is data, not an
    * error). Columns appended: `text_redacted`, `n_emails`, `n_ipv4`,
    * `n_phones`, `pii_total`. */
  def redactPii(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t0 = col(textCol)
    val nEmail = coalesce(size(regexp_extract_all(t0, lit(EmailPattern), lit(0))), lit(0))
    val t1 = regexp_replace(t0, EmailPattern, EmailToken)
    val nIp = coalesce(size(regexp_extract_all(t1, lit(Ipv4Pattern), lit(0))), lit(0))
    val t2 = regexp_replace(t1, Ipv4Pattern, Ipv4Token)
    val nPhone = coalesce(size(regexp_extract_all(t2, lit(PhonePattern), lit(0))), lit(0))
    val t3 = regexp_replace(t2, PhonePattern, PhoneToken)
    docs
      .withColumn("text_redacted", t3)
      .withColumn("n_emails", nEmail)
      .withColumn("n_ipv4", nIp)
      .withColumn("n_phones", nPhone)
      .withColumn("pii_total", nEmail + nIp + nPhone)
  }
}

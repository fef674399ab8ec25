package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text normalization and PII redaction — the scrubbing pass a
  * training-data pipeline runs before anything else touches the corpus.
  * The reference has no text-cleaning surface (its nearest relative is
  * the recursive `sanitize_document`, src/data_sync.py:660-684, which
  * scrubs *structure*, not content); at 100 TB this layer is mandatory:
  * raw web text carries emails, IPs and phone numbers that must not
  * reach a training set.
  *
  * Everything is a pure `Column` regex projection — codegen'd, no UDFs,
  * no shuffle: the scrub runs at scan speed and composes with any
  * downstream operator. Every pattern is deliberately lookaround-free so
  * Java regex (Spark) and RE2 (DuckDB oracle) agree byte-for-byte.
  */
object Scrub {

  /** RFC-5322-lite email matcher — the pragmatic production pattern
    * (full RFC matching is not regular). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4, word-bounded so version strings ("1.2.3.4000")
    * don't half-match. Deliberately permissive on octet range (999 is
    * matched) — redaction prefers false positives over leaks. */
  val Ipv4Re = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

  /** International phone shape `+CC NNN NNNN`-style: a `+` country code
    * then 2-3 space- or dash-separated digit groups. */
  val PhoneRe = "\\+[0-9]{1,3}([- ][0-9]{2,4}){2,3}"

  /** Collapse all whitespace runs (incl. tabs/newlines) to single spaces
    * and trim — the canonical pre-tokenization normalization. */
  def normalizeWs(text: Column): Column =
    trim(regexp_replace(text, "\\s+", " "))

  /** Strip ASCII control characters (keep \t \n which normalizeWs
    * handles) — codec noise in scraped corpora. */
  def stripControl(text: Column): Column =
    regexp_replace(text, "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", "")

  def redactEmails(text: Column): Column =
    regexp_replace(text, EmailRe, "<EMAIL>")

  def redactIps(text: Column): Column =
    regexp_replace(text, Ipv4Re, "<IP>")

  def redactPhones(text: Column): Column =
    regexp_replace(text, PhoneRe, "<PHONE>")

  /** The full scrub: control-strip → whitespace-normalize → redact.
    * Email first — an address's host part would otherwise feed the IP
    * matcher a dotted tail. */
  def clean(text: Column): Column =
    redactPhones(redactIps(redactEmails(normalizeWs(stripControl(text)))))

  def countEmails(text: Column): Column =
    size(regexp_extract_all(text, lit(EmailRe), lit(0)))

  def countIps(text: Column): Column =
    size(regexp_extract_all(redactEmails(text), lit(Ipv4Re), lit(0)))

  def countPhones(text: Column): Column =
    size(regexp_extract_all(text, lit(PhoneRe), lit(0)))
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** PII detection and redaction for training corpora: emails, IPv4
  * addresses, and phone-like digit runs, as codegen'd regex Column
  * expressions (no UDF, no shuffle — the work fuses into the scan's
  * whole-stage-codegen span).
  *
  * Patterns deliberately use the regex subset with identical semantics
  * in Java's engine and RE2 (character classes, bounded quantifiers,
  * alternation — no lookaround, no backreferences), so detection counts
  * are reproducible across engines and the DuckDB oracle can verify
  * them exactly. They are pragmatic training-data scrubbers, not
  * validators: they over-match (e.g. `999.999.999.999` as IPv4) on the
  * principle that over-redaction is cheap and leakage is not.
  *
  * [[redact]] replaces in a fixed order — email, then IPv4, then
  * phone — so the narrower digit-run phone pattern never claims part of
  * an address already rewritten to a placeholder.
  */
object Pii {

  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
  /** Phone-like: optional +, then >= 8 chars of digits/space/()/-,
    * ending in a digit. No dot in the class, so IPv4s never match.
    */
  val PhonePattern = "\\+?[0-9][0-9()\\- ]{6,}[0-9]"

  def countEmails(text: Column): Column = regexp_count(text, lit(EmailPattern))
  def countIpv4(text: Column): Column = regexp_count(text, lit(Ipv4Pattern))
  def countPhones(text: Column): Column = regexp_count(text, lit(PhonePattern))

  /** Text with all three PII classes replaced by typed placeholders. */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, "<EMAIL>"),
        Ipv4Pattern, "<IP>"),
      PhonePattern, "<PHONE>")

  /** Per-document PII stats: counts per class + the redacted text.
    * One codegen'd projection. Counts are INDEPENDENT detections on the
    * original text, not placeholder tallies: a string matching two
    * classes (an email whose domain parses as an IPv4) counts once per
    * class but is redacted once, by the first pattern in [[redact]]'s
    * order — do not reconcile counts against placeholder occurrences.
    */
  def piiStats(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      countEmails(col(textCol)).cast(LongType).as("n_emails"),
      countIpv4(col(textCol)).cast(LongType).as("n_ipv4"),
      countPhones(col(textCol)).cast(LongType).as("n_phones"),
      redact(col(textCol)).as("redacted"))
}

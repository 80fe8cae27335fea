package graft.textanalysis

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII-style pattern redaction for training text — detect and mask
  * sensitive spans (emails, id-like digit runs, IPs) before a corpus
  * ships. Pure single-pass column expressions: the regexes are
  * RE2-compatible (no lookaround, no backreferences), so any engine —
  * and the DuckDB oracle — replays the identical redaction, and the
  * operators stay inside whole-stage codegen and scale with the scan.
  */
object Redact {

  /** Conservative pattern library. Character classes are spelled out
    * (no `\d`/`\w` shorthand) because shorthand-class semantics differ
    * across regex engines under unicode; these do not. */
  val Email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4 = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
  val DigitRun = "[0-9]+"

  /** Number of pattern matches in the text (detection / audit side). */
  def hitCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  /** The text with every match replaced by `token`. */
  def redact(text: Column, pattern: String, token: String): Column =
    regexp_replace(text, pattern, token)

  /** Apply several (pattern, token) rules in order. Order matters when
    * patterns overlap — put the most specific first (an email contains
    * digit runs; redact emails before digits). */
  def redactAll(text: Column, rules: Seq[(String, String)]): Column =
    rules.foldLeft(text) { case (c, (p, t)) => redact(c, p, t) }
}

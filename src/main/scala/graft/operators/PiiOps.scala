package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection + redaction — the safety pass every LLM training
  * corpus runs before anything else sees the text: find
  * emails / IPv4s / phone-shaped numbers, count them per document
  * (the triage signal: a doc that is 40% phone numbers is a scrape
  * artifact, not prose) and emit the redacted text with typed
  * placeholders.
  *
  * All codegen'd built-ins (`regexp_replace` / `regexp_count`-style
  * via size(split)), replacements are LITERAL placeholders (no group
  * references — the [[UrlOps]] java-$1/RE2-\1 divergence designed
  * out), patterns use explicit classes portable across java.util.regex
  * and RE2. Redaction order is part of the contract (emails first —
  * an address contains digit runs a phone pattern could claim; then
  * IPv4; then phones) and both engines apply the identical chain.
  */
object PiiOps {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+"
  val Ipv4Re = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
  val PhoneRe = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{3}-[0-9]{4}"

  /** Matches of `re` in `c`, counted portably: split on the pattern
    * yields matches+1 pieces (codegen'd; neither engine needs a
    * regexp_count builtin).
    */
  def countMatches(c: Column, re: String): Column =
    (size(split(c, re)) - 1).cast("long")

  def redact(text: Column): Column = {
    val e = regexp_replace(text, EmailRe, "<EMAIL>")
    val i = regexp_replace(e, Ipv4Re, "<IP>")
    regexp_replace(i, PhoneRe, "<PHONE>")
  }

  /** Identical chain as DuckDB SQL (one source of truth, the
    * HtmlText/UrlOps discipline). DuckDB `length(string_split_regex)`
    * counts the same pieces.
    */
  def duckCountSql(c: String, re: String): String =
    s"CAST(length(string_split_regex($c, '$re')) - 1 AS BIGINT)"

  def duckRedactSql(c: String): String = {
    val e = s"regexp_replace($c, '$EmailRe', '<EMAIL>', 'g')"
    val i = s"regexp_replace($e, '$Ipv4Re', '<IP>', 'g')"
    s"regexp_replace($i, '$PhoneRe', '<PHONE>', 'g')"
  }
}

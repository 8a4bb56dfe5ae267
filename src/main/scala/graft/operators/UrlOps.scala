package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL normalization + registrable-domain extraction — the crawl-side
  * twin of [[HtmlText]]: dedup keys, per-site quotas and robots/host
  * rollups all run on the NORMALIZED url, never the raw string (the
  * same page arrives as `HTTP://WWW.Site.COM:80/a#top` and
  * `http://www.site.com/a?utm_source=feed` — a byte-level dedup would
  * keep both).
  *
  * Everything is codegen'd built-ins (regexp_extract / regexp_replace
  * / lower / split) and the contract is regex-defined, engine-portable
  * — replacements use NO group references (java.util.regex says `$1`
  * where RE2 says `\1`; avoiding them keeps one pattern set valid on
  * both engines, the [[HtmlText]] discipline):
  *
  *  1. scheme and host lowercase; default port stripped (`:80` iff
  *     http, `:443` iff https);
  *  2. fragment dropped;
  *  3. `utm_*` tracking params dropped from the query (prepend `&`,
  *     strip `&utm_x=v` runs, re-strip the leading `&` — no
  *     group-ref rewriting), empty query drops its `?`;
  *  4. registrable domain: last 2 host labels, or last 3 under the
  *     compound public suffixes {co.uk, ac.uk, com.au} — a pinned
  *     mini suffix set (the full PSL is a data file, not an
  *     algorithm; the operator contract is suffix-set-parametric).
  */
object UrlOps {

  /** (scheme, host, port, path+query+fragment) split; authority =
    * `[^/?#]*` after `://` per RFC 3986's first-match-wins grammar.
    */
  def scheme(url: Column): Column =
    lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))

  def host(url: Column): Column =
    lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]*)", 1))

  private def port(url: Column): Column =
    regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#:]*:([0-9]+)", 1)

  private def pathQueryFrag(url: Column): Column =
    regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$", 1)

  def normalize(url: Column): Column = {
    val sch = scheme(url)
    val h = host(url)
    val p = port(url)
    val keepPort = when(p === "", lit(""))
      .when(sch === "http" && p === "80", lit(""))
      .when(sch === "https" && p === "443", lit(""))
      .otherwise(concat(lit(":"), p))
    val pqf = regexp_replace(pathQueryFrag(url), "#.*$", "") // drop fragment
    val path = regexp_extract(pqf, "^([^?]*)", 1)
    val query = regexp_extract(pqf, "\\?(.*)$", 1)
    val q1 = regexp_replace(concat(lit("&"), query), "&utm_[A-Za-z0-9_]+=[^&]*", "")
    val q2 = regexp_replace(q1, "^&", "")
    val tail = when(query === "" || q2 === "", path)
      .otherwise(concat(path, lit("?"), q2))
    concat(sch, lit("://"), h, keepPort, tail)
  }

  /** Registrable domain from a lowercase host. */
  def registrableDomain(h: Column): Column = {
    val parts = split(h, "\\.")
    when(h.rlike("\\.(co\\.uk|ac\\.uk|com\\.au)$"),
      array_join(slice(parts, -3, 3), "."))
      .otherwise(array_join(slice(parts, -2, 2), "."))
  }

  /** The identical normalization as DuckDB SQL (oracle generator — one
    * source of truth for both engines, like HtmlText.duckSql).
    */
  def duckNormalizeSql(u: String): String = {
    val sch = s"lower(regexp_extract($u, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    val h = s"lower(regexp_extract($u, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]*)', 1))"
    val p = s"regexp_extract($u, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#:]*:([0-9]+)', 1)"
    val keepPort = s"""CASE WHEN $p = '' THEN ''
      WHEN $sch = 'http' AND $p = '80' THEN ''
      WHEN $sch = 'https' AND $p = '443' THEN ''
      ELSE ':' || $p END"""
    val pqf =
      s"regexp_replace(regexp_extract($u, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$$', 1), '#.*$$', '', 'g')"
    val path = s"regexp_extract($pqf, '^([^?]*)', 1)"
    val query = s"regexp_extract($pqf, '\\?(.*)$$', 1)"
    val q2 =
      s"regexp_replace(regexp_replace('&' || $query, '&utm_[A-Za-z0-9_]+=[^&]*', '', 'g'), '^&', '')"
    s"""($sch || '://' || $h || $keepPort ||
        CASE WHEN $query = '' OR $q2 = '' THEN $path ELSE $path || '?' || $q2 END)"""
  }

  /** Registrable domain as DuckDB SQL over a lowercase host expr. */
  def duckRegistrableSql(h: String): String =
    s"""CASE WHEN regexp_matches($h, '\\.(co\\.uk|ac\\.uk|com\\.au)$$')
         THEN array_to_string(string_split($h, '.')[-3:], '.')
         ELSE array_to_string(string_split($h, '.')[-2:], '.') END"""
}

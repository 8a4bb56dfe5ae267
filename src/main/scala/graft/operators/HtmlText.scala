package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → text extraction (the WET step of a crawl-curation pipeline):
  * strip script/style subtrees, comments and tags, decode the fixed
  * entity set, collapse whitespace. Composed ENTIRELY from codegen'd
  * built-ins (`regexp_replace`/`replace`) — no UDF, no custom
  * expression — so the whole extraction stays inside WholeStageCodegen
  * and the operator is one map-only projection over the scan at any
  * scale.
  *
  * The contract is REGEX-DEFINED and engine-portable (the q316 oracle
  * replays the identical chain in DuckDB/RE2):
  *
  *  1. `(?is)<script\b[^>]*>.*?</script\s*>` → one space (likewise
  *     `<style>`): subtree content removed, non-greedy to the first
  *     closing tag; an UNCLOSED script/style tag is NOT guessed at —
  *     the open tag falls through to rule 3 and its content survives
  *     as text (stop-don't-guess, the multimodal walkers' rule).
  *  2. `(?s)<!--.*?-->` → one space.
  *  3. `(?s)<[^>]*>` → one space (any remaining tag).
  *  4. fixed entity set decoded by plain `replace`, `&amp;` LAST (so
  *     double-escaped text decodes exactly one level — `&amp;lt;`
  *     yields the literal `&lt;`).
  *  5. `[ \t\n\r\f]+` → one space, then trim. (Explicit class, not
  *     `\s`: java.util.regex includes \x0B in `\s`, RE2 does not.)
  */
object HtmlText {

  val Entities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&apos;" -> "'",
    "&#39;" -> "'", "&#34;" -> "\"", "&nbsp;" -> " ", "&amp;" -> "&")

  def extract(html: Column): Column = {
    val noScript = regexp_replace(html,
      "(?is)<script\\b[^>]*>.*?</script\\s*>", " ")
    val noStyle = regexp_replace(noScript,
      "(?is)<style\\b[^>]*>.*?</style\\s*>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "(?s)<[^>]*>", " ")
    val decoded = Entities.foldLeft(noTags) { case (c, (k, v)) =>
      call_function("replace", c, lit(k), lit(v))
    }
    trim(regexp_replace(decoded, "[ \t\n\r\f]+", " "))
  }

  /** The same chain as DuckDB SQL over a column expression — kept here
    * so the engine and the oracle can never drift apart silently.
    */
  def duckSql(htmlExpr: String): String = {
    val noScript =
      s"regexp_replace($htmlExpr, '(?is)<script\\b[^>]*>.*?</script\\s*>', ' ', 'g')"
    val noStyle =
      s"regexp_replace($noScript, '(?is)<style\\b[^>]*>.*?</style\\s*>', ' ', 'g')"
    val noComment = s"regexp_replace($noStyle, '(?s)<!--.*?-->', ' ', 'g')"
    val noTags = s"regexp_replace($noComment, '(?s)<[^>]*>', ' ', 'g')"
    val decoded = Entities.foldLeft(noTags) { case (c, (k, v)) =>
      val vq = v.replace("'", "''")
      s"replace($c, '$k', '$vq')"
    }
    s"trim(regexp_replace($decoded, '[ \t\n\r\f]+', ' ', 'g'))"
  }
}

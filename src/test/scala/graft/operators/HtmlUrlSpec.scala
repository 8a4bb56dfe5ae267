package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[HtmlText]] and [[UrlOps]] — the crawl-curation text/url pair.
  * The q316/q317 oracles pin the happy paths at corpus scale; these
  * pin the contract's edges.
  */
class HtmlUrlSpec extends SparkSpec {

  private def html(s: String): String = {
    import spark.implicits._
    Seq(s).toDF("h").select(HtmlText.extract(col("h"))).collect()(0).getString(0)
  }

  private def norm(s: String): String = {
    import spark.implicits._
    Seq(s).toDF("u").select(UrlOps.normalize(col("u"))).collect()(0).getString(0)
  }

  private def dom(s: String): String = {
    import spark.implicits._
    Seq(s).toDF("u")
      .select(UrlOps.registrableDomain(UrlOps.host(col("u")))).collect()(0).getString(0)
  }

  test("script/style subtrees are removed with their content") {
    assert(html("""a<script x=1>if(1<2){b()}</script>c""") == "a c")
    assert(html("""a<style>p { color: red }</style>c""") == "a c")
  }

  test("unclosed script is NOT guessed at: open tag strips, content survives") {
    assert(html("""a<script>var x = 1; b""") == "a var x = 1; b")
  }

  test("scripty is not script (word boundary)") {
    assert(html("""a<scripty>keep</scripty>b""") == "a keep b")
  }

  test("comments including embedded tags are removed") {
    assert(html("""a<!-- <b>x</b> \n -->c""") == "a c")
  }

  test("entities decode exactly one level (&amp; last)") {
    assert(html("&amp;lt;") == "&lt;")
    assert(html("&lt;b&gt; &quot;q&quot; &apos;a&apos;&nbsp;x &#39;y&#39;") ==
      "<b> \"q\" 'a' x 'y'")
  }

  test("whitespace collapses and trims") {
    assert(html("  a\t\tb\n\nc  ") == "a b c")
  }

  test("default ports strip; non-default ports survive") {
    assert(norm("HTTP://WWW.Site.COM:80/a") == "http://www.site.com/a")
    assert(norm("HTTPS://Site.COM:443/a") == "https://site.com/a")
    assert(norm("http://site.com:8080/a") == "http://site.com:8080/a")
    assert(norm("https://site.com:80/a") == "https://site.com:80/a") // 80 is not https-default
  }

  test("fragments drop; utm params drop; ? drops when query empties") {
    assert(norm("http://s.com/a#frag") == "http://s.com/a")
    assert(norm("http://s.com/a?utm_source=x&id=2#f") == "http://s.com/a?id=2")
    assert(norm("http://s.com/a?id=2&utm_campaign=y") == "http://s.com/a?id=2")
    assert(norm("http://s.com/a?utm_source=x&utm_medium=y") == "http://s.com/a")
    assert(norm("http://s.com/a?") == "http://s.com/a")
  }

  test("registrable domain: compound suffixes take 3 labels, others 2") {
    assert(dom("http://cdn1.news2.co.uk/x") == "news2.co.uk")
    assert(dom("http://a.b.ac.uk/x") == "b.ac.uk")
    assert(dom("http://shop.example.com.au/x") == "example.com.au")
    assert(dom("http://WWW.Shop1.COM/x") == "shop1.com")
    assert(dom("http://blog3.example.org/x") == "example.org")
  }
}

package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Edge semantics of the PII pass: match boundaries, the documented
  * redaction ORDER (emails before phones — an address contains digit
  * runs a phone pattern could otherwise claim), and the split-size
  * counting trick on pattern-at-boundary inputs where matches+1
  * pieces is easiest to get wrong.
  */
class PiiOpsSpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String): (Long, Long, Long, String) = {
    val r = Seq(text).toDF("t")
      .select(
        PiiOps.countMatches(col("t"), PiiOps.EmailRe).as("e"),
        PiiOps.countMatches(col("t"), PiiOps.Ipv4Re).as("i"),
        PiiOps.countMatches(col("t"), PiiOps.PhoneRe).as("p"),
        PiiOps.redact(col("t")).as("r"))
      .collect()(0)
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))
  }

  test("counts and redaction on a mixed document") {
    val (e, i, p, r) = one(
      "Mail a@b.com or c.d+x@e-f.org, host 10.1.2.3, call +1-555-123-4567.")
    assert((e, i, p) == (2L, 1L, 1L))
    assert(r == "Mail <EMAIL> or <EMAIL>, host <IP>, call <PHONE>.")
  }

  test("clean document: zero counts, text unchanged") {
    val (e, i, p, r) = one("no personal data here, just 12345 and words")
    assert((e, i, p) == (0L, 0L, 0L))
    assert(r == "no personal data here, just 12345 and words")
  }

  test("match at string start and end (split-size boundary pieces)") {
    val (e, _, p, r) = one("a@b.co middle +1-55-555-555")
    // trailing text is NOT a valid phone (2-digit middle group) — pattern anchors nothing
    assert(e == 1L && p == 0L)
    assert(r.startsWith("<EMAIL>"))
    val (e2, _, p2, r2) = one("x@y.org")
    assert(e2 == 1L && p2 == 0L && r2 == "<EMAIL>")
  }

  test("consecutive matches with no separator each count") {
    val (_, i, _, r) = one("1.2.3.45.6.7.8")
    // greedy scan: the first IPv4 claims '1.2.3.45', the rest '.6.7.8' has no 4th octet
    assert(i == 1L)
    assert(r == "<IP>.6.7.8")
  }

  test("redaction order: email absorbs its digits before the phone pass") {
    // the local part ends in a digit run; if phones ran first nothing
    // would match (no '+'), but the order contract is still observable:
    // the email must be redacted as ONE unit, not left with '<IP>' holes
    val (e, i, _, r) = one("user10.1.2.3@example.com")
    assert(e == 1L)
    assert(r == "<EMAIL>")
    // count pass sees the raw text, so the embedded IPv4 IS counted —
    // counts are per-pattern triage signals, not post-redaction residue
    assert(i == 1L)
  }

  test("ipv4 requires exactly four octets; phone requires the +CC prefix") {
    val (_, i, p, r) = one("ver 1.2.3 and 555-123-4567 stay")
    assert(i == 0L && p == 0L)
    assert(r == "ver 1.2.3 and 555-123-4567 stay")
  }

  test("spark chain matches the emitted DuckDB chain shape on the q321 corpus sample") {
    // same-source guarantee smoke: the duck SQL strings embed the same
    // regexes verbatim (no escaping drift)
    assert(PiiOps.duckCountSql("t", PiiOps.EmailRe).contains(PiiOps.EmailRe))
    assert(PiiOps.duckRedactSql("t").contains("<EMAIL>")
      && PiiOps.duckRedactSql("t").contains("<IP>")
      && PiiOps.duckRedactSql("t").contains("<PHONE>"))
  }
}

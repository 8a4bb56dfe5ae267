package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** WarcOps contract: round-trip on clean archives, length-framing
  * (embedded `WARC/` magic in payloads must NOT re-sync), and
  * stop-don't-guess on every malformed-input class.
  */
class WarcOpsSpec extends AnyFunSuite {
  private val Ascii = java.nio.charset.StandardCharsets.ISO_8859_1

  private def clean = WarcOps.encodeSynthetic(Seq(
    ("warcinfo", None, 42),
    ("request", Some("http://a.com/x"), 30),
    ("response", Some("http://a.com/x"), 200),
    ("metadata", None, 25)))

  test("round-trip: counts, payload mass, header mass, zero trailing") {
    val m = WarcOps.parse(clean)
    assert(m.nRecords == 4)
    assert((m.nWarcinfo, m.nRequest, m.nResponse, m.nMetadata, m.nOther) ==
      (1, 1, 1, 1, 0))
    assert(m.sumPayloadBytes == 42 + 30 + 200 + 25)
    // header bytes: 43 + |type| + digits(clen) + (19+|uri| when present)
    val expHdr = (43 + 8 + 2) + (43 + 7 + 2 + 19 + 14) + (43 + 8 + 3 + 19 + 14) +
      (43 + 8 + 2)
    assert(m.sumHeaderBytes == expHdr)
    assert(m.trailingBytes == 0)
  }

  test("payload containing the WARC magic does not re-sync the walk") {
    val trap = "junk WARC/1.0\r\nWARC-Type: response\r\n\r\n more junk"
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bos.write(("WARC/1.0\r\nWARC-Type: resource\r\nContent-Length: " +
        trap.length + "\r\n\r\n").getBytes(Ascii))
      bos.write(trap.getBytes(Ascii))
      bos.write("\r\n\r\n".getBytes(Ascii))
      bos.toByteArray
    }
    val m = WarcOps.parse(bytes)
    assert(m.nRecords == 1 && m.nOther == 1 && m.nResponse == 0)
    assert(m.sumPayloadBytes == trap.length && m.trailingBytes == 0)
  }

  test("truncated payload: record not counted, remainder is trailing") {
    val full = clean
    val cut = full.take(full.length - 30) // cuts into the last record
    val m = WarcOps.parse(cut)
    assert(m.nRecords == 3 && m.nMetadata == 0)
    // last record (metadata, clen 25) is 53 header + 25 payload + 4 term
    // = 82 bytes; 30 were cut, so the surviving 52 are all trailing
    assert(m.trailingBytes == (43 + 8 + 2) + 25 + 4 - 30)
  }

  test("non-WARC prefix: everything trailing") {
    val garbage = ("HTTP/1.1 200 OK\r\n\r\n").getBytes(Ascii) ++ clean
    val m = WarcOps.parse(garbage)
    assert(m.nRecords == 0 && m.trailingBytes == garbage.length)
  }

  test("bad Content-Length (non-digit / missing) stops at the record") {
    val bad = ("WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 12x\r\n\r\nhi\r\n\r\n")
      .getBytes(Ascii)
    val m = WarcOps.parse(bad)
    assert(m.nRecords == 0 && m.trailingBytes == bad.length)
    val missing = ("WARC/1.0\r\nWARC-Type: response\r\n\r\nhi\r\n\r\n").getBytes(Ascii)
    val m2 = WarcOps.parse(missing)
    assert(m2.nRecords == 0 && m2.trailingBytes == missing.length)
  }

  test("header block never closed (EOF before blank line) stops cleanly") {
    val open = ("WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 5\r\n").getBytes(Ascii)
    val m = WarcOps.parse(open)
    assert(m.nRecords == 0 && m.trailingBytes == open.length)
  }

  test("wrong terminator bytes after payload stop the walk") {
    val bos = new java.io.ByteArrayOutputStream()
    bos.write("WARC/1.0\r\nWARC-Type: resource\r\nContent-Length: 3\r\n\r\nabc".getBytes(Ascii))
    bos.write("XXXX".getBytes(Ascii)) // should be \r\n\r\n
    val bytes = bos.toByteArray
    val m = WarcOps.parse(bytes)
    assert(m.nRecords == 0 && m.trailingBytes == bytes.length)
  }

  test("empty input and bare magic are zero-record, fully trailing") {
    assert(WarcOps.parse(Array.emptyByteArray).nRecords == 0)
    val bare = "WARC/1.0".getBytes(Ascii)
    val m = WarcOps.parse(bare)
    assert(m.nRecords == 0 && m.trailingBytes == bare.length)
  }

  test("good records before a bad one are kept; trailing starts at the bad record") {
    val good = WarcOps.encodeSynthetic(Seq(("response", Some("http://b.co/1"), 50)))
    val bad = "WARC/9.9 oops no crlf structure".getBytes(Ascii)
    val m = WarcOps.parse(good ++ bad)
    assert(m.nRecords == 1 && m.nResponse == 1)
    assert(m.trailingBytes == bad.length)
  }

  test("case-insensitive header names (content-length lowercase)") {
    val bytes = ("WARC/1.0\r\nwarc-type: request\r\ncontent-length: 2\r\n\r\nok\r\n\r\n")
      .getBytes(Ascii)
    val m = WarcOps.parse(bytes)
    assert(m.nRecords == 1 && m.nRequest == 1 && m.sumPayloadBytes == 2)
  }

  // ------------------------------------------------------ extraction

  test("responses(): only response payloads come back, content-exact, in order") {
    val bytes = WarcOps.encodeSyntheticContent(Seq(
      ("warcinfo", None, "meta stuff".getBytes(Ascii)),
      ("request", Some("http://a.com/1"), "GET /1".getBytes(Ascii)),
      ("response", Some("http://a.com/1"), "<html>one</html>".getBytes(Ascii)),
      ("request", Some("http://a.com/2"), "GET /2".getBytes(Ascii)),
      ("response", Some("http://a.com/2"), "<html>two</html>".getBytes(Ascii))))
    val rs = WarcOps.responses(bytes)
    assert(rs.map(r => (r._1, r._2, new String(r._3, Ascii))) == Seq(
      (0, "http://a.com/1", "<html>one</html>"),
      (1, "http://a.com/2", "<html>two</html>")))
  }

  test("responses(): payload containing the WARC/ magic does NOT re-sync") {
    val tricky = "body with WARC/1.0\r\nWARC-Type: response\r\n embedded".getBytes(Ascii)
    val bytes = WarcOps.encodeSyntheticContent(Seq(
      ("response", Some("http://t.co/x"), tricky),
      ("response", Some("http://t.co/y"), "after".getBytes(Ascii))))
    val rs = WarcOps.responses(bytes)
    assert(rs.size == 2, "length framing is authoritative over content")
    assert(new String(rs(0)._3, Ascii) == new String(tricky, Ascii))
    assert(new String(rs(1)._3, Ascii) == "after")
  }

  test("responses(): a response with a cut terminator is NOT emitted; prefix kept") {
    val good = WarcOps.encodeSyntheticContent(Seq(
      ("response", Some("http://k.co/a"), "kept page".getBytes(Ascii))))
    val cut = WarcOps.encodeSyntheticContent(Seq(
      ("response", Some("http://k.co/b"), "dropped".getBytes(Ascii)))).dropRight(3)
    val rs = WarcOps.responses(good ++ cut)
    assert(rs.map(r => new String(r._3, Ascii)) == Seq("kept page"),
      "parse() and responses() agree on where validity ends")
  }

  test("responses(): bad Content-Length stops the walk at that record") {
    val good = WarcOps.encodeSyntheticContent(Seq(
      ("response", Some("http://k.co/a"), "first".getBytes(Ascii))))
    val bad = ("WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 12x\r\n\r\n")
      .getBytes(Ascii)
    val tail = WarcOps.encodeSyntheticContent(Seq(
      ("response", Some("http://k.co/c"), "never reached".getBytes(Ascii))))
    val rs = WarcOps.responses(good ++ bad ++ tail)
    assert(rs.map(r => new String(r._3, Ascii)) == Seq("first"))
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** The frozen per-query baseline ledger (r11 verdict item 2): every
  * registered query must have a first-green baseline entry, so a query
  * cannot land without freezing the number Bench's perf_weak stamp
  * compares against. Runs from the repo root (sbt's working dir), the
  * same place Bench reads the ledger.
  */
class BaselineLedgerSpec extends AnyFunSuite {

  private def shortName(n: String) = n.indexOf('_') match {
    case -1 => n
    case i => n.substring(0, i)
  }

  test("ledger exists, is well-formed, and covers every registered query") {
    val ledger = BaselineLedger.load()
    assert(ledger.isDefined, s"${BaselineLedger.Path} missing - run Bench at the " +
      "driver SF and tools/freeze_baseline.py")
    val l = ledger.get
    assert(l.calibRef == 0.090, "calib_ref must stay the BASELINE.md quiet reference")
    assert(l.sf == "sf0.1", "ledger is frozen at the driver's bench scale factor")
    assert(l.queries.nonEmpty && l.queries.values.forall(_ > 0),
      "baselines must be positive seconds")
    val registered = SparkEntry.queries.keys.map(shortName).toSet
    val missing = registered -- l.queries.keySet
    assert(missing.isEmpty,
      s"queries without a frozen baseline (run freeze_baseline.py): ${missing.toSeq.sorted.mkString(",")}")
    // short names are the ledger key space: they must stay unique
    assert(registered.size == SparkEntry.queries.size,
      "qNN short-name collision - two queries share a prefix")
  }

  // ------------------------------------------------------- retry pass
  // r12 verdict item 1: the canonical record self-heals — a first-pass
  // flag must be CONFIRMED by a post-sweep retry to stay perf_weak.

  test("adjudicate: a retry under the bound clears a first-pass flag") {
    val out = BaselineLedger.adjudicate(
      Seq("q01" -> 5.0, "q02" -> 1.1), Map("q01" -> 1.2))
    assert(out.isEmpty, "transient (5.0x then 1.2x) must clear in-record")
  }

  test("adjudicate: a retry over the bound confirms the flag at the smaller ratio") {
    val out = BaselineLedger.adjudicate(
      Seq("q01" -> 5.0), Map("q01" -> 3.0))
    assert(out == Seq("q01" -> 3.0),
      "twice-confirmed regression stays flagged, reported at min(first, retry)")
    val out2 = BaselineLedger.adjudicate(
      Seq("q01" -> 2.5), Map("q01" -> 6.0))
    assert(out2 == Seq("q01" -> 2.5))
  }

  test("adjudicate: a flagged query with NO retry evidence stays flagged") {
    val out = BaselineLedger.adjudicate(Seq("q01" -> 4.0), Map.empty)
    assert(out == Seq("q01" -> 4.0),
      "missing retry evidence (retry errored) must never clear a flag")
  }

  test("retryFields: every first-pass flag appears in the record, errored retries as null") {
    val flagged = Seq("q07" -> 3.1, "q99" -> 2.4, "q13" -> 8.0)
    val fields = BaselineLedger.retryFields(flagged, Map("q07" -> 1.1, "q13" -> 2.5))
    assert(fields.map(_._1) == Seq("q07", "q99", "q13"),
      "EVERY flagged query must carry a retry field — the record is self-auditing")
    assert(fields.toMap == Map("q07" -> Some(1.1), "q99" -> None, "q13" -> Some(2.5)),
      "a missing retry (errored) surfaces as null, never silently dropped")
  }

  test("adjudicate: queries under the bound never appear, retry or not") {
    val out = BaselineLedger.adjudicate(
      Seq("q01" -> 1.9, "q02" -> 0.5), Map("q01" -> 9.9))
    assert(out.isEmpty,
      "the retry pass only re-examines first-pass flags; it cannot create one")
  }
}

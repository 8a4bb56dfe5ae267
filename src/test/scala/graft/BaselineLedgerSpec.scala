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
}

package graft

/** Machine-readable per-query performance baseline (r11 verdict item 2).
  *
  * `baseline_queries.json` (repo root, read from the Bench working
  * directory) freezes each query's FIRST-GREEN quiet-normalized
  * seconds at the driver's scale factor:
  *
  * {{{
  * {"calib_ref": 0.090, "sf": "sf0.1",
  *  "queries": {"q01": 0.41, "q02": 0.35, ...}}
  * }}}
  *
  * Keys are the short `qNN` names (unique by construction — the same
  * keys bench records use). Values are `measured_sec × calib_ref /
  * calib_sec` of the run that first landed the query, so entries are
  * host-load-independent. Entries are FROZEN: `tools/freeze_baseline.py`
  * only ever ADDS missing queries from a bench record, never rewrites
  * an existing number — the ledger is the "no query regresses past 2×
  * its first-green time" bound made machine-checkable, replacing the
  * narrative enforcement in BASELINE.md.
  *
  * Bench loads the ledger when its scale factor matches, stamps a
  * per-query `vs_baseline` ratio map into the full record and a
  * `perf_weak` list (ratio > 2.0) into both records;
  * BaselineLedgerSpec asserts the ledger covers every registered
  * query, so a query cannot land without freezing its baseline.
  */
object BaselineLedger {

  final case class Ledger(calibRef: Double, sf: String,
                          queries: Map[String, Double])

  val Path = "baseline_queries.json"

  /** The regression bound: a query reading over `RatioBound` × its
    * frozen first-green normalized time is perf_weak.
    */
  val RatioBound = 2.0

  /** Adjudicate perf_weak with the in-record retry evidence (r12
    * verdict item 1): a query stays flagged only when BOTH the sweep
    * ratio and its post-sweep retry ratio exceed [[RatioBound]] — two
    * measurements taken minutes apart under independent calibrations.
    * A host transient inflating one pass cannot inflate both; a real
    * plan regression fails both. A flagged query with NO retry entry
    * (retry errored) stays flagged — missing evidence never clears a
    * flag. The confirmed ratio reported is the SMALLER of the two
    * (the best available estimate of the query's true time).
    */
  def adjudicate(vsBaseline: Seq[(String, Double)],
                 retry: Map[String, Double]): Seq[(String, Double)] =
    vsBaseline.collect {
      case (k, r) if r > RatioBound && retry.get(k).forall(_ > RatioBound) =>
        k -> retry.get(k).fold(r)(math.min(r, _))
    }

  /** The record's `vs_baseline_retry` pairing: EVERY first-pass flag
    * appears exactly once, `None` marking a retry that errored (which
    * [[adjudicate]] keeps flagged) — the record is self-auditing by
    * construction, and this function is what Bench emits from.
    */
  def retryFields(flagged: Seq[(String, Double)],
                  retry: Map[String, Double]): Seq[(String, Option[Double])] =
    flagged.map { case (k, _) => k -> retry.get(k) }

  def load(path: String = Path): Option[Ledger] = {
    val f = new java.io.File(path)
    if (!f.exists()) None
    else {
      // jackson ships with Spark; no new dependency
      val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(f)
      val qs = root.get("queries")
      val it = qs.fields()
      val m = Map.newBuilder[String, Double]
      while (it.hasNext) {
        val e = it.next()
        m += e.getKey -> e.getValue.asDouble()
      }
      Some(Ledger(root.get("calib_ref").asDouble(),
        root.get("sf").asText(), m.result()))
    }
  }
}

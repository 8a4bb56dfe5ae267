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

  /** One measurement against a ledger entry, on BOTH axes (r13 verdict
    * item 2a): `norm` is calibration-normalized (`t · calibRef /
    * calib / base` — host-load-corrected, but INFLATED when the run's
    * calibration happened to read fast), `raw` is the uncorrected
    * `t / base` (inflated only by actual load). A genuine regression
    * exceeds the bound on both; each single-axis excess has a benign
    * explanation (fast calib / loaded host respectively), so a flag
    * requires BOTH — the r13 driver record's seven 2.0–2.3× flags all
    * had raw ratios under the bound and a 1.23× calib multiplier.
    */
  final case class Ratio(norm: Double, raw: Double) {
    def weak: Boolean = norm > RatioBound && raw > RatioBound
    /** Best available estimate of the true ratio: each axis only ever
      * OVER-estimates, so the smaller one is closer to truth. */
    def best: Double = math.min(norm, raw)
  }

  /** Adjudicate perf_weak with the in-record retry evidence (r12
    * verdict item 1 + the r13 dual-axis rule): a query stays flagged
    * only when BOTH measurements — the sweep and its post-sweep
    * retry — are weak on BOTH axes. Two measurements taken minutes
    * apart under independent calibrations: a host transient cannot
    * inflate both passes, a fast calibration cannot inflate the raw
    * axis, and a real plan regression fails everything. A flagged
    * query with NO retry entry (retry errored) stays flagged —
    * missing evidence never clears a flag. The confirmed ratio is the
    * smallest available estimate across both passes and axes.
    */
  def adjudicate(vsBaseline: Seq[(String, Ratio)],
                 retry: Map[String, Ratio]): Seq[(String, Double)] =
    vsBaseline.collect {
      case (k, r) if r.weak && retry.get(k).forall(_.weak) =>
        k -> retry.get(k).fold(r.best)(rr => math.min(r.best, rr.best))
    }

  /** The retry-under-load rule (r13 verdict item 2b): a retry whose
    * own fresh calibration reads above `LoadVoidFactor` × the quiet
    * floor was taken under sustained external load — its ratios are
    * not evidence either way, and Bench re-runs the pass once after a
    * cool-down instead of letting two loaded measurements confirm a
    * flag the host made.
    */
  val LoadVoidFactor = 1.5

  def loadVoid(retryCalib: Double, quietFloor: Double): Boolean =
    retryCalib > LoadVoidFactor * quietFloor

  /** The record's `vs_baseline_retry` pairing: EVERY first-pass flag
    * appears exactly once, `None` marking a retry that errored (which
    * [[adjudicate]] keeps flagged) — the record is self-auditing by
    * construction, and this function is what Bench emits from.
    */
  def retryFields(flagged: Seq[(String, Ratio)],
                  retry: Map[String, Ratio]): Seq[(String, Option[Double])] =
    flagged.map { case (k, _) => k -> retry.get(k).map(_.norm) }

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

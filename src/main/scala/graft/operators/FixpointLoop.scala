package graft.operators

import org.apache.spark.sql.DataFrame

/** The one driver-loop skeleton behind the iterative operators
  * (min-label CC, alternating-star CC, PageRank): apply `step` to the
  * current state until it reports a fixpoint or `maxIter` rounds pass.
  *
  * `step` returns (nextState, reachedFixpoint). Lineage discipline
  * (localCheckpoint per round) stays with the algorithm — it knows
  * which frames have multiple consumers. Cross-round driver scalars
  * (a convergence signature, a changed-row count) live in the step
  * closure; the loop itself holds no state but the current frame.
  *
  * Convergence-mandatory loops (graph labels, where a partial result
  * is WRONG, not approximate) keep the default and fail loudly on
  * maxIter; fixed-budget loops (PageRank's iteration count) pass
  * `requireConvergence = false` and take the last state as-is.
  */
object FixpointLoop {

  /** @param onRound observer called after every completed round with
    *        (1-based round number, that round's state) — telemetry only
    *        (Bench records rounds-to-convergence so cross-round drift in
    *        convergence behavior shows up in the record, not just in
    *        specs); the default no-op adds nothing to the hot path.
    */
  def iterateUntilFixpoint(init: DataFrame, maxIter: Int, opName: String,
                           requireConvergence: Boolean = true,
                           onRound: (Int, DataFrame) => Unit = (_, _) => ())
                          (step: DataFrame => (DataFrame, Boolean)): DataFrame = {
    var cur = init
    var i = 0
    while (i < maxIter) {
      val (next, done) = step(cur)
      onRound(i + 1, next)
      if (done) return next
      cur = next
      i += 1
    }
    require(!requireConvergence,
      s"$opName did not converge in $maxIter rounds; raise maxIter")
    cur
  }
}

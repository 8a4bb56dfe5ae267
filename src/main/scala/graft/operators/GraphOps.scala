package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph propagation on edge-list DataFrames. The unit step
  * (one sparse matrix-vector product) is what q110 gates against the
  * oracle; this object iterates it — the same loop discipline as
  * [[Dedup.connectedComponents]]: every round is one join + one
  * groupBy on the same shuffle key, intermediate frames cut from
  * lineage with localCheckpoint, no driver-side graph state beyond
  * one scalar per round.
  */
object GraphOps {

  /** PageRank over a directed edge list, `iters` rounds from a uniform
    * start. rank(v) = (1−d)/N + d·(Σ_{u→v} rank(u)/deg(u) + dangling/N),
    * dangling = Σ rank over out-degree-0 nodes, redistributed uniformly
    * so total mass stays 1 every round.
    *
    * Determinism: per-edge contributions round to 1e-12 fixed-point
    * longs and sum exactly — results are partition-order independent,
    * the invariant every operator here holds. The one driver-side value
    * per round is the dangling-mass scalar (a single-row aggregate,
    * like the q58 convergence counter).
    *
    * Scale: per round, one shuffle of the edge list on `dst` plus one
    * broadcast-sized scalar; ranks and degrees stay partitioned by node
    * id. 100 TB web graphs run exactly this loop with the iteration
    * count (or a rank-delta threshold) as the knob.
    */
  def pageRank(edges0: DataFrame, srcCol: String, dstCol: String,
               iters: Int, d: Double = 0.85): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val edges = edges0.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().localCheckpoint(false)
    val nodes = edges.select(col("src").as("id"))
      .union(edges.select(col("dst").as("id")))
      .distinct().localCheckpoint(false)
    val n = nodes.count()
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
      .localCheckpoint(false)

    var ranks = nodes.withColumn("rank", lit(1.0 / n))
    for (_ <- 1 to iters) {
      val withDeg = ranks.join(deg, ranks("id") === deg("src"), "left")
        .select(col("id"), col("rank"), col("deg"))
        .localCheckpoint(false)
      val dangling = withDeg.filter(col("deg").isNull)
        .agg(coalesce(sum("rank"), lit(0.0))).first().getDouble(0)
      val contrib = edges
        .join(withDeg.filter(col("deg").isNotNull), edges("src") === col("id"))
        .select(col("dst"),
          round(col("rank") / col("deg") * 1e12).cast("long").as("_c"))
        .groupBy("dst").agg(sum("_c").as("_s"))
      ranks = nodes.join(contrib, nodes("id") === contrib("dst"), "left")
        .select(col("id"),
          (lit((1.0 - d) / n)
            + lit(d) * (coalesce(col("_s"), lit(0L)).cast("double") / 1e12
              + lit(dangling / n))).as("rank"))
        .localCheckpoint(false)
    }
    ranks
  }
}

package graft.plans

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** The custom TopKPerKey physical operator: exactness against the
  * Window route, the partial→exchange→final plan shape, invariance
  * under input partitioning, and the property that justifies its
  * existence — the shuffle carries candidate rows, not the fact
  * table.
  */
class PlansSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def factTable = Tables.load(spark, sf, "orders")
    .join(Tables.load(spark, sf, "customer"), col("o_custkey") === col("c_custkey"))
    .select(col("c_nationkey").as("nat"), col("o_orderkey"),
      expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))

  private def viaWindow(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("nat").orderBy(col("cents").desc, col("o_orderkey").asc)
    df.withColumn("_rn", row_number().over(w)).filter(col("_rn") <= k)
      .drop("_rn")
  }

  private def sortedRows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("nat", "cents", "o_orderkey").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq

  test("topKPerKey equals the Window + rank route exactly") {
    val df = factTable
    val got = sortedRows(TopKPerKey(df, Seq("nat"),
      Seq(col("cents").desc, col("o_orderkey").asc), 5))
    val want = sortedRows(viaWindow(df, 5))
    assert(got == want, s"${got.size} vs ${want.size} rows")
    assert(got.nonEmpty)
  }

  test("result is invariant under input partitioning") {
    val base = sortedRows(TopKPerKey(factTable, Seq("nat"),
      Seq(col("cents").desc, col("o_orderkey").asc), 3))
    for (p <- Seq(1, 3, 17)) {
      val rep = sortedRows(TopKPerKey(factTable.repartition(p), Seq("nat"),
        Seq(col("cents").desc, col("o_orderkey").asc), 3))
      assert(rep == base, s"partitioning $p changed the result")
    }
  }

  test("plan shape: partial → key-hash exchange → final; no WindowExec") {
    val df = TopKPerKey(factTable, Seq("nat"),
      Seq(col("cents").desc, col("o_orderkey").asc), 3)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKeyPartial"), plan)
    assert(plan.contains("TopKPerKeyFinal"), plan)
    assert(!plan.contains("WindowExec") && !plan.contains("Window ["), plan)
    // partial must sit BELOW the exchange (map side), final above it
    val iPartial = plan.indexOf("TopKPerKeyPartial")
    val iFinal = plan.indexOf("TopKPerKeyFinal")
    val iExch = plan.indexOf("Exchange hashpartitioning")
    assert(iExch >= 0, plan)
    assert(iFinal < iExch && iExch < iPartial,
      s"expected final above exchange above partial:\n$plan")
  }

  test("the shuffle carries candidates, not the fact table") {
    val df = TopKPerKey(factTable.repartition(8), Seq("nat"),
      Seq(col("cents").desc, col("o_orderkey").asc), 3)
    df.collect()
    // AQE buries exchanges inside leaf ShuffleQueryStageExec wrappers —
    // unwrap both layers
    def unwrap(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
      p match {
        case a: AdaptiveSparkPlanExec => unwrap(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          q +: unwrap(q.plan)
        case other => other +: other.children.flatMap(unwrap)
      }
    val nodes = unwrap(df.queryExecution.executedPlan)
    val exchanges = nodes.collect { case e: ShuffleExchangeLike => e }
    assert(exchanges.nonEmpty, "no shuffle found")
    val total = factTable.count()
    val shuffled = exchanges.map { e =>
      e.metrics.get("numOutputRows").orElse(e.metrics.get("shuffleRecordsWritten"))
        .map(_.value).getOrElse(-1L)
    }
    assert(shuffled.forall(_ >= 0), s"no row metric on exchanges: ${exchanges.map(_.metrics.keys)}")
    // 25 nations × k=3 × 8 map partitions = ≤600 candidate rows vs
    // 15k fact rows — the whole point of the operator
    val topkShuffle = shuffled.min
    assert(topkShuffle <= 25L * 3 * 8, s"shuffle carried $topkShuffle rows")
    assert(topkShuffle < total / 2, s"shuffle $topkShuffle not bounded vs $total")
  }

  test("k larger than any group degenerates to the full input") {
    val df = factTable.filter(col("nat") < 3)
    val got = sortedRows(TopKPerKey(df, Seq("nat"),
      Seq(col("cents").desc, col("o_orderkey").asc), 1000000))
    assert(got == sortedRows(df))
  }

  test("planted ties resolve by the total order's tiebreak") {
    import spark.implicits._
    val tied = Seq((1, 10L, 100L), (1, 11L, 100L), (1, 12L, 100L), (1, 13L, 99L),
      (2, 20L, 5L)).toDF("nat", "o_orderkey", "cents")
      .repartition(4)
    val got = sortedRows(TopKPerKey(tied, Seq("nat"),
      Seq(col("cents").desc, col("o_orderkey").asc), 2))
    assert(got == Seq((1, 10L, 100L), (1, 11L, 100L), (2, 20L, 5L)))
  }

  test("the high-cardinality flush fires and results stay exact (r8 ADVICE)") {
    import spark.implicits._
    // Planted worst case for the flush: one partition, 50 interleaved
    // keys — far past the shrunken threshold — and each key's BEST row
    // arrives LAST, after that key's earlier rows have been flushed
    // downstream. Exactness therefore requires both (a) flushed rows to
    // be re-filtered by the final stage and (b) post-flush rows to
    // still compete: a flush that dropped rows, or a partial that kept
    // emitting from a stale map, fails this.
    val n = 50
    val rows = (0 until 3).flatMap { round =>
      (0 until n).map(key => (key, (round * n + key).toLong, (round * 10).toLong))
    } // quality ascends per round → round-2 rows are the per-key best
    val df = rows.toDF("nat", "o_orderkey", "cents").coalesce(1)
    val want = sortedRows(viaWindow(df, 1))
    spark.conf.set("spark.graft.topk.maxKeys", "2")
    try {
      val got = sortedRows(TopKPerKey(df, Seq("nat"),
        Seq(col("cents").desc, col("o_orderkey").asc), 1))
      assert(got == want, "flush path diverged from the Window route")
      assert(got.size == n && got.forall(_._3 == 20L),
        "every key must keep its round-2 (post-flush) best row")
    } finally spark.conf.unset("spark.graft.topk.maxKeys")
  }
}

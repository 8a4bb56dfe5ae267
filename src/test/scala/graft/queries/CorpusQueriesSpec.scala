package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

import graft.SparkSpec

class CorpusQueriesSpec extends SparkSpec {

  test("contaminationOverlap: AQE converts the eval join to broadcast when it fits") {
    graft.expressions.GraftExtensions.register(spark)
    import spark.implicits._
    // overlapping 7-word docs so trigram shingles collide across the
    // eval (doc_id % 10 == 0) / training split
    val docs = (0L until 60L).map { i =>
      (i, (0 to 6).map(j => s"w${(i * 7 + j * 3) % 23}").mkString(" "))
    }.toDF("doc_id", "text")
    val pred = pmod(col("doc_id"), lit(10)) === 0
    val out = CorpusQueries.contaminationOverlap(docs, pred, maxBroadcastEvalDocs = 1000L)
    val rows = out.collect()
    assert(rows.nonEmpty, "spec needs actual shingle overlap")
    // broadcast-vs-shuffle is decided by ADAPTIVE execution from the
    // eval side's true materialized size, not a plan-time count (there
    // must be NO eager job at construction — asserted below). After
    // execution the final adaptive plan must have converted the tiny
    // eval side to a broadcast join.
    val finalPlan = out.queryExecution.executedPlan.collectFirst {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
    }.getOrElse(out.queryExecution.executedPlan.toString)
    assert(finalPlan.contains("BroadcastHashJoin"), finalPlan)
  }

  test("contaminationOverlap runs no job at plan construction") {
    graft.expressions.GraftExtensions.register(spark)
    import spark.implicits._
    val docs = Seq((0L, "a b c d e"), (1L, "a b c d e")).toDF("doc_id", "text")
    val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    CorpusQueries.contaminationOverlap(docs, col("doc_id") === 0L,
      maxBroadcastEvalDocs = 3L) // NOT executed
    val after = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    assert(after == before,
      s"plan construction launched ${after - before} job(s); must be lazy")
  }
}

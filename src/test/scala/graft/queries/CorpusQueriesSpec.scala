package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CorpusQueriesSpec extends SparkSpec {

  test("contaminationOverlap broadcasts only under the size guard, identical output on both branches") {
    graft.expressions.GraftExtensions.register(spark)
    import spark.implicits._
    // overlapping 7-word docs so trigram shingles collide across the
    // eval (doc_id % 10 == 0) / training split
    val docs = (0L until 60L).map { i =>
      (i, (0 to 6).map(j => s"w${(i * 7 + j * 3) % 23}").mkString(" "))
    }.toDF("doc_id", "text")
    val pred = pmod(col("doc_id"), lit(10)) === 0
    // kill auto-broadcast so the size guard, not the optimizer's size
    // stats, is what decides the join strategy at this toy scale
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    try {
      val hinted = CorpusQueries.contaminationOverlap(docs, pred, maxBroadcastEvalDocs = 1000L)
      val guarded = CorpusQueries.contaminationOverlap(docs, pred, maxBroadcastEvalDocs = 3L)
      val hintedPlan = hinted.queryExecution.executedPlan.toString
      val guardedPlan = guarded.queryExecution.executedPlan.toString
      assert(hintedPlan.contains("BroadcastHashJoin"), hintedPlan)
      assert(!guardedPlan.contains("BroadcastHashJoin"), guardedPlan)
      val a = hinted.collect().map(_.toSeq).toSeq
      val b = guarded.collect().map(_.toSeq).toSeq
      assert(a.nonEmpty, "guard spec needs actual shingle overlap to compare")
      assertRowsEqual(a, b)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}

package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins the plan fact the r15 loop optimizations rely on: a
  * repartition(col) + localCheckpoint frame keeps its HashPartitioning
  * (and a sortWithinPartitions its ordering) through LogicalRDD, so a
  * downstream join/groupBy on the same key adds NO exchange (and no
  * sort) on that side — the "stationary edge list" discipline for
  * iterative graph loops.
  */
class PartitionPreserveSpec extends SparkSpec {

  test("plain localCheckpoint under AQE loses partitioning (why the helper exists)") {
    val edges = spark.range(0, 1000)
      .select((col("id") % 97).as("src"), (col("id") % 31).as("dst"))
      .repartition(col("src"))
      .sortWithinPartitions("src")
      .localCheckpoint(true)
    val leaf = edges.queryExecution.optimizedPlan.collectLeaves().head
      .asInstanceOf[org.apache.spark.sql.execution.LogicalRDD]
    assert(leaf.outputPartitioning.toString.contains("UnknownPartitioning"),
      s"AQE checkpoint now preserves partitioning (${leaf.outputPartitioning}) - " +
        "localCheckpointByKey's manual declaration may be droppable")
  }

  test("localCheckpointByKey side joins with no exchange and no sort") {
    val edges = org.apache.spark.sql.graft.GraftSqlBridge.localCheckpointByKey(
      spark.range(0, 1000)
        .select((col("id") % 97).as("src"), (col("id") % 31).as("dst")),
      Seq("src"))
    val leaf = edges.queryExecution.optimizedPlan.collectLeaves().head
      .asInstanceOf[org.apache.spark.sql.execution.LogicalRDD]
    assert(leaf.outputPartitioning.toString.startsWith("hashpartitioning(src"),
      s"declared partitioning missing: ${leaf.outputPartitioning}")
    val nodes = spark.range(0, 97).select(col("id"))
    val joined = edges.hint("merge").join(nodes, edges("src") === nodes("id"))
    joined.count()
    val plan = joined.queryExecution.executedPlan.toString
    // the checkpointed side must NOT be re-exchanged: exactly one
    // exchange (the nodes side) in the whole plan
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 exchange (nodes side only), got $exchanges:\n$plan")
    // and the SMJ must not re-sort the pre-sorted checkpointed side:
    // at most one Sort below the join (again the nodes side)
    val sorts = "Sort \\[".r.findAllIn(plan).length
    assert(sorts <= 1, s"expected <=1 sort, got $sorts:\n$plan")
  }

  test("localCheckpointByKey joins correctly against a shuffled side") {
    val left = org.apache.spark.sql.graft.GraftSqlBridge.localCheckpointByKey(
      spark.range(0, 10000).select((col("id") % 997).as("k"), col("id").as("v")),
      Seq("k"))
    val right = spark.range(0, 997).select(col("id").as("k"), (col("id") * 2).as("w"))
    val got = left.hint("merge").join(right, Seq("k"))
      .agg(sum(col("v") + col("w"))).collect()(0).getLong(0)
    val want = spark.range(0, 10000).select((col("id") % 997).as("k"), col("id").as("v"))
      .join(spark.range(0, 997).select(col("id").as("k"), (col("id") * 2).as("w")), Seq("k"))
      .agg(sum(col("v") + col("w"))).collect()(0).getLong(0)
    assert(got == want, s"misaligned zip join: $got != $want")
  }
}

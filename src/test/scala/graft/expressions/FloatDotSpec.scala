package graft.expressions

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.operators.Similarity

class FloatDotSpec extends SparkSpec {

  import spark.implicits._

  test("native dot is bit-identical to the HOF double left-fold") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val diff = emb.select(
        (Similarity.dot(col("embedding"), col("embedding")) -
          Similarity.dotNative(col("embedding"), col("embedding"))).as("d"))
      .agg(max(abs(col("d")))).head.getDouble(0)
    assert(diff == 0.0) // exact, not approximate — same fold order
  }

  test("native dot participates in WholeStageCodegen") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val df = emb.select(Similarity.dotNative(col("embedding"), col("embedding")).as("d"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*("), plan) // codegen span covers the projection
  }

  test("graft_dot is callable from SQL via the extension registration") {
    val out = Seq((Seq(1.0f, 2.0f), Seq(3.0f, 4.0f))).toDF("a", "b")
      .selectExpr("graft_dot(a, b) AS d").head.getDouble(0)
    assert(out == 11.0)
  }

  test("null array input yields null, not a crash") {
    val out = Seq((Some(Seq(1.0f)), Option.empty[Seq[Float]])).toDF("a", "b")
      .select(Similarity.dotNative(col("a"), col("b")).as("d")).head
    assert(out.isNullAt(0))
  }
}

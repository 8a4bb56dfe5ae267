package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FixpointLoopSpec extends SparkSpec {

  test("returns the first state whose step reports a fixpoint") {
    import spark.implicits._
    // state = one row holding n; step halves it; fixpoint at n == 1
    val out = FixpointLoop.iterateUntilFixpoint(
        Seq(16L).toDF("n"), maxIter = 10, "halving") { cur =>
      val next = cur.select((col("n") / 2).cast("long").as("n"))
      (next, next.first().getLong(0) == 1L)
    }
    assert(out.first().getLong(0) == 1L)
  }

  test("convergence-mandatory loop fails loudly at maxIter") {
    import spark.implicits._
    val e = intercept[IllegalArgumentException] {
      FixpointLoop.iterateUntilFixpoint(
          Seq(1L).toDF("n"), maxIter = 3, "never-done") { cur => (cur, false) }
    }
    assert(e.getMessage.contains("never-done") && e.getMessage.contains("3"))
  }

  test("fixed-budget loop runs exactly maxIter steps and keeps the last state") {
    import spark.implicits._
    var steps = 0
    val out = FixpointLoop.iterateUntilFixpoint(
        Seq(0L).toDF("n"), maxIter = 5, "budget",
        requireConvergence = false) { cur =>
      steps += 1
      (cur.select((col("n") + 1).as("n")), false)
    }
    assert(steps == 5)
    assert(out.first().getLong(0) == 5L)
  }
}

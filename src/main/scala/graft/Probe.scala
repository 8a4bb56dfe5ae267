package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc per-query profiler: times named queries (3 runs each) and
  * optionally prints the executed plan. Usage:
  *
  *   runMain graft.Probe <sfDir> <name1,name2,...> [explain]
  *
  * Complements Bench (which times the whole surface): this is the
  * iterate-on-one-query loop.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val explain = args.length > 2 && args(2) == "explain"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.expressions.GraftExtensions.register(spark)
    // exact name or a qNN_ prefix boundary — a bare startsWith would make
    // "q3" run q30..q38 alongside q3
    for (n <- names;
         q <- SparkEntry.allQueries.filter(q =>
           q.name == n || q.name.startsWith(n + "_"))) {
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        q.fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE ${q.name}: ${times.map(t => f"$t%.2f").mkString(" ")} s")
      if (explain) {
        val df = q.fn(spark, sfDir)
        df.count()
        println(df.queryExecution.executedPlan.toString)
      }
    }
    spark.stop()
  }
}

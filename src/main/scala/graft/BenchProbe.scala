package graft

import org.apache.spark.sql.functions._

/** Scratch micro-benchmark main (dev tool, not part of the query surface). */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create()
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (n=$n)")
    }
    time("q36 run1")(queries.DataQueries.q36.fn(spark, dir).count())
    time("q36 run2")(queries.DataQueries.q36.fn(spark, dir).count())
    time("q36 run3")(queries.DataQueries.q36.fn(spark, dir).count())
    spark.stop()
  }
}

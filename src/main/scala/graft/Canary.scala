package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Loud guard against testdata encoding drift.
  *
  * Round 6 shipped 16 red queries because the driver regenerated
  * `events.parquet` with a different `ts` physical encoding (raw INT64
  * nanos → logical timestamp[us]) and the pinned decode silently warped
  * every epoch 1000x. This canary runs at the head of Verify and Bench:
  * if the decoded event range ever leaves the plausible data window, or a
  * table comes back empty, the run fails immediately and names the drift
  * instead of dumping subtly-wrong results for the oracle to flag.
  */
object Canary {

  final case class Fingerprint(rows: Map[String, Long], tsMinYear: Int, tsMaxYear: Int)

  /** Throws IllegalStateException on drift; returns the fingerprint used
    * to stamp round records (row counts per table + ts year range). */
  def check(spark: SparkSession, sfDir: String): Fingerprint = {
    val rows = Tables.names.map { n =>
      n -> Tables.load(spark, sfDir, n).count()
    }.toMap
    val empty = rows.filter(_._2 == 0L).keys.toSeq.sorted
    if (empty.nonEmpty)
      throw new IllegalStateException(
        s"testdata canary: empty table(s) ${empty.mkString(", ")} under $sfDir")

    val r = Tables.load(spark, sfDir, "events")
      .agg(year(min(col("ts"))).as("y0"), year(max(col("ts"))).as("y1"))
      .head()
    val (y0, y1) = (r.getInt(0), r.getInt(1))
    // The synthetic events span ~2024; any mis-decode lands decades away
    // (ns-as-us → 1970, us-as-ns → far future). Wide band on purpose: it
    // should only trip on encoding bugs, never on innocuous regeneration.
    if (y0 < 2020 || y1 > 2031)
      throw new IllegalStateException(
        s"testdata canary: events.ts decodes to years [$y0, $y1] under $sfDir — " +
          "expected within [2020, 2031]; the parquet ts encoding likely changed " +
          "(see Tables.load footer sniff)")
    Fingerprint(rows, y0, y1)
  }
}

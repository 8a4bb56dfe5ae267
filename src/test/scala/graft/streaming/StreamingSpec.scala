package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.{SparkSpec, Tables}

/** Streaming parity: the watermarked hourly aggregation over a file
  * stream of the synthetic events table must produce exactly the batch
  * q30 result (same groups, same sums) when run with AvailableNow.
  */
class StreamingSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("hourlyEventStats over a file stream equals the batch aggregation") {
    // stage the events parquet into a stream-source directory
    val dir = Files.createTempDirectory("graft-stream").toFile
    val batchEvents = Tables.load(spark, sf, "events")
    batchEvents.write.mode("overwrite").parquet(s"$dir/in")

    val stream = StreamingOps.eventStream(spark, s"$dir/in", batchEvents.schema)
    val agg = StreamingOps.hourlyEventStats(stream)
    val q = agg.writeStream
      .format("memory").queryName("hourly_stats")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val streamed = spark.table("hourly_stats")
      .orderBy("hour", "event_type")
      .select(col("hour").cast("string"), col("event_type"), col("n_events"))
    val batch = batchEvents
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .orderBy("hour", "event_type")
      .select(col("hour").cast("string"), col("event_type"), col("n_events"))
    assertRowsEqual(rows(streamed), rows(batch))
  }

  test("sessionize accumulates per-user state across a micro-batch") {
    import spark.implicits._
    val events = Seq(
      StreamingOps.Event(1L, new java.sql.Timestamp(1000L), "click", 2.0),
      StreamingOps.Event(1L, new java.sql.Timestamp(2000L), "click", 3.0),
      StreamingOps.Event(2L, new java.sql.Timestamp(1500L), "view", 1.0)).toDS()
    // batch Dataset path exercises the same state function deterministically
    val out = StreamingOps.sessionize(events, gapMs = 60000L)
      .collect().sortBy(_.user_id)
    assert(out.toSeq == Seq(
      StreamingOps.SessionOut(1L, 2L, 5.0, closed = false),
      StreamingOps.SessionOut(2L, 1L, 1.0, closed = false)))
  }
}

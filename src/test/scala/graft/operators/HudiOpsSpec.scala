package graft.operators

import graft.SparkSpec

/** Hudi timeline census: state lives in the FILENAME (completed vs
  * inflight/requested), in-progress stats never count, corrupt
  * completed writes are malformed while stat-less cleans are not.
  */
class HudiOpsSpec extends SparkSpec {

  import spark.implicits._

  test("instant states from filenames; in-progress stats NEVER counted") {
    val stats =
      """{"partitionToWriteStats":{"p0":[{"numWrites":10,"totalWriteBytes":100}]}}"""
    val tl = Seq(
      (1L, "1000.commit", stats),
      (1L, "1001.deltacommit", stats),
      (1L, "1002.clean", "{}"),
      (1L, "1003.commit.inflight", ""), // running: must not count
      (1L, "1004.commit.requested", "")).toDF("tbl", "fname", "content")
    val c = HudiOps.timelineCensus(tl, "tbl", "fname", "content").collect()(0)
    assert(c.getAs[Long]("n_instants") == 5 && c.getAs[Long]("n_completed") == 3)
    assert(c.getAs[Long]("n_inflight") == 1 && c.getAs[Long]("n_requested") == 1)
    assert(c.getAs[Long]("n_commits") == 3 && c.getAs[Long]("n_deltacommits") == 1)
    assert(c.getAs[Long]("latest_completed_ts") == 1002)
    assert(c.getAs[Long]("rows_written") == 20 && c.getAs[Long]("bytes_written") == 200,
      "only the two COMPLETED write instants count")
    assert(c.getAs[Long]("n_malformed") == 0)
  }

  test("a corrupt completed write is malformed; a stat-less clean is not") {
    val tl = Seq(
      (2L, "1000.commit", "corrupt{"),
      (2L, "1001.clean", "{}"),
      (2L, "1002.deltacommit",
        """{"partitionToWriteStats":{"a":[{"numWrites":7,"totalWriteBytes":70},{"numWrites":3,"totalWriteBytes":30}]}}"""))
      .toDF("tbl", "fname", "content")
    val c = HudiOps.timelineCensus(tl, "tbl", "fname", "content").collect()(0)
    assert(c.getAs[Long]("n_malformed") == 1, "the corrupt commit")
    assert(c.getAs[Long]("rows_written") == 10 && c.getAs[Long]("bytes_written") == 100,
      "multi-file partitions sum; the corrupt instant contributes NOTHING")
    assert(c.getAs[Long]("n_cleans") == 1)
  }

  test("synthetic timeline matches its closed form at a spot value") {
    // k = 5: nI = 3, last instant inflight (5 % 5 == 0); instants:
    // 1000.commit, 1001.deltacommit, 1002.clean.inflight
    val tl = HudiOps.syntheticTimeline(5L).map { case (f, c) => (5L, f, c) }
      .toDF("tbl", "fname", "content")
    val c = HudiOps.timelineCensus(tl, "tbl", "fname", "content").collect()(0)
    assert(c.getAs[Long]("n_instants") == 3 && c.getAs[Long]("n_inflight") == 1)
    assert(c.getAs[Long]("latest_completed_ts") == 1001)
    // completed writes i = 0, 1: rows (21+0) + (21+2) = 44
    assert(c.getAs[Long]("rows_written") == 44)
  }
}

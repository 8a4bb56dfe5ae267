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

  // ---- MOR file groups (round-15 item 4)

  private def groupsOf(rows: Seq[(Long, String, String, Long, Long, Long, Long, Long)]) =
    HudiOps.morFileGroups(
      rows.toDF("tbl", "fid", "kind", "ts", "bytes", "rows", "ins", "del"),
      "tbl", "fid", "kind", "ts", "bytes", "rows", "ins", "del")

  test("MOR slice rule: compaction resets the group — stranded logs never count") {
    val g = groupsOf(Seq(
      (1L, "g0", "base", 100L, 900L, 40L, 0L, 0L),
      (1L, "g0", "log", 100L, 300L, 0L, 7L, 2L),  // pre-compaction, stranded
      (1L, "g0", "base", 200L, 950L, 44L, 0L, 0L), // compaction result
      (1L, "g0", "log", 200L, 150L, 0L, 3L, 1L))) // current slice
      .collect()(0)
    assert(g.getAs[Long]("base_rows") == 44 && g.getAs[Long]("net_rows") == 46,
      g.toString) // 44 + 3 - 1: the stranded log's 7/2 NEVER applies
    assert(g.getAs[Long]("n_current_logs") == 1 && g.getAs[Long]("debt_bytes") == 150)
    assert(g.getAs[Long]("obsolete_bytes") == 900 + 300, g.toString)
    assert(g.getAs[Long]("n_base_files") == 2 && g.getAs[Long]("needs_compaction") == 1)
  }

  test("MOR log-only group: no base yet, every log is current") {
    val g = groupsOf(Seq(
      (1L, "g0", "log", 100L, 400L, 0L, 20L, 0L),
      (1L, "g0", "log", 100L, 100L, 0L, 5L, 1L))).collect()(0)
    assert(g.getAs[Long]("has_base") == 0 && g.getAs[Long]("base_ts") == -1L)
    assert(g.getAs[Long]("net_rows") == 24 && g.getAs[Long]("debt_bytes") == 500)
    assert(g.getAs[Long]("n_current_logs") == 2, g.toString)
  }

  test("MOR base-only group carries zero debt; rollup sums and maxes per table") {
    val groups = groupsOf(Seq(
      (1L, "g0", "base", 100L, 800L, 30L, 0L, 0L),
      (1L, "g1", "base", 100L, 1000L, 50L, 0L, 0L),
      (1L, "g1", "log", 100L, 250L, 0L, 5L, 1L)))
    val only = groups.filter(org.apache.spark.sql.functions.col("file_id") === "g0")
      .collect()(0)
    assert(only.getAs[Long]("debt_bytes") == 0 &&
      only.getAs[Long]("needs_compaction") == 0)
    val r = HudiOps.morCompactionDebt(groups).collect()(0)
    assert(r.getAs[Long]("n_groups") == 2 && r.getAs[Long]("net_rows") == 30 + 54)
    assert(r.getAs[Long]("debt_bytes") == 250 &&
      r.getAs[Long]("max_group_debt_bytes") == 250)
    assert(r.getAs[Long]("n_groups_needing_compaction") == 1, r.toString)
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

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hudi timeline census — the THIRD lake format next to Delta
  * (q392/q401) and Iceberg (q398/q402): a Hudi table's `.hoodie/`
  * directory is a TIMELINE of instant files named
  *
  *   `<ts>.<action>[.<state>]`
  *
  * (action ∈ commit/deltacommit/clean/compaction/…; a missing state
  * suffix means COMPLETED, `.inflight`/`.requested` are the
  * in-progress states a reader must skip — Hudi's snapshot isolation
  * lives in the filename). Completed commit content is JSON whose
  * `partitionToWriteStats` maps partitions to per-file write stats
  * (numWrites, totalWriteBytes) — the numbers an ingestion monitor
  * tracks.
  *
  * Input model mirrors the Delta walkers: one row per timeline FILE,
  * `(table, filename, content)`. Everything is declarative — filename
  * split + get_json_object/from_json + one explode over the
  * metadata-sized stats map; no mapPartitions.
  *
  * Honest boundaries: an INFLIGHT/REQUESTED instant's stats are never
  * counted (the transaction may abort); a completed write instant
  * whose content does not parse as JSON counts `n_malformed` and
  * contributes nothing; actions without write stats (clean, …)
  * contribute zero rows/bytes without being malformed.
  */
object HudiOps {

  def timelineCensus(df: DataFrame, tableCol: String, fnameCol: String,
                     contentCol: String): DataFrame = {
    import org.apache.spark.sql.types._
    val parts = split(col(fnameCol), "\\.")
    val p = df.select(
      col(tableCol).cast("long").as("tbl"),
      element_at(parts, 1).cast("long").as("ts"),
      element_at(parts, 2).as("action"),
      coalesce(try_element_at(parts, lit(3)), lit("completed")).as("state"),
      col(contentCol).as("content"))
    val isWrite = col("action").isin("commit", "deltacommit")
    val completed = col("state") === "completed"
    // stats schema: partition -> array of per-file write stats
    val statsSchema = MapType(StringType, ArrayType(StructType(Seq(
      StructField("numWrites", LongType),
      StructField("totalWriteBytes", LongType)))))
    val parsed = p.withColumn("_obj", get_json_object(col("content"), "$"))
      .withColumn("_stats",
        from_json(get_json_object(col("content"), "$.partitionToWriteStats"),
          statsSchema))
    val base = parsed.groupBy("tbl").agg(
      count(lit(1)).as("n_instants"),
      sum(completed.cast("long")).as("n_completed"),
      sum((col("state") === "inflight").cast("long")).as("n_inflight"),
      sum((col("state") === "requested").cast("long")).as("n_requested"),
      sum((col("action") === "commit").cast("long")).as("n_commits"),
      sum((col("action") === "deltacommit").cast("long")).as("n_deltacommits"),
      sum((col("action") === "clean").cast("long")).as("n_cleans"),
      coalesce(max(when(completed, col("ts"))), lit(-1L))
        .as("latest_completed_ts"),
      sum((completed && isWrite && col("_obj").isNull).cast("long"))
        .as("n_malformed"))
    // write totals: completed write instants only, stats exploded at
    // the metadata grain (per-partition per-file rows)
    val writes = parsed
      .filter(completed && isWrite && col("_stats").isNotNull)
      .select(col("tbl"), explode(col("_stats")).as(Seq("_p", "_files")))
      .select(col("tbl"), explode(col("_files")).as("_f"))
      .groupBy("tbl").agg(
        sum(coalesce(col("_f.numWrites"), lit(0L))).as("rows_written"),
        sum(coalesce(col("_f.totalWriteBytes"), lit(0L))).as("bytes_written"))
    base.join(writes, Seq("tbl"), "left")
      .select(col("tbl"), col("n_instants"), col("n_completed"),
        col("n_inflight"), col("n_requested"), col("n_commits"),
        col("n_deltacommits"), col("n_cleans"), col("latest_completed_ts"),
        coalesce(col("rows_written"), lit(0L)).as("rows_written"),
        coalesce(col("bytes_written"), lit(0L)).as("bytes_written"),
        col("n_malformed"))
  }

  // ------------------------------------------------------------------
  // Merge-on-read FILE GROUPS (r14 verdict item 4): q411 reads the
  // timeline; a MOR table's live rows live in file groups — a base
  // parquet file plus ordered log files of inserts/updates/deletes
  // appended against that base's instant. Compaction writes a NEW base
  // at a newer instant; logs attached to the OLD base instant become
  // obsolete (cleanable), and the operational question is per-group
  // COMPACTION DEBT: how many log bytes are pending merge into the
  // current base.

  /** Per-file-group census over a file LISTING with per-file stats
    * (the shape a reader assembles from the timeline's write stats —
    * metadata grain, never data rows):
    * `(table, fileId, kind 'base'|'log', ts, bytes, rows, inserts,
    * deletes)` where `ts` is a base file's instant or the base
    * instant a log file attaches to.
    *
    * Slice semantics (the Hudi reader's): the CURRENT slice of a
    * group is its newest base file plus the logs attached to exactly
    * that instant; logs attached to older instants (and older base
    * files) are obsolete. A group with NO base file is log-only
    * (inserts routed to a new group before first compaction) — all
    * its logs are current. net_rows = base rows + current-log inserts
    * − current-log deletes; debt_bytes = current-log bytes;
    * obsolete_bytes = superseded bases + logs, the VACUUM-equivalent
    * reclaim. One groupBy on (table, fileId) — metadata-sized.
    */
  def morFileGroups(files: DataFrame, tableCol: String, fileIdCol: String,
      kindCol: String, tsCol: String, bytesCol: String, rowsCol: String,
      insertsCol: String, deletesCol: String): DataFrame = {
    val f = files.select(
      col(tableCol).cast("long").as("tbl"), col(fileIdCol).as("fid"),
      col(kindCol).as("kind"), col(tsCol).cast("long").as("ts"),
      col(bytesCol).cast("long").as("bytes"), col(rowsCol).cast("long").as("rows"),
      col(insertsCol).cast("long").as("ins"), col(deletesCol).cast("long").as("del"))
      .localCheckpoint(false) // consumers: base pass + log pass
    val base = f.filter(col("kind") === "base")
      .groupBy("tbl", "fid").agg(
        max("ts").as("base_ts"),
        count(lit(1)).as("n_base"),
        max_by(col("rows"), col("ts")).as("base_rows"),
        max_by(col("bytes"), col("ts")).as("cur_base_bytes"),
        sum("bytes").as("base_bytes_total"))
    val logs = f.filter(col("kind") === "log")
      .join(base.select("tbl", "fid", "base_ts"), Seq("tbl", "fid"), "left")
      .withColumn("cur", col("base_ts").isNull || col("ts") === col("base_ts"))
      .groupBy("tbl", "fid").agg(
        count(lit(1)).as("n_logs"),
        sum(col("cur").cast("long")).as("n_cur_logs"),
        sum(when(col("cur"), coalesce(col("ins"), lit(0L))).otherwise(0L))
          .as("cur_inserts"),
        sum(when(col("cur"), coalesce(col("del"), lit(0L))).otherwise(0L))
          .as("cur_deletes"),
        sum(when(col("cur"), coalesce(col("bytes"), lit(0L))).otherwise(0L))
          .as("debt_bytes"),
        sum(when(!col("cur"), coalesce(col("bytes"), lit(0L))).otherwise(0L))
          .as("obsolete_log_bytes"))
    base.join(logs, Seq("tbl", "fid"), "full")
      .select(col("tbl"), col("fid").as("file_id"),
        col("base_ts").isNotNull.cast("long").as("has_base"),
        coalesce(col("base_ts"), lit(-1L)).as("base_ts"),
        coalesce(col("n_base"), lit(0L)).as("n_base_files"),
        coalesce(col("n_logs"), lit(0L)).as("n_log_files"),
        coalesce(col("n_cur_logs"), lit(0L)).as("n_current_logs"),
        coalesce(col("base_rows"), lit(0L)).as("base_rows"),
        (coalesce(col("base_rows"), lit(0L)) +
          coalesce(col("cur_inserts"), lit(0L)) -
          coalesce(col("cur_deletes"), lit(0L))).as("net_rows"),
        coalesce(col("cur_inserts"), lit(0L)).as("log_inserts"),
        coalesce(col("cur_deletes"), lit(0L)).as("log_deletes"),
        coalesce(col("debt_bytes"), lit(0L)).as("debt_bytes"),
        (coalesce(col("base_bytes_total"), lit(0L)) -
          coalesce(col("cur_base_bytes"), lit(0L)) +
          coalesce(col("obsolete_log_bytes"), lit(0L))).as("obsolete_bytes"),
        (coalesce(col("debt_bytes"), lit(0L)) > 0).cast("long")
          .as("needs_compaction"))
  }

  /** Per-table compaction-debt rollup over [[morFileGroups]] output —
    * the number an operator pages on: total pending log bytes, the
    * worst single group, and how much a compaction+clean would
    * reclaim.
    */
  def morCompactionDebt(groups: DataFrame): DataFrame =
    groups.groupBy("tbl").agg(
      count(lit(1)).as("n_groups"),
      sum((col("has_base") === 0).cast("long")).as("n_log_only_groups"),
      sum("n_base_files").as("n_base_files"),
      sum("n_log_files").as("n_log_files"),
      sum("n_current_logs").as("n_current_logs"),
      sum("base_rows").as("base_rows"),
      sum("net_rows").as("net_rows"),
      sum("log_inserts").as("log_inserts"),
      sum("log_deletes").as("log_deletes"),
      sum("debt_bytes").as("debt_bytes"),
      max("debt_bytes").as("max_group_debt_bytes"),
      sum("obsolete_bytes").as("obsolete_bytes"),
      sum("needs_compaction").as("n_groups_needing_compaction"))

  /** Deterministic per-table MOR file listing from `k` alone (q417's
    * oracle): g = 1 + k%3 groups, group j's class = (k + j) % 4 —
    *
    *   0 → base@100 + two current logs (live debt);
    *   1 → COMPACTION RESET: base@100 superseded by base@200, one log
    *       stranded at 100 (obsolete), one current at 200;
    *   2 → base only (zero debt);
    *   3 → LOG-ONLY group (no base yet, all logs current).
    */
  def syntheticMorFiles(k: Long):
      Seq[(String, String, Long, Long, Long, Long, Long)] = {
    val g = (1 + k % 3).toInt
    (0 until g).flatMap { j =>
      val fid = s"g$j"
      ((k + j) % 4).toInt match {
        case 0 => Seq(
          (fid, "base", 100L, 1000L + 10 * j, 50L + j, 0L, 0L),
          (fid, "log", 100L, 100L + j, 0L, 5L + j, 1L),
          (fid, "log", 100L, 200L, 0L, 10L + j, 0L))
        case 1 => Seq(
          (fid, "base", 100L, 900L, 40L + j, 0L, 0L),
          (fid, "base", 200L, 950L + j, 44L + j, 0L, 0L),
          (fid, "log", 100L, 300L, 0L, 7L, 2L), // stranded pre-compaction
          (fid, "log", 200L, 150L + j, 0L, 3L + j, 1L))
        case 2 => Seq(
          (fid, "base", 100L, 800L + j, 30L + j, 0L, 0L))
        case _ => Seq(
          (fid, "log", 100L, 400L + j, 0L, 20L + j, 0L),
          (fid, "log", 100L, 100L, 0L, 5L, 1L))
      }
    }
  }

  /** Deterministic per-table timeline from `k` alone (q411's oracle):
    * nI = 2 + k%4 instants at ts 1000+i; action by i%3
    * (commit/deltacommit/clean); the LAST instant is inflight when
    * k%5==0 and requested when k%5==1; write instants carry two
    * partitions' stats (rows 10+i and 11+i, bytes 100(i+1) and
    * 100(i+2)); the FIRST completed write instant's content is
    * corrupt every 11th table.
    */
  def syntheticTimeline(k: Long): Seq[(String, String)] = {
    val nI = (2 + k % 4).toInt
    (0 until nI).map { i =>
      val ts = 1000 + i
      val action = (i % 3) match {
        case 0 => "commit"
        case 1 => "deltacommit"
        case _ => "clean"
      }
      val state =
        if (i == nI - 1 && k % 5 == 0) ".inflight"
        else if (i == nI - 1 && k % 5 == 1) ".requested"
        else ""
      val fname = s"$ts.$action$state"
      val isWrite = action != "clean"
      val firstWrite = (0 until nI).find(j => j % 3 != 2).contains(i)
      val content =
        if (state.nonEmpty) "" // in-progress instants have no content yet
        else if (isWrite && firstWrite && k % 11 == 0) "corrupt{"
        else if (isWrite)
          s"""{"partitionToWriteStats":{"p0":[{"numWrites":${10 + i},"totalWriteBytes":${100 * (i + 1)}}],"p1":[{"numWrites":${11 + i},"totalWriteBytes":${100 * (i + 2)}}]}}"""
        else "{}"
      (fname, content)
    }
  }
}

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

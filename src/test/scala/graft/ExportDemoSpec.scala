package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** End-to-end export invariants: curation only ever removes documents,
  * every surviving payload lands in exactly one shard, the manifest's
  * order-independent content hash re-verifies from the written JSONL
  * bytes, and compaction preserves the feature rows.
  */
class ExportDemoSpec extends SparkSpec {

  test("export pipeline: shards + manifest + compaction agree end-to-end") {
    val out = Files.createTempDirectory("graft-export-spec").toString
    val r = ExportDemo.run(spark, "/root/testdata/sf0.001", out, numShards = 4)
    assert(r.input == 500L)
    assert(r.curated > 0 && r.curated < r.input) // curation removed something
    assert(r.manifestRows == 4)

    // re-derive the manifest from the WRITTEN shard files: same rows,
    // same chars, same content hash per shard — proving what landed on
    // disk is exactly what the manifest certified
    val written = spark.read
      .schema("doc_id LONG, payload STRING")
      .json(s"$out/shards")
      .withColumn("shard",
        regexp_extract(input_file_name(), "shard=(\\d+)", 1).cast("int"))
    val rederived = graft.sources.Sinks.shardManifest(written, "shard", "payload")
      .collect().map(r => (r.getInt(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val stored = spark.read.parquet(s"$out/manifest")
      .collect().map(r => (r.getInt(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(rederived == stored)
    assert(stored.values.map(_._1).sum == r.curated) // every survivor in exactly one shard

    // compaction preserved the feature rows
    val features = spark.read.parquet(s"$out/features")
    assert(features.count() == r.curated)
    assert(new java.io.File(s"$out/features").listFiles
      .count(_.getName.endsWith(".parquet")) == r.compactedFiles)
  }
}

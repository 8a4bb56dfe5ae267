package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

class SourcesSinksSpec extends SparkSpec {

  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", IntegerType), StructField("v", DoubleType),
    StructField("s", StringType)))

  test("csv round-trip with pinned schema; malformed numeric → null") {
    val dir = Files.createTempDirectory("graft-src").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/t.csv"),
      "id,v,s\n1,2.5,a\n2,oops,b\n")
    val df = Sources.csv(spark, s"$dir/t.csv", schema)
    assertRowsEqual(rows(df.orderBy("id")),
      Seq(Seq(1, 2.5, "a"), Seq(2, null, "b")))
  }

  test("gzip CSV reads transparently but costs splittability — the scale caveat") {
    val dir = Files.createTempDirectory("graft-srcgz").toString
    val body = new StringBuilder("id,v,s\n")
    (1 to 40000).foreach(i => body.append(s"$i,${i % 97}.5,row-padding-$i\n"))
    Files.writeString(java.nio.file.Paths.get(s"$dir/t.csv"), body.toString)
    val gz = new java.util.zip.GZIPOutputStream(
      new java.io.FileOutputStream(s"$dir/t.csv.gz"))
    gz.write(body.toString.getBytes("UTF-8")); gz.close()

    val prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "65536")
      val plain = Sources.csv(spark, s"$dir/t.csv", schema)
      val packed = Sources.csv(spark, s"$dir/t.csv.gz", schema)
      // same rows either way — Spark dispatches the codec by extension
      assert(packed.count() == 40000 && plain.count() == 40000)
      assert(rows(packed.orderBy("id").limit(1)) == rows(plain.orderBy("id").limit(1)))
      // the ~1 MB plain file splits into many input partitions at a
      // 64 KiB target; the gzip stream CANNOT split — one task must
      // inflate the whole file. This is why a 100 TB ingest wants many
      // medium .gz files (or zstd/bzip2 splittable framing), never one
      // giant gzip member.
      assert(plain.rdd.getNumPartitions > 4, s"plain=${plain.rdd.getNumPartitions}")
      assert(packed.rdd.getNumPartitions == 1, s"gz=${packed.rdd.getNumPartitions}")
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
  }

  test("jsonRecords parses a REST-style record array with pinned schema") {
    val records = Seq("""{"id":1,"v":1.5,"s":"x"}""", """{"id":2,"v":null,"s":"y"}""")
    val df = Sources.jsonRecords(spark, records, schema)
    assertRowsEqual(rows(df.orderBy("id")),
      Seq(Seq(1, 1.5, "x"), Seq(2, null, "y")))
  }

  test("sink csv single-file writes exactly one part; parquet round-trips partitioned") {
    val dir = Files.createTempDirectory("graft-sink").toString
    val df = Seq((1, 1.0, "a"), (2, 2.0, "b"), (3, 3.0, "a")).toDF("id", "v", "s")
    Sinks.csv(df, s"$dir/csv", singleFile = true)
    val parts = new java.io.File(s"$dir/csv").listFiles.count(_.getName.endsWith(".csv"))
    assert(parts == 1)
    Sinks.parquet(df, s"$dir/pq", partitionBy = Seq("s"))
    val back = spark.read.parquet(s"$dir/pq")
    assert(back.count() == 3)
    // partition pruning: reading s=a touches only that directory
    val pruned = back.filter(col("s") === "a")
    assert(pruned.count() == 2)
    assert(pruned.queryExecution.executedPlan.toString.contains("PartitionFilters: [isnotnull(s"))
  }

  test("jsonlShards writes one ordered JSONL file per shard and round-trips") {
    val dir = Files.createTempDirectory("graft-jsonl").toString
    val docs = (0L until 40L).map(i => (i, s"doc $i", i % 4)).toDF("doc_id", "text", "shard")
    Sinks.jsonlShards(docs, s"$dir/shards", "shard", numShards = 4,
      orderCol = Some("doc_id"))
    for (k <- 0 until 4) {
      val files = new java.io.File(s"$dir/shards/shard=$k").listFiles
        .filter(_.getName.endsWith(".json"))
      assert(files.length == 1, s"shard=$k has ${files.length} part files")
      // orderCol makes the byte layout reproducible: lines in doc_id order
      val ids = scala.io.Source.fromFile(files.head).getLines()
        .map(l => """"doc_id":(\d+)""".r.findFirstMatchIn(l).get.group(1).toLong).toSeq
      assert(ids == ids.sorted && ids.nonEmpty, s"shard=$k order: $ids")
    }
    val back = spark.read.json(s"$dir/shards")
    assert(back.count() == 40)
    assert(back.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq == (0L until 40L))
  }

  test("upsertKeepFirst reproduces ON CONFLICT DO NOTHING under arrival order") {
    val df = Seq((1, "first", 10L), (1, "second", 20L), (2, "only", 5L))
      .toDF("id", "payload", "arrival")
    val out = Sinks.upsertKeepFirst(df, Seq("id"), col("arrival").asc).orderBy("id")
    assertRowsEqual(rows(out.select("id", "payload")),
      Seq(Seq(1, "first"), Seq(2, "only")))
    assert(Sinks.pkViolations(out, Seq("id")) == 0)
  }

  test("shardManifest content hash is order- and partitioning-independent") {
    val df = (1L to 300L).map(i => (i % 5, s"payload-$i-${"x" * (i % 17).toInt}"))
      .toDF("shard", "payload")
    val base = graft.sources.Sinks.shardManifest(df, "shard", "payload")
      .orderBy("shard").collect().map(_.toSeq)
    // reversed input order, different partitioning: identical manifest
    val shuffled = df.orderBy(org.apache.spark.sql.functions.col("payload").desc)
      .repartition(13)
    val again = graft.sources.Sinks.shardManifest(shuffled, "shard", "payload")
      .orderBy("shard").collect().map(_.toSeq)
    assert(base.toSeq == again.toSeq)
    // a single altered row flips exactly its shard's hash
    val tampered = df.withColumn("payload",
      org.apache.spark.sql.functions.when(
        org.apache.spark.sql.functions.col("payload") === "payload-7-xxxxxxx",
        "payload-7-TAMPERED").otherwise(org.apache.spark.sql.functions.col("payload")))
    val tm = graft.sources.Sinks.shardManifest(tampered, "shard", "payload")
      .orderBy("shard").collect().map(_.toSeq)
    val diffs = base.zip(tm).count { case (a, b) => a != b }
    assert(diffs == 1, s"expected exactly one shard hash to change, got $diffs")
  }

  test("orc sink/source round-trips a partitioned write with pushdown-friendly schema") {
    val dir = Files.createTempDirectory("graft-orc").toString
    val df = Seq((1, 1.5, "a", "x"), (2, 2.5, "b", "y"), (3, 3.5, "c", "x"))
      .toDF("id", "v", "s", "part")
    graft.sources.Sinks.orc(df, s"$dir/t", partitionBy = Seq("part"))
    val schema = StructType(Seq(
      StructField("id", IntegerType), StructField("v", DoubleType),
      StructField("s", StringType), StructField("part", StringType)))
    val back = graft.sources.Sources.orc(spark, s"$dir/t", schema)
    assert(back.orderBy("id").collect().map(_.toSeq).toSeq ==
      df.orderBy("id").collect().map(_.toSeq).toSeq)
    // partition pruning: a part filter reads one directory
    val pruned = back.filter(org.apache.spark.sql.functions.col("part") === "x")
    assert(pruned.count() == 2)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") || pruned.inputFiles.length == 1,
      s"expected partition pruning evidence\n$plan")
  }

  test("csvWithQuarantine: good rows parse, bad rows preserved verbatim") {
    val dir = java.nio.file.Files.createTempDirectory("graft-quarantine").toString
    val lines = Seq(
      "id,score,name",
      "1,10.5,alpha",
      "2,not_a_number,beta",   // bad numeric
      "3,30.25,gamma",
      "4,40.0,delta,EXTRA")    // too many columns
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/in.csv"),
      String.join("\n", lines: _*).getBytes)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("score", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("name", org.apache.spark.sql.types.StringType)))
    val (good, bad) = Sources.csvWithQuarantine(spark, s"$dir/in.csv", schema)
    val g = good.collect().map(r => (r.getInt(0), r.getDouble(1), r.getString(2))).toSet
    assert(g == Set((1, 10.5, "alpha"), (3, 30.25, "gamma")))
    val b = bad.collect().map(_.getString(0)).toSet
    assert(b == Set("2,not_a_number,beta", "4,40.0,delta,EXTRA"),
      s"quarantine must keep the original bytes, got $b")
    assert(bad.collect().forall(_.getString(1).endsWith("in.csv")))
  }
}

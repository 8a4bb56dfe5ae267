package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The Iceberg table-root composition (metadata.json → manifest-list →
  * manifests): the gated dangling-snapshot class, the claims audit,
  * and the missing-manifest boundary — the cases q402's closed-form
  * oracle plants, pinned here at unit scale with hand-built tables.
  */
class IcebergTableRootSpec extends SparkSpec {

  import spark.implicits._
  import IcebergOps._

  private def frames(ks: Seq[Long]) = {
    val meta = ks.map(k => (k, syntheticTable(k)._1)).toDF("tbl", "meta_json")
    val lists = ks.map { k =>
      val t = syntheticTable(k); (k, t._2, t._3)
    }.toDF("tbl", "path", "payload")
    val mans = ks.flatMap(k => syntheticTable(k)._4.map {
      case (p, b) => (k, p, b)
    }).toDF("tbl", "path", "payload")
    (meta, lists, mans)
  }

  private def census(meta: org.apache.spark.sql.DataFrame,
                     lists: org.apache.spark.sql.DataFrame,
                     mans: org.apache.spark.sql.DataFrame) =
    tableRootCensus(meta, "tbl", "meta_json", lists, "tbl", "path", "payload",
      mans, "tbl", "path", "payload")
      .collect().map(r => r.getAs[Long]("tbl") -> r).toMap

  test("healthy table: list claims verify against decoded manifests, live set sums") {
    val (meta, lists, mans) = frames(Seq(5L))
    val c = census(meta, lists, mans)(5L)
    // k=5: nM = 3 manifests, current ok, no planted drift
    assert(c.getAs[Long]("current_ok") == 1 && c.getAs[Long]("list_valid") == 1)
    assert(c.getAs[Long]("n_manifest_files") == 3)
    assert(c.getAs[Long]("n_claims_mismatch") == 0)
    assert(c.getAs[Long]("n_manifests_missing") == 0)
    assert(c.getAs[Long]("n_snapshots") == 2 && c.getAs[Long]("spec_id") == 1)
    // live set: manifests i=0..2, nE = 2+(5+i)%3, status (i+j+5)%3
    val want = (0 until 3).flatMap { i =>
      (0 until (2 + (5 + i) % 3)).filter(j => (i + j + 5) % 3 != 2)
    }.size
    assert(c.getAs[Long]("n_live") == want.toLong)
  }

  test("a dangling current-snapshot-id gates every downstream facet to zero") {
    val (meta, lists, mans) = frames(Seq(17L))
    val c = census(meta, lists, mans)(17L)
    assert(c.getAs[Long]("current_ok") == 0, c.toString)
    assert(c.getAs[Long]("list_valid") == 0 && c.getAs[Long]("n_manifest_files") == 0)
    assert(c.getAs[Long]("n_live") == 0 && c.getAs[Long]("live_bytes") == 0)
    // the metadata facets themselves still report (they were readable)
    assert(c.getAs[Long]("n_snapshots") == 2 && c.getAs[Long]("format_version") == 2)
  }

  test("a wrong file-count claim in the list is a mismatch, not trusted") {
    val (meta, lists, mans) = frames(Seq(13L)) // k=13: planted claim drift
    val c = census(meta, lists, mans)(13L)
    assert(c.getAs[Long]("n_claims_mismatch") == 1, c.toString)
  }

  test("a named-but-absent manifest counts missing; present ones still census") {
    val (meta, lists, mans) = frames(Seq(5L))
    val dropped = mans.filter(col("path") =!= "m1.avro")
    val c = census(meta, lists, dropped)(5L)
    assert(c.getAs[Long]("n_manifests_missing") == 1, c.toString)
    assert(c.getAs[Long]("n_manifest_files") == 3, "the list still names 3")
    val full = census(meta, lists, mans)(5L)
    assert(c.getAs[Long]("n_live") < full.getAs[Long]("n_live"),
      "missing manifest's entries must NOT be guessed into the live set")
  }
}

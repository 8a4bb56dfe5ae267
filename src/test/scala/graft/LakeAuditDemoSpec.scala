package graft

/** The lake-audit composition end to end at sf0.001: every layer's
  * claim must reconcile with every other layer's — the demo is only
  * evidence if the numbers cross-check, and the card must re-derive
  * from the WRITTEN bytes, not the source it came from.
  */
class LakeAuditDemoSpec extends SparkSpec {

  test("lake audit: log, footers, zone maps and card all reconcile on written bytes") {
    val outDir = java.nio.file.Files.createTempDirectory("graft-lakeaudit").toString
    val sfDir = "/root/testdata/sf0.001"
    val r = LakeAuditDemo.run(spark, sfDir, outDir)

    // layer agreement (run() already requires rows to match; re-pin)
    assert(r.nFiles == 8 && r.liveFiles == r.nFiles,
      "the churned file must be revived by replay")
    assert(r.liveRows == r.footerRows && r.footerRows == r.cardDocs,
      s"log/footer/card row claims diverged: $r")
    assert(r.footersValid == r.nFiles, "every written footer must walk")

    // the log's stats and the REAL footer zone maps must agree on
    // which files a doc_id > max/2 predicate can skip
    assert(r.zoneSkippable + r.zoneScanned == r.nFiles)
    assert(r.logPruneSkippable == r.zoneSkippable,
      s"Delta-log stats (${r.logPruneSkippable}) vs real zone maps " +
        s"(${r.zoneSkippable}) — the synthesized log lied about the bytes")
    assert(r.zoneSkippable > 0,
      "the range-clustered layout must make some file provably skippable")

    // ROW layer: live rows after the deletion vector, reconciled
    // across Delta-DV and Iceberg-positional expressions of the SAME
    // deletes (run() already requires equality; re-pin the shape)
    assert(r.dvDeletes > 0 && r.netRowsLog == r.liveRows - r.dvDeletes,
      s"net rows must be live minus DV cardinality: $r")
    assert(r.netRowsIceberg == r.netRowsLog)

    // PAGE layer: the real parquet-mr page index prices doc_id > T in
    // rows that partition the total; the sorted layout must make the
    // skippable side substantial, and every file's pages must be
    // priceable (parquet-mr writes the OffsetIndex)
    assert(r.pageRowsUnknown == 0, s"real files must carry page indexes: $r")
    assert(r.pageRowsSkippable + r.pageRowsScanned == r.liveRows)
    assert(r.pageRowsSkippable > 0 && r.pageRowsScanned > 0,
      s"a mid-range threshold must split pages both ways: $r")
    // page pruning is at least as sharp as file pruning: every row a
    // zone-skippable FILE holds is page-skippable too (loose bound —
    // range partitioning makes files only approximately equal-sized)
    assert(r.pageRowsSkippable >= r.liveRows * r.zoneSkippable / (2 * r.nFiles),
      s"page layer lost rows file pruning had: $r")

    // the q415 decoder re-derived every row from raw page bytes
    assert(r.decodedFilesOk == r.nFiles && r.decodedRows == r.liveRows, s"$r")

    // card re-derivation: the card off the written table equals the
    // card off the original source — identical content, different home
    val fromWritten = graft.queries.CorpusQueries.q354
      .fn(spark, s"$outDir/lake").collect().map(_.toSeq)
    val fromSource = graft.queries.CorpusQueries.q354
      .fn(spark, sfDir).collect().map(_.toSeq)
    assert(fromWritten.length == fromSource.length && r.cardSources > 0)
    fromWritten.zip(fromSource).foreach { case (w, s) =>
      assert(w == s, s"card row diverged after the write round-trip:\n  $w\n  $s")
    }
  }
}

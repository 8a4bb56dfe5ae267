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

package graft.curation

import graft.{SparkSpec, Tables}

class CurationPipelineSpec extends SparkSpec {

  import org.apache.spark.sql.functions._
  import spark.implicits._

  test("stages shrink monotonically and deterministically on the synthetic corpus") {
    val docs = Tables.load(spark, "/root/testdata/sf0.01", "documents")
    val c = CurationPipeline.stageCounts(docs, "doc_id", "text",
      CurationPipeline.Config(minQuality = 0.5, allowedLangs = Seq("en"),
        nearDupJaccard = 0.5))
    assert(c.input == 500)
    assert(c.afterQuality <= c.input)
    assert(c.afterLang <= c.afterQuality)
    assert(c.afterExactDedup <= c.afterLang)
    assert(c.afterNearDedup <= c.afterExactDedup)
    assert(c.afterNearDedup > 0)
    // deterministic: a second run returns identical counts
    val c2 = CurationPipeline.stageCounts(docs, "doc_id", "text",
      CurationPipeline.Config(minQuality = 0.5, allowedLangs = Seq("en"),
        nearDupJaccard = 0.5))
    assert(c == c2)
  }

  test("decontamination stage drops exactly the survivors that overlap the eval set") {
    val docs = Seq(
      (1L, "the a quick brown fox jumps over the lazy dog every single day"),
      (2L, "the a slow green turtle walks under the busy bridge every night"),
      (3L, "the a completely different document about spark query engines"))
      .toDF("doc_id", "text")
    // eval doc shares doc 1's trigrams almost verbatim, nothing of 2/3
    val eval = Seq((100L, "the a quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val cfg = CurationPipeline.Config(minQuality = 0.0, maxEvalOverlap = 0.2)
    val withEval = CurationPipeline.curate(docs, "doc_id", "text", cfg, Some(eval))
      .select("doc_id").orderBy("doc_id").as[Long].collect().toSeq
    val without = CurationPipeline.curate(docs, "doc_id", "text", cfg)
      .select("doc_id").orderBy("doc_id").as[Long].collect().toSeq
    assert(without == Seq(1L, 2L, 3L))
    assert(withEval == Seq(2L, 3L), s"contaminated doc 1 must drop: $withEval")
  }

  test("batchReport outcomes partition the batch and sum to n_input") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val isEval = pmod(col("doc_id"), lit(97)) === 0
    val batch = docs.filter(pmod(col("doc_id"), lit(5)) === 0 && !isEval)
    val store = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0 && !isEval)
      .select(graft.operators.TextAnalysis.contentFingerprint(col("text")).as("_fp"))
    val tagged = CurationPipeline.curateIncrementalTagged(
      batch, store, "doc_id", "text",
      CurationPipeline.Config(maxEvalOverlap = 0.05),
      evalDocs = Some(docs.filter(isEval)))
    // one tag per batch doc, no doc lost or duplicated by the joins
    assert(tagged.count() == batch.count())
    val r = CurationPipeline.batchReport(tagged).collect()(0)
    val parts = (1 to 6).map(r.getLong)
    assert(parts.sum == r.getLong(0), s"${parts.mkString("+")} != ${r.getLong(0)}")
    assert(r.getLong(6) > 0) // n_kept
    assert(r.getDouble(7) >= 0.0 && r.getDouble(7) <= 1.0)
  }

  test("near-dup removal keeps the lower id of a planted duplicate pair") {
    val docs = Seq(
      (1L, "the a quick brown fox jumps over the lazy dog again and again"),
      (2L, "the a quick brown fox jumps over the lazy dog again and again"),
      (3L, "the a completely different document about spark query engines"))
      .toDF("doc_id", "text")
    val out = CurationPipeline.curate(docs, "doc_id", "text",
      CurationPipeline.Config(minQuality = 0.0))
      .select("doc_id").orderBy("doc_id").as[Long].collect()
    // 1 and 2 are byte-identical → exact dedup keeps 1; 3 survives
    assert(out.toSeq == Seq(1L, 3L))
  }
}

package graft.curation

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextAnalysis}
import graft.operators.Relational.dedupKeepFirst

/** End-to-end corpus curation: the composition a training-data pipeline
  * actually runs, built from the engine's operators —
  *
  *   quality filter → language filter → exact dedup → near-dup removal
  *   [→ eval decontamination, when an eval corpus is supplied]
  *
  * Each stage is a lazy DataFrame transform; Catalyst fuses the per-row
  * stages (quality, language, fingerprint) into one scan pass. The only
  * shuffles are the two dedups — exactly the minimum the semantics
  * require. Near-dup removal keeps the lowest doc id of each MinHash
  * pair (greedy per-pair survivor, deterministic). Decontamination
  * drops survivors whose trigram-shingle overlap with the eval set
  * reaches `maxEvalOverlap` (Dedup.shingleOverlapVsEval — broadcast
  * under a size guard, q91's shuffled shape otherwise).
  */
object CurationPipeline {

  final case class Config(
      minQuality: Double = 0.5,
      allowedLangs: Seq[String] = Seq("en"),
      stopwords: Seq[String] = Seq("the", "a", "of", "and"),
      markerSets: Seq[(String, Seq[String])] = Seq(
        "en" -> Seq("the", "a"),
        "de" -> Seq("der", "und", "das"),
        "es" -> Seq("el", "los", "que"),
        "fr" -> Seq("le", "la", "et"),
        "zh" -> Seq("zh1", "zh2")),
      shingleWidth: Int = 2,
      minhashK: Int = 12,
      rowsPerBand: Int = 2,
      nearDupJaccard: Double = 0.5,
      contamShingleWidth: Int = 3,
      maxEvalOverlap: Double = 0.2,
      maxBroadcastEvalDocs: Long = 100000L)

  final case class StageCounts(input: Long, afterQuality: Long,
      afterLang: Long, afterExactDedup: Long, afterNearDedup: Long)

  /** Run the full curation over a corpus with (idCol: long, textCol:
    * string). Returns the curated frame (lazily composed — nothing runs
    * until an action).
    */
  def curate(docs: DataFrame, idCol: String, textCol: String,
             cfg: Config = Config(),
             evalDocs: Option[DataFrame] = None): DataFrame = {
    val scored = docs
      .withColumn("_quality", TextAnalysis.qualityScore(col(textCol), cfg.stopwords))
      .withColumn("_lang", TextAnalysis.langId(col(textCol), cfg.markerSets))
      .filter(col("_quality") >= cfg.minQuality)
      .filter(col("_lang").isin(cfg.allowedLangs: _*))
    // materialized once (lazy local checkpoint): the exact-dedup
    // survivors feed both the near-dup pair generation and the final
    // anti-join — without it the whole quality→language→dedup lineage
    // recomputes per reference
    val exact = dedupKeepFirst(
      scored.withColumn("_fp", TextAnalysis.contentFingerprint(col(textCol))),
      Seq("_fp"), Seq(col(idCol).asc))
      .localCheckpoint(false)
    val nearDupLosers = Dedup.minhashLshPairs(exact, idCol, textCol,
        cfg.shingleWidth, cfg.minhashK, cfg.rowsPerBand, cfg.nearDupJaccard)
      .select(col("id_b").as(idCol))
      .distinct()
    val deduped = exact
      .join(nearDupLosers, Seq(idCol), "left_anti")
      .drop("_fp")
    evalDocs.fold(deduped) { ev =>
      val contaminated = Dedup.shingleOverlapVsEval(deduped, ev, idCol, textCol,
          cfg.contamShingleWidth, cfg.maxBroadcastEvalDocs)
        .filter(col("overlap_frac") >= cfg.maxEvalOverlap)
        .select(col(idCol))
      deduped.join(contaminated, Seq(idCol), "left_anti")
    }
  }

  /** Per-stage rows + wall seconds (each stage timed by its own
    * count() action, cumulative lineage per stage — audit/bench
    * instrumentation, not the hot path; Bench publishes these into
    * the round's BASELINE evidence).
    */
  def stageTimings(docs: DataFrame, idCol: String, textCol: String,
                   cfg: Config = Config(),
                   evalDocs: Option[DataFrame] = None): Seq[(String, Long, Double)] = {
    def timed(name: String, df: DataFrame): (String, Long, Double) = {
      val t0 = System.nanoTime()
      val n = df.count()
      (name, n, (System.nanoTime() - t0) / 1e9)
    }
    val q = docs.filter(TextAnalysis.qualityScore(col(textCol), cfg.stopwords) >= cfg.minQuality)
    val l = q.filter(TextAnalysis.langId(col(textCol), cfg.markerSets).isin(cfg.allowedLangs: _*))
    val e = dedupKeepFirst(
      l.withColumn("_fp", TextAnalysis.contentFingerprint(col(textCol))),
      Seq("_fp"), Seq(col(idCol).asc))
    Seq(
      timed("input", docs),
      timed("quality", q),
      timed("language", l),
      timed("exact_dedup", e),
      timed("near_dedup", curate(docs, idCol, textCol, cfg))) ++
      evalDocs.map(ev =>
        timed("decontam", curate(docs, idCol, textCol, cfg, Some(ev)))).toSeq
  }

  /** Per-stage row counts (runs the pipeline stage by stage — four
    * actions; use for auditing, not in the hot path).
    */
  def stageCounts(docs: DataFrame, idCol: String, textCol: String,
                  cfg: Config = Config()): StageCounts = {
    val q = docs.filter(TextAnalysis.qualityScore(col(textCol), cfg.stopwords) >= cfg.minQuality)
    val l = q.filter(TextAnalysis.langId(col(textCol), cfg.markerSets).isin(cfg.allowedLangs: _*))
    val e = dedupKeepFirst(
      l.withColumn("_fp", TextAnalysis.contentFingerprint(col(textCol))),
      Seq("_fp"), Seq(col(idCol).asc))
    StageCounts(
      input = docs.count(),
      afterQuality = q.count(),
      afterLang = l.count(),
      afterExactDedup = e.count(),
      afterNearDedup = curate(docs, idCol, textCol, cfg).count())
  }
}

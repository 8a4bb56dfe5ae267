package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Text-analysis operators for large-scale document pipelines: token
  * statistics, quality scoring, language identification, and document
  * fingerprinting. All pure column expressions (no UDFs) — they run
  * inside WholeStageCodegen and scale embarrassingly parallel: every
  * operator here is per-row, so a 100 TB corpus needs zero shuffles
  * until a later aggregation.
  */
object TextAnalysis {

  /** Whitespace tokenization of trimmed text. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  def distinctTokenCount(text: Column): Column =
    size(array_distinct(tokens(text)))

  /** Mean token length, rounded to 6 dp (per-row double division is
    * IEEE-deterministic across engines; rounding pins the printed form).
    */
  def avgTokenLen(text: Column): Column = {
    val t = tokens(text)
    round(
      aggregate(t, lit(0L), (acc, w) => acc + length(w)).cast("double") /
        size(t), 6)
  }

  /** Fraction of characters outside [a-z0-9 ] after lowercasing. */
  def punctRatio(text: Column): Column = {
    val clean = regexp_replace(lower(text), "[^a-z0-9 ]", "")
    round((length(text) - length(clean)).cast("double") / length(text), 6)
  }

  /** Fraction of tokens found in a stopword list — a standard fluency
    * proxy in corpus quality filters.
    */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val t = tokens(text)
    val sw = array(stopwords.map(lit): _*)
    round(size(filter(t, w => array_contains(sw, w))).cast("double") / size(t), 6)
  }

  /** Composite document quality score in [0,1]: length credit (saturating
    * at 100 tokens), low-punctuation credit, stopword-fluency credit.
    * The exact weights are a policy choice; determinism is the contract.
    */
  def qualityScore(text: Column, stopwords: Seq[String]): Column =
    round(
      lit(0.4) * least(lit(1.0), tokenCount(text).cast("double") / 100.0) +
        lit(0.3) * (lit(1.0) - punctRatio(text)) +
        lit(0.3) * stopwordRatio(text, stopwords), 6)

  /** Score = number of tokens that are markers for one language. */
  def langScore(text: Column, markers: Seq[String]): Column = {
    val m = array(markers.map(lit): _*)
    size(filter(tokens(text), w => array_contains(m, w)))
  }

  /** N-gram/marker-word language ID: argmax of per-language marker hits,
    * first-wins tie-break in the declared language order.
    */
  def langId(text: Column, markerSets: Seq[(String, Seq[String])]): Column = {
    val scores = markerSets.map { case (lang, ms) => lang -> langScore(text, ms) }
    val best = greatest(scores.map(_._2): _*)
    scores.foldRight(lit(markerSets.head._1)) { case ((lang, s), elseCol) =>
      when(s === best, lit(lang)).otherwise(elseCol)
    }
  }

  /** Content fingerprint: md5 of lowercased, whitespace-collapsed text.
    * Two documents differing only in case/spacing collide — the standard
    * "exact dedup after normalization" key.
    */
  def contentFingerprint(text: Column): Column =
    Hashing.fingerprint(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** BPE-ish subword segmentation: maximal runs of letters, digits, or
    * single other non-space characters (the shape of GPT-2's pre-tokenizer
    * pattern, minus the contraction cases). Kept to character classes
    * that match identically across regex engines.
    */
  def bpeTokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))

  /** Unicode script-block census classes (r11 verdict item 7): NAMED
    * closed-form codepoint ranges from the Unicode block table — the
    * cheap language/contamination triage a 100 TB text pipeline runs
    * BEFORE any model-based langID (one regex pass per class, all
    * whole-stage-codegen'd; q370 audits byte-level UTF-8
    * well-formedness, this classifies the codepoints above it).
    * Canonical order is fixed: [[scriptCounts]] emits one count per
    * entry and dominant-script ties break by this order.
    */
  val ScriptClasses: Seq[(String, String)] = Seq(
    "latin" -> "[A-Za-z]",
    "digit" -> "[0-9]",
    "cyrillic" -> "[\\u0400-\\u04FF]",
    "greek" -> "[\\u0370-\\u03FF]",
    "arabic" -> "[\\u0600-\\u06FF]",
    "hebrew" -> "[\\u0590-\\u05FF]",
    "devanagari" -> "[\\u0900-\\u097F]",
    "cjk" -> "[\\u4E00-\\u9FFF]",
    "kana" -> "[\\u3040-\\u30FF]",
    "hangul" -> "[\\uAC00-\\uD7AF]",
    // supplementary-plane pictographs: \x{...} addresses the CODEPOINT,
    // so one emoji counts once, never as two surrogate halves
    "emoji" -> "[\\x{1F000}-\\x{1FAFF}]")

  /** Per-class codepoint counts over `text`, in [[ScriptClasses]]
    * order — `n_<name>` columns via regexp_count (codegen-friendly, no
    * UDF, no per-codepoint explode).
    */
  def scriptCounts(text: Column): Seq[(String, Column)] =
    ScriptClasses.map { case (name, re) =>
      s"n_$name" -> regexp_count(text, lit(re)).cast("long")
    }

  /** The dominant script name: argmax over [[scriptCounts]], ties (and
    * all-zero rows) resolving to the FIRST class in canonical order —
    * array_position finds the first index of the max.
    */
  def dominantScript(text: Column): Column = {
    val counts = array(scriptCounts(text).map(_._2): _*)
    val names = array(ScriptClasses.map(c => lit(c._1)): _*)
    element_at(names, array_position(counts, array_max(counts)).cast("int"))
  }

  /** Order-sensitive polynomial rolling hash over the token sequence:
    * acc ← (acc·B + h(token)) mod p, folded left-to-right. Unlike the
    * set-based fingerprints, token order matters — "a b" ≠ "b a".
    * 31-bit token hashes with B=131 keep every step inside a long.
    */
  def rollingFingerprint(text: Column): Column = {
    val p = Dedup.MinhashP
    val hs = transform(tokens(text), t => Hashing.hash64(t).bitwiseAND(lit(p)))
    aggregate(hs, lit(0L), (acc, h) => (acc * 131 + h) % lit(p))
  }

  /** Corpus-wide boilerplate-line removal (the C4/RefinedWeb line
    * dedup): a line appearing in ≥ `minDocs` DISTINCT documents is
    * boilerplate (nav bars, cookie banners, footers) and is stripped
    * from every document; the cleaned text preserves the surviving
    * lines' original order. Returns (idCol, n_lines, n_boiler,
    * clean_text). Blank lines are kept verbatim and never counted —
    * they would trivially "repeat" across the corpus.
    *
    * Scale shape: ONE line-frequency aggregation whose shuffle
    * carries each distinct line once (map-side partial aggregation
    * collapses the boilerplate repeats that motivate the pass — the
    * hotter a line, the LESS it costs to count), then a join back
    * that AQE converts to broadcast when the boilerplate set is small
    * (it is, by definition: lines crossing a ≥minDocs bar). Per-doc
    * reconstruction is a single groupBy collecting (pos, line)
    * structs — order restored by array_sort, NOT by a window.
    */
  def stripBoilerplate(docs: org.apache.spark.sql.DataFrame, idCol: String,
                       textCol: String, minDocs: Long): org.apache.spark.sql.DataFrame = {
    val lines = docs.select(col(idCol),
      posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
    val boiler = lines
      .filter(length(trim(col("line"))) > 0)
      .groupBy("line")
      .agg(count_distinct(col(idCol)).as("_nd"))
      .filter(col("_nd") >= minDocs)
      .select(col("line"), lit(1).as("_boiler"))
    lines.join(boiler, Seq("line"), "left")
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_lines"),
        count(col("_boiler")).as("n_boiler"),
        array_join(
          transform(
            array_sort(collect_list(
              when(col("_boiler").isNull, struct(col("pos"), col("line"))))),
            s => s.getField("line")),
          "\n").as("clean_text"))
  }
}

package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Script-block census ([[TextAnalysis.scriptCounts]] /
  * [[TextAnalysis.dominantScript]]) — q386's operator surface: planted
  * codepoints count exactly, supplementary-plane emoji count by
  * CODEPOINT (never as two surrogate halves), ties and empty text
  * resolve to the first canonical class.
  */
class TextAnalysisSpec extends SparkSpec {

  import spark.implicits._

  private def censusOf(text: String): (Map[String, Long], String) = {
    val df = Seq(text).toDF("text")
    val row = df.select(
      TextAnalysis.scriptCounts(col("text")).map { case (n, c) => c.as(n) } :+
        TextAnalysis.dominantScript(col("text")).as("dom"): _*).collect()(0)
    val names = TextAnalysis.ScriptClasses.map(_._1)
    (names.zipWithIndex.map { case (n, i) => n -> row.getLong(i) }.toMap,
      row.getString(names.size))
  }

  test("planted codepoints count exactly; emoji counted by codepoint") {
    val (c, dom) = censusOf("ab 37 Аб 😀🌀😀 中文")
    assert(c("latin") == 2 && c("digit") == 2 && c("cyrillic") == 2)
    assert(c("emoji") == 3, s"emoji ${c("emoji")} - surrogate halves double-counted?")
    assert(c("cjk") == 2)
    assert(c("greek") == 0 && c("hangul") == 0)
    assert(dom == "emoji") // strict max at 3
  }

  test("tie and empty text resolve to the first canonical class") {
    // cjk and kana tied at 2: cjk precedes kana in canonical order
    assert(censusOf("中文 あカ")._2 == "cjk")
    // all-zero counts: everything ties at 0, first class (latin) wins
    assert(censusOf("")._2 == "latin")
    assert(censusOf("!!! ???")._2 == "latin") // punctuation is in no class
  }

  test("every ScriptClasses range is disjoint on the planted samples") {
    // each sample contributes ONLY to its own class — a census where
    // ranges overlap would double-count
    val samples = Seq("ab", "37", "Аб", "αβ", "اب", "אב", "अआ",
      "中文", "あカ", "가나", "😀🌀")
    samples.zipWithIndex.foreach { case (s, i) =>
      val (c, _) = censusOf(s)
      TextAnalysis.ScriptClasses.map(_._1).zipWithIndex.foreach { case (n, j) =>
        assert(c(n) == (if (i == j) 2L else 0L), s"sample $i vs class $n: ${c(n)}")
      }
    }
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge learning — the tokenizer-training inner
  * loop (q82 counts pairs once; this iterates count→pick→merge to an
  * ordered merge list, which IS the trained tokenizer).
  *
  * The distributed shape mirrors production trainers (HuggingFace
  * tokenizers, sentencepiece): the expensive corpus pass happens ONCE
  * — words reduce to a (word, count) relation bounded by vocabulary —
  * and every merge round then runs on that bounded relation: one pair
  * count aggregation, one single-row top-pair action (the loop scalar,
  * same discipline as pageRank's dangling mass), one map-side
  * carry-fold rewrite of the symbol arrays. 100 TB of text changes
  * only the first aggregation; the loop cost depends on vocabulary,
  * not corpus size.
  *
  * Ties on pair count break lexicographically, so the learned merge
  * list is deterministic on any partitioning.
  */
object BpeOps {

  /** Left-to-right non-overlapping merge of adjacent (a, b) into a+b,
    * as a carry-based fold over the symbol array (pure expression —
    * codegen-friendly, no UDF).
    */
  private def mergePair(syms: Column, a: String, b: String): Column = {
    val init = struct(
      array().cast("array<string>").as("acc"),
      lit(null).cast("string").as("carry"))
    aggregate(syms, init,
      (s, x) => {
        val acc = s.getField("acc"); val carry = s.getField("carry")
        when(carry.isNull,
          struct(acc.as("acc"), x.as("carry")))
          .when(carry === lit(a) && x === lit(b),
            struct(concat(acc, array(lit(a + b))).as("acc"),
              lit(null).cast("string").as("carry")))
          .otherwise(
            struct(concat(acc, array(carry)).as("acc"), x.as("carry")))
      },
      s => when(s.getField("carry").isNull, s.getField("acc"))
        .otherwise(concat(s.getField("acc"), array(s.getField("carry")))))
  }

  /** Learn `nMerges` BPE merges from whitespace-tokenized text.
    * @return the ordered merge list (a, b) — applying them in order to
    *         character-split words reproduces the trained segmentation.
    */
  def learnMerges(docs: DataFrame, textCol: String, nMerges: Int): Seq[(String, String)] = {
    require(nMerges >= 1, "nMerges must be >= 1")
    // the ONE corpus-scale pass: collapse to (symbols, count) per word
    var words = docs
      .select(explode(split(trim(col(textCol)), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .select(split(col("w"), "").as("syms"), col("cnt"))
      .localCheckpoint(false)
    val merges = scala.collection.mutable.ListBuffer.empty[(String, String)]
    var exhausted = false
    while (merges.size < nMerges && !exhausted) {
      val top = words
        .filter(size(col("syms")) >= 2)
        .select(col("cnt"), explode(expr(
          "transform(sequence(0, size(syms) - 2), i -> struct(syms[i] AS a, syms[i + 1] AS b))")).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("cnt").as("c"))
        .orderBy(desc("c"), col("a"), col("b"))
        .limit(1).collect() // one row — the loop scalar
      if (top.isEmpty) exhausted = true
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        merges += ((a, b))
        words = words
          .select(mergePair(col("syms"), a, b).as("syms"), col("cnt"))
          .localCheckpoint(false)
      }
    }
    merges.toList
  }

  /** Apply an ordered merge list to a text column (whitespace words →
    * per-word BPE segmentation), returning the token array — the
    * inference-side twin of [[learnMerges]], map-only at any scale.
    */
  def segment(text: Column, merges: Seq[(String, String)]): Column = {
    val word = flatten(transform(split(trim(text), "\\s+"), w => {
      merges.foldLeft(split(w, ""): Column) { case (syms, (a, b)) =>
        mergePair(syms, a, b)
      }
    }))
    word
  }
}

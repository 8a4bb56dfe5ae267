package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BpeOpsSpec extends SparkSpec {

  test("learnMerges reproduces the classic hand-computed BPE sequence") {
    import spark.implicits._
    // corpus: hug ×3, hugs ×1, pug ×1 (the textbook example).
    // pair counts: (u,g)=5, (h,u)=4, (g,s)=1, (p,u)=1 → merge 1 = (u,g)
    // then (h,ug)=4, (p,ug)=1, (ug,s)=1 → merge 2 = (h,ug)
    // then (hug,s)=1, (p,ug)=1 → merge 3 = (hug,s) [count tie 1-1,
    // lexicographic a: "hug" < "p"]
    val docs = Seq("hug hug hugs", "hug pug").toDF("text")
    val merges = BpeOps.learnMerges(docs, "text", 3)
    assert(merges == Seq(("u", "g"), ("h", "ug"), ("hug", "s")), merges.toString)
  }

  test("learnMerges stops when no pairs remain") {
    import spark.implicits._
    val docs = Seq("ab ab").toDF("text")
    val merges = BpeOps.learnMerges(docs, "text", 10)
    // after (a,b) every word is a single symbol — no further pairs
    assert(merges == Seq(("a", "b")), merges.toString)
  }

  test("segment applies the learned merges to new text") {
    import spark.implicits._
    val docs = Seq("hug hug hugs", "hug pug").toDF("text")
    val merges = BpeOps.learnMerges(docs, "text", 2) // (u,g), (h,ug)
    val out = Seq("hugs pug").toDF("text")
      .select(BpeOps.segment(col("text"), merges).as("toks"))
      .collect()(0).getSeq[String](0)
    assert(out == Seq("hug", "s", "p", "ug"), out.toString)
  }
}

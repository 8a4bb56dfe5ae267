package graft.expressions

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** [[Simhash]] — the compiled one-pass kernel must reproduce the
  * Column-composed formulation it replaced (per-bit `aggregate` folds
  * over a shared md5 `transform`) bit for bit, on real corpus text and
  * on the tokenizer's edge cases.
  */
class SimhashSpec extends SparkSpec {

  /** The replaced formulation, kept here as the reference. */
  private def composed(text: org.apache.spark.sql.Column, bits: Int) = {
    val toks = array_distinct(split(trim(text), "\\s+"))
    val contribs = transform(toks, w => graft.functions.Hashing.hash64(w))
    val bitCols = (0 until bits).map { b =>
      val balance = aggregate(contribs, lit(0L),
        (acc, h) => acc + (shiftright(h, b).bitwiseAND(1) * 2 - 1))
      when(balance > 0, lit(1L << b)).otherwise(lit(0L))
    }
    bitCols.reduce(_ + _)
  }

  test("kernel ≡ composed formulation on sf0.001 documents at 16 and 48 bits") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    for (bits <- Seq(16, 48)) {
      val diff = docs.select(
          call_function("graft_simhash", col("text"), lit(bits)).as("k"),
          composed(col("text"), bits).as("c"))
        .filter(col("k") =!= col("c")).count()
      assert(diff == 0L, s"bits=$bits: $diff rows diverge")
    }
  }

  test("tokenizer edge cases match: empty, spaces-only, repeated tokens, tabs") {
    import spark.implicits._
    val cases = Seq("", "   ", "a", "a a a", "  a  b\tc  ", "\ta\t", "a b")
    val out = cases.toDF("t").select(
        call_function("graft_simhash", col("t"), lit(32)).as("k"),
        composed(col("t"), 32).as("c"))
      .collect()
    out.zip(cases).foreach { case (r, s) =>
      assert(r.getLong(0) == r.getLong(1), s"case '$s': ${r.getLong(0)} vs ${r.getLong(1)}")
    }
  }

  test("bits outside [1, 60] fails at analysis time") {
    import spark.implicits._
    for (bad <- Seq(0, -1, 61, 64)) {
      val e = intercept[Exception] {
        Seq("x").toDF("t")
          .select(call_function("graft_simhash", col("t"), lit(bad))).collect()
      }
      assert(e.getMessage.contains("bits"), s"bits=$bad: ${e.getMessage}")
    }
  }

  test("hamming locality: a one-token edit moves few bits, disjoint text moves many") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val near = base.replace("today", "tonight")
    val far = "zxq wvu tsr qpo nml kji hgf edc ba9 876 543 210 zz yy"
    val Seq(hBase, hNear, hFar) = Seq(base, near, far).toDF("t")
      .select(call_function("graft_simhash", col("t"), lit(48)))
      .collect().toSeq.map(_.getLong(0))
    val dNear = java.lang.Long.bitCount(hBase ^ hNear)
    val dFar = java.lang.Long.bitCount(hBase ^ hFar)
    assert(dNear < dFar, s"near=$dNear far=$dFar")
  }
}

package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Behavioral properties of the round-3 training-corpus operators —
  * the DuckDB oracle gate proves engine-vs-engine equality; these pin
  * the semantics the oracle can't express (invariants, determinism,
  * drop-rule soundness).
  */
class TrainQueriesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q77: every scored document has negative avg log-prob and >= 1 bigram") {
    val out = TrainQueries.q77.fn(spark, sf).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Long]("n_bigrams") >= 1))
    // add-one smoothing keeps every probability < 1 → ln < 0
    assert(out.forall(_.getAs[Double]("avg_logprob") < 0.0))
  }

  test("q78: drop rule is sound — every dropped vector has a smaller kept-or-dropped cell-mate above threshold") {
    val out = TrainQueries.q78.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2)))
    val emb = graft.Tables.load(spark, sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
      }
      math.rint(d / (math.sqrt(na) * math.sqrt(nb)) * 1e6) / 1e6
    }
    val byCell = out.groupBy(_._2)
    for ((_, members) <- byCell; (vid, _, dropped) <- members if dropped) {
      val hasSmallerNeighbor = members.exists { case (o, _, _) =>
        o < vid && cos(emb(o), emb(vid)) >= 0.40
      }
      assert(hasSmallerNeighbor, s"vec $vid dropped without a qualifying smaller cell-mate")
    }
    // and at least one drop actually happens on the synthetic corpus
    assert(out.exists(_._3), "no vector dropped — threshold dead")
  }

  test("q79: shared fraction is 1 for exact-duplicate docs, bounded in [0,1] everywhere") {
    val out = TrainQueries.q79.fn(spark, sf).collect()
    assert(out.forall { r =>
      val f = r.getAs[Double]("shared_frac"); f >= 0.0 && f <= 1.0
    })
    // the synthetic corpus plants exact duplicates (q35 drops some rows):
    // an exact pair shares every 8-gram, so shared_frac = 1 rows exist
    assert(out.exists(_.getAs[Double]("shared_frac") == 1.0))
  }

  test("q80: weighted sample is deterministic across runs and partitionings") {
    val a = TrainQueries.q80.fn(spark, sf).collect().map(_.toSeq)
    val b = TrainQueries.q80.fn(spark, sf).collect().map(_.toSeq)
    assert(a.sameElements(b))
    assert(a.length == 100)
    // ES keys are sorted ascending — the selection really is the k smallest
    val keys = a.map(_(2).asInstanceOf[Double])
    assert(keys.zip(keys.tail).forall { case (x, y) => x <= y })
  }

  test("q81: surviving batch rows are absent from the store and unique by fingerprint") {
    val out = TrainQueries.q81.fn(spark, sf)
    val docs = graft.Tables.load(spark, sf, "documents")
      .withColumn("fp", graft.operators.TextAnalysis.contentFingerprint(col("text")))
    val storeFps = docs.filter(col("doc_id") % 5 =!= 0)
      .select("fp").collect().map(_.getString(0)).toSet
    val rowsOut = out.collect().map(r => (r.getLong(0), r.getString(1)))
    assert(rowsOut.nonEmpty)
    assert(rowsOut.forall { case (id, _) => id % 5 == 0 })
    assert(rowsOut.forall { case (_, fp) => !storeFps.contains(fp) })
    assert(rowsOut.map(_._2).distinct.length == rowsOut.length)
  }

  test("q82: pairs are adjacent lowercase 2-grams ranked by count") {
    val out = TrainQueries.q82.fn(spark, sf).collect()
    assert(out.length == 20)
    assert(out.forall(_.getString(0).matches("[a-z]{2}")))
    val counts = out.map(_.getLong(1))
    assert(counts.zip(counts.tail).forall { case (x, y) => x >= y })
  }
}

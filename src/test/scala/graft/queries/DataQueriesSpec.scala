package graft.queries

import graft.SparkSpec

class DataQueriesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q204: fused score is exactly the RRF of the two shortlist ranks") {
    graft.expressions.GraftExtensions.register(spark)
    val out = DataQueries.q204.fn(spark, sf).collect()
    assert(out.length == 50)
    def contrib(rank: Any): Long = rank match {
      case null => 0L
      case r: Int => math.round(1000000.0 / (60 + r))
    }
    out.foreach { row =>
      val rrf = row.getLong(row.fieldIndex("rrf_micro"))
      val expected = contrib(if (row.isNullAt(1)) null else row.getInt(1)) +
        contrib(if (row.isNullAt(2)) null else row.getInt(2))
      assert(rrf == expected, s"RRF arithmetic mismatch: $row")
      assert(!(row.isNullAt(1) && row.isNullAt(2)),
        s"doc in fusion output but on neither shortlist: $row")
    }
    // output is sorted by fused score desc, then doc_id
    val keys = out.map(r => (-r.getLong(3), r.getLong(0))).toSeq
    assert(keys == keys.sorted, "fusion output must be rank-sorted")
    // ranks within each shortlist are distinct and within bounds
    Seq(1, 2).foreach { c =>
      val ranks = out.filterNot(_.isNullAt(c)).map(_.getInt(c))
      assert(ranks.distinct.length == ranks.length)
      assert(ranks.forall(r => r >= 1 && r <= 200))
    }
  }
}

package graft.queries

import graft.SparkSpec

class ExtQueriesSpec extends SparkSpec {

  test("q160 approx-percentile conf swap stays within sketch accuracy of the exact grid") {
    val sf = "/root/testdata/sf0.001"
    val exact = ExtQueries.q160.fn(spark, sf).collect()
      .map(r => r.getAs[Int]("pct") -> (r.getDouble(1), r.getDouble(2))).toMap
    spark.conf.set("spark.graft.approxPercentile", "true")
    try {
      val approx = ExtQueries.q160.fn(spark, sf).collect()
        .map(r => r.getAs[Int]("pct") -> (r.getDouble(1), r.getDouble(2))).toMap
      assert(approx.keySet == exact.keySet && approx.size == 9)
      // accuracy 10000 on a ~1.5k-row cohort: rank error well under one
      // decile step; values must land within 2% of the exact quantile
      for ((pct, (ea, eb)) <- exact; (aa, ab) = approx(pct)) {
        assert(math.abs(aa - ea) <= 0.02 * math.abs(ea), s"pct $pct even: $aa vs $ea")
        assert(math.abs(ab - eb) <= 0.02 * math.abs(eb), s"pct $pct odd: $ab vs $eb")
      }
    } finally spark.conf.unset("spark.graft.approxPercentile")
  }
}

package graft.flu

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.sources.Fetch

/** The CI-shaped cold-start gate: raw feed snapshots → buildFromFeeds →
  * all five tables equal the goldens (byte-copies of the reference's
  * processed_files CSVs) VALUE-EXACTLY, doubles included — except
  * healthcare's three derived means, compared at 1e-12 relative
  * tolerance (SURVEY §4 gotcha 1: pandas pairwise summation vs Spark
  * sequential sum drifts the last bit of a double).
  *
  * The reference ships outputs but not its raw inputs, so the snapshots
  * under feeds_golden/ are inverted from the goldens by
  * tools/make_golden_feeds.py (census verbatim; RHINO rows re-grouped
  * to ACH level with the keep-first order reconstructed; FluView wili
  * pinned from illness.state_ili_percent with the unknown weeks solved
  * so each year's sequential sum reproduces the golden average
  * bit-exactly). What this pins is the ENGINE: every builder semantics
  * (explode fan-out, keep-first dedup, epiweek quirk, distinct-tuple
  * means, window peak/argmax) must match the reference's pandas
  * behavior or some cell diverges.
  */
class FeedGoldenSpec extends SparkSpec {

  private val feedsDir = "src/test/resources/feeds_golden"
  private val goldenDir = "src/test/resources/golden"

  test("cold start from raw feeds rebuilds all five golden tables value-exactly") {
    def snap(name: String) = new String(
      Files.readAllBytes(Paths.get(s"$feedsDir/$name")), StandardCharsets.UTF_8)
    val transport = Fetch.snapshots(Map(
      FluFeeds.rhinoUrl -> snap("rhino.csv"),
      FluFeeds.censusUrl -> snap("census.csv"),
      Fetch.withQuery(FluFeeds.fluviewUrl, FluFeeds.fluviewParams)
        -> snap("fluview.json")))
    val built = FluFeeds.buildFromFeeds(spark, transport)

    val goldens = Seq(
      "county_region" -> ("county_region", FluSchemas.countyRegion),
      "temporal" -> ("temporal", FluSchemas.temporal),
      "illness" -> ("illness", FluSchemas.illness),
      "healthcare" -> ("healthcare", FluSchemas.healthcare),
      "historics" -> ("historic_flu", FluSchemas.historics))

    for ((table, (file, schema)) <- goldens) {
      val expected = spark.read.option("header", "true").schema(schema)
        .csv(s"$goldenDir/$file.csv")
      // order-insensitive. Non-double fields are compared via String.valueOf
      // (injective, so any drift fails). Doubles are value-EXACT except in
      // healthcare, whose means-over-distinct-tuples legitimately differ
      // from pandas' pairwise summation in the last bit — those compare at
      // 1e-12 relative tolerance (SURVEY §4 gotcha 1).
      val relTol = if (table == "healthcare") 1e-12 else 0.0
      def canon(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
        df.collect().toSeq.map(_.toSeq)
          .sortBy(_.map(String.valueOf).mkString("\u0000"))
      def same(x: Any, y: Any): Boolean = (x, y) match {
        case (a: Double, b: Double) =>
          java.lang.Double.compare(a, b) == 0 ||
            math.abs(a - b) <= relTol * math.max(math.abs(a), math.abs(b))
        case _ => String.valueOf(x) == String.valueOf(y)
      }
      val (a, e) = (canon(built(table)), canon(expected))
      assert(a.length == e.length, s"$table: ${a.length} rows vs golden ${e.length}")
      a.zip(e).zipWithIndex.foreach { case ((x, y), i) =>
        assert(x.length == y.length && x.zip(y).forall((same _).tupled),
          s"$table row $i:\n built=${x.mkString(",")}\ngolden=${y.mkString(",")}")
      }
    }
  }
}

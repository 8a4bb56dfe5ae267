package graft.flu

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.sources.Fetch

/** The CI-shaped cold-start gate: raw feed snapshots → buildFromFeeds →
  * all five tables equal the goldens (byte-copies of the reference's
  * processed_files/*.csv) VALUE-EXACTLY, doubles included.
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
      // order-insensitive, value-EXACT: String.valueOf is injective on
      // doubles (Double.toString uniquely distinguishes adjacent
      // values), so a one-ulp drift anywhere fails the compare
      def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
        df.collect().toSeq
          .map(_.toSeq.map(String.valueOf).mkString("\u0000")).sorted
      val (a, e) = (canon(built(table)), canon(expected))
      assert(a.length == e.length, s"$table: ${a.length} rows vs golden ${e.length}")
      a.zip(e).zipWithIndex.foreach { case ((x, y), i) =>
        assert(x == y, s"$table row $i:\n built=$x\ngolden=$y")
      }
    }
  }
}

package graft.flu

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.StructType

import graft.SparkSpec

/** The three serving-layer report SQLs run over the reference's own
  * committed outputs (golden copies of the processed_files CSVs) and
  * compared against expected results precomputed with DuckDB on the
  * same CSVs (src/test/resources/expected). This is the API-parity
  * gate: identical SQL, identical inputs, row-identical answers.
  */
class GoldenReportsSpec extends SparkSpec {

  private val goldenDir = "src/test/resources/golden"
  private val expectedDir = "src/test/resources/expected"

  private def readCsv(path: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  private lazy val registered: Unit = FluReports.registerViews(Map(
    "county_region" -> readCsv(s"$goldenDir/county_region.csv", FluSchemas.countyRegion),
    "temporal" -> readCsv(s"$goldenDir/temporal.csv", FluSchemas.temporal),
    "illness" -> readCsv(s"$goldenDir/illness.csv", FluSchemas.illness),
    "healthcare" -> readCsv(s"$goldenDir/healthcare.csv", FluSchemas.healthcare),
    "historics" -> readCsv(s"$goldenDir/historic_flu.csv", FluSchemas.historics)))

  test("weekly-trends report matches the DuckDB result on golden tables") {
    registered
    val df = FluReports.weeklyTrends(spark)
    // compare doubles with tolerance: collect typed, not stringly
    val expected = spark.read.option("header", "true").schema(df.schema)
      .csv(s"$expectedDir/weekly_trends.csv")
    assertRowsEqual(rows(df.withColumn("week_end", df("week_end").cast("string"))),
      rows(expected.withColumn("week_end", expected("week_end").cast("string"))))
  }

  test("healthcare-impact report matches") {
    registered
    val df = FluReports.healthcareImpact(spark)
    val expected = spark.read.option("header", "true").schema(df.schema)
      .csv(s"$expectedDir/healthcare_impact.csv")
    assertRowsEqual(rows(df), rows(expected))
  }

  test("historical-summary report matches") {
    registered
    val df = FluReports.historicalSummary(spark)
    val expected = spark.read.option("header", "true").schema(df.schema)
      .csv(s"$expectedDir/historical_summary.csv")
    assertRowsEqual(rows(df), rows(expected))
  }

  test("presentation formatting matches the Flask layer's f-strings") {
    registered
    val formatted = FluReports.formatHistoricalSummary(FluReports.historicalSummary(spark))
    val first = formatted.collect().head
    assert(first.getAs[String]("peak_ili_percent").matches("""\d+\.\d{2}%"""))
  }

  test("export allowlist guards invalid tables") {
    registered
    assert(FluReports.exportTable(spark, "illness").count() <= 1000)
    intercept[IllegalArgumentException] {
      FluReports.exportTable(spark, "illness; DROP TABLE x")
    }
  }
}

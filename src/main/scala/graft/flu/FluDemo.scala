package graft.flu

import org.apache.spark.sql.SparkSession

/** Usage demo / smoke main: load the five star-schema tables from CSV,
  * register views, run the three canned reports plus an export.
  *
  *   sbt "runMain graft.flu.FluDemo src/test/resources/golden"
  */
object FluDemo {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("src/test/resources/golden")
    val spark = graft.GraftSession.create(master = "local[4]", shufflePartitions = 4)
    def csv(name: String, schema: org.apache.spark.sql.types.StructType) =
      spark.read.option("header", "true").schema(schema).csv(s"$dir/$name.csv")
    FluReports.registerViews(Map(
      "county_region" -> csv("county_region", FluSchemas.countyRegion),
      "temporal" -> csv("temporal", FluSchemas.temporal),
      "illness" -> csv("illness", FluSchemas.illness),
      "healthcare" -> csv("healthcare", FluSchemas.healthcare),
      "historics" -> csv("historic_flu", FluSchemas.historics)))
    println("== weekly-trends ==")
    FluReports.formatWeeklyTrends(FluReports.weeklyTrends(spark)).show(20, truncate = false)
    println("== healthcare-impact ==")
    FluReports.formatHealthcareImpact(FluReports.healthcareImpact(spark)).show(false)
    println("== historical-summary ==")
    FluReports.formatHistoricalSummary(FluReports.historicalSummary(spark)).show(false)
    println(s"== export illness rows: ${FluReports.exportTable(spark, "illness").count()}")
    spark.stop()
  }
}

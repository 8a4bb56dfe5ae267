package graft.flu

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** End-to-end star-schema build on a hand-computed fixture that
  * exercises every semantic corner SURVEY §7.4 flags: multi-ACH
  * counties (string-set agg), unmapped counties (Unassigned),
  * Statewide/Unassigned filtering, keep-first dedup across the
  * demographic fan-out, the epiweek year-boundary quirk, null
  * percent cleaning, the healthcare pivot chain, and the historics
  * argmax with a tie.
  */
class FluPipelineSpec extends SparkSpec {

  import spark.implicits._

  // (order, Location, Week Start, Week End, Week, Season, RIC, Care, Demo, pct)
  private lazy val rawRhino: DataFrame = Seq(
    (1L, "Statewide", "2023-12-31", "2024-01-06", 1, "2023-24", "Flu", "Hospitalizations", "Overall", "9.9"),
    (2L, "Unassigned ACH Region", "2023-12-31", "2024-01-06", 1, "2023-24", "Flu", "Hospitalizations", "Overall", "9.9"),
    (3L, "Healthier Here", "2023-12-31", "2024-01-06", 1, "2023-24", "Flu", "Hospitalizations", "Overall", "5.0"),
    (4L, "Healthier Here", "2023-12-31", "2024-01-06", 1, "2023-24", "Flu", "Hospitalizations", "Age 0-4", "7.5"),
    (5L, "Healthier Here", "2023-12-31", "2024-01-06", 1, "2023-24", "Flu", "Emergency Visits", "Overall", "2.5"),
    (6L, "Greater Health Now", "2023-12-31", "2024-01-06", 1, "2023-24", "Flu", "Hospitalizations", "Overall", "2.0"),
    (7L, "Better Health Together", "2023-12-31", "2024-01-06", 1, "2023-24", "Flu", "Hospitalizations", "Overall", "4.0"),
    (8L, "Healthier Here", "2024-12-29", "2025-01-04", 53, "2024-25", "COVID-19", "Emergency Visits", "Overall", "N/A"))
    .toDF("_ord", "Location", "Week Start", "Week End", "Week", "Season",
      "Respiratory Illness Category", "Care Type", "Demographic Category", "1-Week Percent ")

  private lazy val census: DataFrame = Seq(
    ("Adams", 10.5), ("Ferry", 3.2), ("King", 1000.0),
    ("Pend Oreille", 5.5), ("Spokane", 120.0), ("Stevens", 8.8))
    .toDF("County Name", "Population Density 2020")

  private lazy val fluview: DataFrame = Seq(
    (202301, 1.5), (202302, 3.0), (202303, 3.0), (202401, 2.5), (202553, 1.0))
    .toDF("epiweek", "wili")

  private lazy val tables: Map[String, DataFrame] =
    FluOps.buildAll(rawRhino, census, fluview, "_ord")

  test("county_region: dense id by name, multi-ACH string agg, Unassigned") {
    assertRowsEqual(rows(tables("county_region").orderBy("county_id")), Seq(
      Seq(1, "Adams", "Unassigned", 10.5),
      Seq(2, "Ferry", "Better Health Together", 3.2),
      Seq(3, "King", "Healthier Here", 1000.0),
      Seq(4, "Pend Oreille", "Better Health Together", 5.5),
      Seq(5, "Spokane", "Better Health Together, Greater Health Now", 120.0),
      Seq(6, "Stevens", "Better Health Together", 8.8)))
  }

  test("temporal: epiweek id incl. year-boundary quirk (week ending Jan 4 2025 → 202553)") {
    assertRowsEqual(rows(tables("temporal").orderBy("epiweek_id")
        .select(col("epiweek_id"), col("week_start").cast("string"),
          col("week_end").cast("string"), col("season"))), Seq(
      Seq(202401, "2023-12-31", "2024-01-06", "2023-24"),
      Seq(202553, "2024-12-29", "2025-01-04", "2024-25")))
  }

  test("illness: explode fan-out, keep-first dedup, state join, deviation") {
    assertRowsEqual(rows(tables("illness")
        .orderBy("epiweek_id", "county_id", "respiratory_illness_type", "care_type")), Seq(
      Seq(202401, 2, "Flu", "Hospitalizations", 4.0, 2.5, 1.5),
      Seq(202401, 3, "Flu", "Emergency Visits", 2.5, 2.5, 0.0),
      Seq(202401, 3, "Flu", "Hospitalizations", 5.0, 2.5, 2.5), // first-in-order wins over 7.5
      Seq(202401, 4, "Flu", "Hospitalizations", 4.0, 2.5, 1.5),
      Seq(202401, 5, "Flu", "Hospitalizations", 2.0, 2.5, -0.5), // row 6 wins over row 7's Spokane
      Seq(202401, 6, "Flu", "Hospitalizations", 4.0, 2.5, 1.5),
      Seq(202553, 3, "COVID-19", "Emergency Visits", null, 1.0, null)))
  }

  test("healthcare: distinct-tuple mean, first-non-null pivot, ratio, fill-0") {
    assertRowsEqual(rows(tables("healthcare").orderBy("county_id")), Seq(
      Seq(1, 10.5, 0.0, 0.0, 0.0),               // no rhino data at all
      Seq(2, 3.2, 4.0, 0.0, 0.0),                // no ER data → ratio null → 0
      Seq(3, 1000.0, 6.25, 2.5, 2.5),            // mean(5.0,7.5); 6.25/2.5
      Seq(4, 5.5, 4.0, 0.0, 0.0),
      Seq(5, 120.0, 3.0, 0.0, 0.0),              // mean over distinct (2.0,4.0)
      Seq(6, 8.8, 4.0, 0.0, 0.0)))
  }

  test("historics: per-year peak/argmax(min-tie-break)/mean") {
    assertRowsEqual(rows(tables("historics").orderBy("year")), Seq(
      Seq(2023, 2020, 202302, 3.0, 2.5, 0.5),    // tie at 3.0 → smaller epiweek
      Seq(2024, 2020, 202401, 2.5, 2.5, 0.0),
      Seq(2025, 2020, 202553, 1.0, 1.0, 0.0)))
  }

  test("constraint suite: PKs, FKs hold on the fixture build") {
    val violations = FluOps.constraintViolations(tables)
    assert(violations.values.forall(_ == 0L), s"violations: $violations")
  }
}

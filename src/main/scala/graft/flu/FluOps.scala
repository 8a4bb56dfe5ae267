package graft.flu

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.ScalarFunctions.cleanPercentage
import graft.operators.Relational._

/** The flu-surveillance star-schema build, re-expressed Spark-first.
  *
  * Each builder is a pure DataFrame → DataFrame function mirroring one
  * table of the reference ETL (dags/flu_data_airflow_v2.py:319-459).
  * Dimension lookups broadcast; the only shuffles are the group-bys that
  * the semantics require. Lazy composition means Catalyst sees the whole
  * lineage (the reference materializes every intermediate eagerly).
  */
object FluOps {

  /** ACH → member counties (reference: dags/flu_data_airflow_v2.py:49-59).
    * Kept as data, not a Map literal in an expression, so the lookup is a
    * broadcast join Catalyst can reason about.
    */
  val achToCounties: Seq[(String, Seq[String])] = Seq(
    "Better Health Together" -> Seq("Spokane", "Stevens", "Pend Oreille", "Ferry"),
    "Cascade Pacific Action Alliance" -> Seq("Thurston", "Mason", "Grays Harbor", "Pacific", "Lewis"),
    "Elevate Health" -> Seq("Yakima", "Kittitas"),
    "Greater Health Now" -> Seq("Spokane"),
    "Healthier Here" -> Seq("King"),
    "North Sound" -> Seq("Whatcom", "Skagit", "Snohomish", "San Juan", "Island"),
    "Olympic Community of Health" -> Seq("Clallam", "Jefferson", "Kitsap"),
    "Southwest Washington" -> Seq("Clark", "Skamania", "Klickitat", "Cowlitz", "Wahkiakum"),
    "Thriving Together NCW" -> Seq("Chelan", "Douglas", "Grant", "Okanogan"))

  /** The official 39-county list used for validation (reference :62-69). */
  val waCounties: Seq[String] = Seq(
    "Adams", "Asotin", "Benton", "Chelan", "Clallam", "Clark", "Columbia", "Cowlitz",
    "Douglas", "Ferry", "Franklin", "Garfield", "Grant", "Grays Harbor", "Island",
    "Jefferson", "King", "Kitsap", "Kittitas", "Klickitat", "Lewis", "Lincoln",
    "Mason", "Okanogan", "Pacific", "Pend Oreille", "Pierce", "San Juan", "Skagit",
    "Skamania", "Snohomish", "Spokane", "Stevens", "Thurston", "Wahkiakum",
    "Walla Walla", "Whatcom", "Whitman", "Yakima")

  /** (Location, county) pairs for the explode join. */
  def achMapping(spark: SparkSession): DataFrame = {
    import spark.implicits._
    achToCounties.flatMap { case (ach, cs) => cs.map(ach -> _) }
      .toDF("Location", "county")
  }

  /** Statewide/Unassigned filter + ACH→county explosion + percent
    * cleaning (reference :101-154). A LEFT broadcast join reproduces the
    * pandas map-then-explode exactly: unmapped Locations keep one row
    * with a null county.
    */
  def explodeRhino(raw: DataFrame): DataFrame = {
    val mapping = achMapping(raw.sparkSession)
    raw
      .filter(!col("Location").isin("Statewide", "Unassigned ACH Region"))
      .join(broadcast(mapping), Seq("Location"), "left")
      .withColumn("1-Week Percent_cleaned", cleanPercentage(col("1-Week Percent ")))
  }

  /** epiweek_id = year-from-week_end-string ++ zero-padded raw Week
    * column (reference :350 — the year-boundary quirk is the point:
    * a week ending Jan 3 gets the new year with the old week number).
    */
  def withEpiweekId(rhinoExploded: DataFrame): DataFrame =
    rhinoExploded.withColumn("epiweek_id",
      concat(substring(col("Week End"), 1, 4),
        lpad(col("Week").cast("string"), 2, "0")))

  /** Table 1 — county_region (reference :326-345): distinct census
    * pairs ⟕ distinct (county, Location), sorted-distinct comma-join of
    * ACH names per county, blank → 'Unassigned', dense county_id by
    * name order.
    */
  def buildCountyRegion(census: DataFrame, rhinoExploded: DataFrame): DataFrame = {
    val base = census.select("County Name", "Population Density 2020").distinct()
    val locs = rhinoExploded.select("county", "Location").distinct()
    val agged = base
      .join(broadcast(locs), base("County Name") === locs("county"), "left")
      .groupBy("County Name", "Population Density 2020")
      .agg(stringSetAgg(col("Location")).as("ach_region"))
      .withColumn("ach_region", blankTo(col("ach_region"), "Unassigned"))
    denseIdBy(agged, "county_id", col("County Name").asc)
      .select(
        col("county_id"),
        col("County Name").as("county_name"),
        col("ach_region"),
        col("Population Density 2020").as("population_density_2020"))
  }

  /** Table 2 — temporal (reference :348-361). */
  def buildTemporal(rhinoWithEpiweek: DataFrame): DataFrame =
    rhinoWithEpiweek
      .select("epiweek_id", "Week Start", "Week End", "Season")
      .distinct()
      .select(
        col("epiweek_id").cast("int"),
        to_date(col("Week Start")).as("week_start"),
        to_date(col("Week End")).as("week_end"),
        col("Season").as("season"))
      .orderBy("epiweek_id")

  /** Table 3 — illness (reference :365-387). `orderCol` carries the raw
    * input order so the keep-first dedup (:376) is reproducible — at
    * scale, zipWithIndexOrdered or a file+row-position column provides
    * it; pandas got it implicitly from single-process file order.
    */
  def buildIllness(rhinoWithEpiweek: DataFrame, countyRegion: DataFrame,
                   fluview: DataFrame, orderCol: String): DataFrame = {
    val base = rhinoWithEpiweek.select(
      col("epiweek_id").cast("int"),
      col("county"),
      col("Respiratory Illness Category"),
      col("Care Type"),
      col("1-Week Percent_cleaned"),
      col(orderCol))
    val withCounty = base
      .join(broadcast(countyRegion.select("county_id", "county_name")),
        base("county") === col("county_name"), "left")
      .drop("county", "county_name")
    val withState = withCounty
      .join(broadcast(fluview.select("epiweek", "wili")),
        col("epiweek_id") === col("epiweek"), "left")
      .withColumnRenamed("wili", "state_ili_percent")
      .drop("epiweek")
    dedupKeepFirst(withState,
        Seq("epiweek_id", "county_id", "Respiratory Illness Category", "Care Type"),
        Seq(col(orderCol).asc))
      .withColumn("deviation_from_state_average",
        col("1-Week Percent_cleaned") - col("state_ili_percent"))
      .select(
        col("epiweek_id"), col("county_id"),
        col("Respiratory Illness Category").as("respiratory_illness_type"),
        col("Care Type").as("care_type"),
        col("1-Week Percent_cleaned").as("county_ili_percent"),
        col("state_ili_percent"), col("deviation_from_state_average"))
  }

  /** Table 4 — healthcare (reference :391-415): per-(county, care-type)
    * mean over *distinct* (county, illness, care, pct) tuples, manual
    * pivot via first-non-null, ratio, then fill-0. The window mean runs
    * over the deduped join output exactly as pandas transform('mean')
    * did; nulls are skipped by avg just as NaN is by pandas.
    */
  def buildHealthcare(countyRegion: DataFrame, rhinoExploded: DataFrame): DataFrame = {
    val base = countyRegion.select("county_id", "county_name", "population_density_2020")
    val rhino4 = rhinoExploded
      .select("county", "Respiratory Illness Category", "Care Type", "1-Week Percent_cleaned")
      .distinct()
    val w = Window.partitionBy("county_id", "Care Type")
    base
      .join(rhino4, base("county_name") === rhino4("county"), "left")
      .withColumn("rates", avg(col("1-Week Percent_cleaned")).over(w))
      .select("county_id", "population_density_2020", "Care Type", "rates")
      .distinct()
      .withColumn("hospitalization_percent",
        when(col("Care Type") === "Hospitalizations", col("rates")))
      .withColumn("er_visit_percent",
        when(col("Care Type") === "Emergency Visits", col("rates")))
      .groupBy("county_id", "population_density_2020")
      .agg(
        first(col("hospitalization_percent"), ignoreNulls = true).as("hospitalization_percent"),
        first(col("er_visit_percent"), ignoreNulls = true).as("er_visit_percent"))
      // Documented deviation (like the historics tie-break note): when
      // er_visit_percent is exactly 0.0 the reference's pandas division
      // (reference :412) yields inf, which its fillna(0) keeps; Spark's
      // double division-by-zero yields null, which na.fill turns into
      // 0.0. A 0-rate denominator means "no ER signal at all", so 0 is
      // the saner ratio than inf; golden data has no such rows.
      .withColumn("hospital_to_er_ratio",
        col("hospitalization_percent") / col("er_visit_percent"))
      .na.fill(0.0)
      .orderBy("county_id")
  }

  /** Table 5 — historics (reference :420-437): per-year peak, peak
    * week, mean, and peak-vs-mean gap. The reference's positional
    * idxmax tie-break becomes "smallest epiweek among the peaks"
    * (deterministic under any partitioning; golden data has no ties).
    */
  def buildHistorics(fluview: DataFrame): DataFrame = {
    val w = Window.partitionBy("year")
    fluview.select("epiweek", "wili")
      .withColumn("year", substring(col("epiweek").cast("string"), 1, 4).cast("int"))
      .withColumn("decade_year", (floor(col("year") / 10) * 10).cast("int"))
      .withColumn("peak_ili_percent", max(col("wili")).over(w))
      .withColumn("peak_week_id",
        min(when(col("wili") === col("peak_ili_percent"), col("epiweek"))).over(w))
      .withColumn("average_wili_percent", avg(col("wili")).over(w))
      .withColumn("peak_vs_avg_diff",
        col("peak_ili_percent") - col("average_wili_percent"))
      .select("year", "decade_year", "peak_week_id", "peak_ili_percent",
        "average_wili_percent", "peak_vs_avg_diff")
      .distinct()
      .orderBy("year")
  }

  /** Full pipeline: raw feeds → the five tables (reference task graph
    * :749-764, collapsed into one lazy Catalyst lineage).
    */
  def buildAll(rawRhino: DataFrame, census: DataFrame, fluview: DataFrame,
               orderCol: String): Map[String, DataFrame] = {
    val exploded = withEpiweekId(explodeRhino(rawRhino))
    val countyRegion = buildCountyRegion(census, exploded)
    Map(
      "county_region" -> countyRegion,
      "temporal" -> buildTemporal(exploded),
      "illness" -> buildIllness(exploded, countyRegion, fluview, orderCol),
      "healthcare" -> buildHealthcare(countyRegion, exploded),
      "historics" -> buildHistorics(fluview))
  }

  /** PK / FK / domain assertions standing in for the Postgres
    * constraints (reference DDL :486-546) — Spark doesn't enforce
    * constraints, so violations are surfaced as counts.
    */
  def constraintViolations(tables: Map[String, DataFrame]): Map[String, Long] = {
    def dupes(df: DataFrame, keys: String*): Long =
      df.groupBy(keys.map(col): _*).count().filter(col("count") > 1).count()
    val cr = tables("county_region")
    val il = tables("illness")
    Map(
      "county_region.pk" -> dupes(cr, "county_id"),
      "temporal.pk" -> dupes(tables("temporal"), "epiweek_id"),
      "illness.pk" -> dupes(il, "epiweek_id", "county_id",
        "respiratory_illness_type", "care_type"),
      "healthcare.pk" -> dupes(tables("healthcare"), "county_id"),
      "historics.pk" -> dupes(tables("historics"), "year"),
      "illness.fk_county" -> il.join(cr, Seq("county_id"), "left_anti").count())
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Scalar building blocks, all composed from built-in codegen'd
  * expressions (no UDFs) so they stay inside WholeStageCodegen.
  */
object ScalarFunctions {

  /** Percentage-string cleaner (reference X3:
    * dags/flu_data_airflow_v2.py:142-154): blank/whitespace-only → NULL,
    * unparseable → NULL, else DOUBLE. `try_cast` keeps ANSI mode on for
    * the rest of the pipeline while matching the reference's lenient
    * parse.
    */
  def cleanPercentage(c: Column): Column =
    when(trim(c) === "", lit(null)).otherwise(c.try_cast("double"))

  /** Epiweek id YYYYWW as INT, built the way the reference builds it
    * (dags/flu_data_airflow_v2.py:350): calendar year taken from the
    * date *string*, ISO week number zero-padded — including the
    * year-boundary quirk (a week ending Jan 3 gets the new year + old
    * week number). Replicated, not "fixed".
    */
  def epiweekId(dateCol: Column): Column =
    concat(
      substring(dateCol.cast("string"), 1, 4),
      lpad(weekofyear(dateCol).cast("string"), 2, "0")
    ).cast("int")

  /** Floor-to-decade (reference X8: dags/flu_data_airflow_v2.py:424). */
  def floorDecade(yearCol: Column): Column =
    (floor(yearCol / 10) * 10).cast("int")

  /** Exact-sum of a double column: cast to DECIMAL(28,6) first so the
    * aggregation is order-independent (double summation is not
    * associative; partition order would otherwise leak into results),
    * then back to DOUBLE. Used wherever results must be reproducible
    * across partitionings/cluster sizes.
    */
  def dsum(c: Column): Column =
    sum(c.cast(DecimalType(28, 6))).cast("double")

  /** Order-independent mean of a double column (see dsum). Null-skipping
    * like SQL AVG / pandas mean.
    */
  def davg(c: Column): Column = dsum(c) / count(c)
}

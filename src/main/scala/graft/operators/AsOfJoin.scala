package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — each left row picks the latest right row with
  * the same key and right-ts ≤ left-ts (the time-series point-in-time
  * lookup Spark has no built-in operator for).
  *
  * Implemented as union + running `last(ignoreNulls)` window rather
  * than a range join: both sides shuffle ONCE on the key and sort
  * within partitions, so cost is one exchange + sort regardless of how
  * many left rows share a key — a range join (`l.ts >= r.ts` predicate)
  * degrades to per-key all-pairs, which is the quadratic shape this
  * engine bans. State per partition during the scan is one payload
  * struct — at 100 TB the operator is exactly as scalable as any
  * windowed aggregation.
  *
  * Determinism: right rows at the SAME (key, ts) are tie-broken by the
  * largest payload struct (field-lexicographic); callers wanting a
  * specific winner should pre-dedup the right side (see q54, which
  * keeps the max event id per (key, ts)).
  */
object AsOfJoin {

  /** @param left     probe side; all its columns pass through
    * @param right    build side; key columns + `rightTs` + payload
    * @param keys     equality key columns (present on both sides)
    * @param leftTs   left timestamp column name
    * @param rightTs  right timestamp column name (also emitted as part
    *                 of the matched payload)
    * @return left columns + right payload columns (null when no right
    *         row precedes the left row). Payload names must not collide
    *         with left column names — rename on the right side first.
    */
  def asofBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTs: String, rightTs: String): DataFrame = {
    val payloadCols = right.columns.toSeq.filterNot(keys.contains)
    val collisions = payloadCols.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty,
      s"right payload columns collide with left: $collisions — rename them first")
    val r = right.select(
      keys.map(col) ++ Seq(
        col(rightTs).as("_t"),
        struct(payloadCols.map(col): _*).as("_pay"),
        lit(1).as("_isr")): _*)
    val l = left
      .withColumn("_t", col(leftTs))
      .withColumn("_isr", lit(0))
    // right rows sort before left rows at equal ts (_isr desc) so a
    // same-instant right row is visible to the left row (ts >= match)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t").asc, col("_isr").desc, col("_pay").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn("_m", last(col("_pay"), ignoreNulls = true).over(w))
      .filter(col("_isr") === 0)
      .select(left.columns.toSeq.map(col) ++
        payloadCols.map(c => col(s"_m.$c").as(c)): _*)
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Scale mechanics that only matter beyond a single box: skew-salted
  * joins and bucketed co-located joins. Correctness-neutral (results
  * equal the plain operation — specs assert it); the point is the
  * shuffle shape.
  */
object ScaleOps {

  /** Equi-join where `big`'s key distribution is skewed: append a
    * deterministic salt (hash of the whole row, mod `salts`) to the big
    * side and explode the small side across all salt values. Hot keys
    * spread over `salts` reducers instead of one straggler. AQE's
    * skew-join split handles moderate skew automatically; salting is
    * the explicit fix when one key dwarfs a partition.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 salts: Int, joinType: String = "inner"): DataFrame = {
    // right/full outer would emit each unmatched small row once per
    // salt value (the small side is exploded across all salts), so only
    // the join types where salting is correctness-neutral are allowed
    require(Set("inner", "left", "leftouter", "leftsemi", "semi", "leftanti", "anti")
        .contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin supports inner/left/left_semi/left_anti, not $joinType")
    val bigS = big.withColumn("_salt",
      pmod(xxhash64(big.columns.toIndexedSeq.map(col): _*), lit(salts)).cast("int"))
    val smallS = small.withColumn("_salt",
      explode(array((0 until salts).map(lit): _*)))
    bigS.join(smallS, keys :+ "_salt", joinType).drop("_salt")
  }

  /** Write a table bucketed (and sorted) by join keys. Subsequent joins
    * between tables bucketed the same way need no shuffle — the
    * pre-partitioning replaces the exchange (asserted in ScaleOpsSpec).
    */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
                    numBuckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(table)
}

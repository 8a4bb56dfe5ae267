package graft

import org.apache.spark.sql.SparkSession

/** Session factory with scale-aware defaults.
  *
  * The engine targets multi-executor clusters; tests run `local[N]`.
  * Defaults chosen for 100 TB readiness:
  *  - AQE on (runtime re-plan, skew-join splitting, partition coalescing)
  *  - shuffle partitions sized to cores locally (clusters override via
  *    `spark.sql.adaptive.coalescePartitions` + explicit conf)
  *  - UTC session timezone so date/time semantics are deployment-invariant
  */
object GraftSession {

  /** Build or reuse a session. `master` defaults to the env/driver-provided
    * setting; callers inside Verify/Bench pass their own.
    */
  def create(master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]",
             shufflePartitions: Int = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt,
             appName: String = "graft"): SparkSession = {
    val spark = SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.extensions", "graft.expressions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      // ObjectHashAggregate falls back to SORT-BASED aggregation after
      // 128 distinct keys per task (the Spark default) - pathological for
      // this engine, whose collect_list/collect_set/top-k aggregates
      // routinely see 10^4-10^5 bounded-size groups per task. 2^17
      // entries of bounded per-group state (<= a few hundred bytes each)
      // is tens of MB per task at ANY scale factor or cluster size; the
      // fallback still protects truly unbounded group counts.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "131072")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}

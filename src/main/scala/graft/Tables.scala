package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Schema-pinned loaders for the synthetic star schema (TESTDATA.md).
  *
  * Schemas are declared explicitly rather than inferred — the reference
  * pins types via DDL after eager inference
  * (reference: dags/flu_data_airflow_v2.py:486-546); we pin them at the
  * scan so Catalyst can prune columns and push filters into the parquet
  * reader with exact types from the first plan.
  */
object Tables {

  val lineitem: StructType = StructType(Seq(
    StructField("l_orderkey", LongType),
    StructField("l_partkey", LongType),
    StructField("l_suppkey", LongType),
    StructField("l_linenumber", IntegerType),
    StructField("l_quantity", DoubleType),
    StructField("l_extendedprice", DoubleType),
    StructField("l_discount", DoubleType),
    StructField("l_tax", DoubleType),
    StructField("l_returnflag", StringType),
    StructField("l_linestatus", StringType),
    StructField("l_shipdate", TimestampType)))

  val orders: StructType = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampType),
    StructField("o_orderpriority", StringType)))

  val customer: StructType = StructType(Seq(
    StructField("c_custkey", LongType),
    StructField("c_name", StringType),
    StructField("c_nationkey", IntegerType),
    StructField("c_acctbal", DoubleType),
    StructField("c_mktsegment", StringType)))

  val supplier: StructType = StructType(Seq(
    StructField("s_suppkey", LongType),
    StructField("s_name", StringType),
    StructField("s_nationkey", IntegerType),
    StructField("s_acctbal", DoubleType)))

  val part: StructType = StructType(Seq(
    StructField("p_partkey", LongType),
    StructField("p_name", StringType),
    StructField("p_brand", StringType),
    StructField("p_type", StringType),
    StructField("p_size", IntegerType),
    StructField("p_retailprice", DoubleType)))

  val nation: StructType = StructType(Seq(
    StructField("n_nationkey", IntegerType),
    StructField("n_name", StringType),
    StructField("n_regionkey", IntegerType)))

  val region: StructType = StructType(Seq(
    StructField("r_regionkey", IntegerType),
    StructField("r_name", StringType)))

  // ts is parquet timestamp[us] in current driver data — Spark reads the
  // logical type natively. Earlier generations wrote raw INT64 nanos (no
  // logical annotation), which Spark infers as LongType; load() sniffs
  // the footer and converts only in that legacy case.
  val events: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Legacy events layout: ts as unannotated INT64 epoch-nanos. */
  val eventsRawNs: StructType = StructType(
    events.fields.map(f => if (f.name == "ts") f.copy(dataType = LongType) else f))

  val documents: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  val embeddings: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  private val schemas: Map[String, StructType] = Map(
    "lineitem" -> lineitem, "orders" -> orders, "customer" -> customer,
    "supplier" -> supplier, "part" -> part, "nation" -> nation,
    "region" -> region, "events" -> events, "documents" -> documents,
    "embeddings" -> embeddings)

  /** All table names in the sf directories. */
  def names: Seq[String] = schemas.keys.toSeq.sorted

  /** Load one table from an sf directory with its pinned schema. */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    if (name == "events") {
      // Footer sniff (one metadata read, cached per path). Three
      // encodings have shipped in driver testdata:
      //   timestamp[us, tz=UTC]  → inferred TimestampType: read natively;
      //   timestamp[us] (no tz)  → inferred TimestampNTZType: pin NTZ and
      //     cast (all graft sessions pin spark.sql.session.timeZone=UTC,
      //     so the cast is value-identical to DuckDB's epoch_us view);
      //   unannotated INT64 ns   → inferred LongType: div-1000 to micros.
      // Pinning the wrong one silently warps epochs 1000x (round-6 bug),
      // so decide per-footer and let the Canary catch anything new.
      val inferred = tsInferred.computeIfAbsent(path, p =>
        spark.read.parquet(p).schema("ts").dataType)
      inferred match {
        case TimestampType => spark.read.schema(events).parquet(path)
        case TimestampNTZType =>
          val ntz = StructType(events.fields.map(f =>
            if (f.name == "ts") f.copy(dataType = TimestampNTZType) else f))
          spark.read.schema(ntz).parquet(path)
            .withColumn("ts", org.apache.spark.sql.functions.col("ts").cast(TimestampType))
        case _ =>
          spark.read.schema(eventsRawNs).parquet(path)
            // nanos → micros with integer div (a double division would lose
            // precision: ns epochs exceed 2^53)
            .withColumn("ts",
              org.apache.spark.sql.functions.timestamp_micros(
                org.apache.spark.sql.functions.expr("ts div 1000")))
      }
    } else spark.read.schema(schemas(name)).parquet(path)
  }

  /** doc_id as a cluster-fanned Dataset[Long] — the input every
    * synthetic-log/file GENERATOR flatMaps over. Locally the documents
    * table is one small parquet split, so a generator that multiplies
    * each id into 10-50 synthetic lines (and the JSON/binary parse
    * downstream of it) otherwise runs as ONE task regardless of core
    * count. A deterministic hash repartition of the bare ids (8 bytes
    * per document — bounded at any scale) fans the generator out; the
    * explicit partition count keeps AQE from coalescing it back to one.
    */
  def docIdsFanned(spark: SparkSession, sfDir: String): org.apache.spark.sql.Dataset[Long] = {
    import org.apache.spark.sql.functions.col
    load(spark, sfDir, "documents")
      .select(col("doc_id").cast("long"))
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .as[Long](org.apache.spark.sql.Encoders.scalaLong)
  }

  /** [[docIdsFanned]] without the fan-out exchange — for generators
    * whose downstream kernel is provably CHEAP per document (a ~100-
    * sample WAV encode/decode, a few fixed-size frames), where the
    * driver's record showed the unconditional repartition is pure
    * overhead: a fixed exchange + stage barrier on a sub-second query
    * (q178 0.11 → 0.23 s, perf_weak-flagged in round 15). Hot
    * generators (JSON-log synthesis + parse, container walks) keep
    * riding the fanned form.
    */
  def docIds(spark: SparkSession, sfDir: String): org.apache.spark.sql.Dataset[Long] = {
    import org.apache.spark.sql.functions.col
    load(spark, sfDir, "documents")
      .select(col("doc_id").cast("long"))
      .as[Long](org.apache.spark.sql.Encoders.scalaLong)
  }

  private val tsInferred =
    new java.util.concurrent.ConcurrentHashMap[String, DataType]()
}

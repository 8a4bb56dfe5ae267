package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Similarity search over embedding columns (Array[Float]).
  *
  * Baseline: brute-force cosine top-k — a broadcast of the query vector
  * against a full scan; at 100 TB this is the map-only "gold" path you
  * fall back to per-partition. Scale path: random-hyperplane LSH
  * bucketing — each vector gets a small integer bucket from the sign
  * pattern of `planes` pseudo-random projections, candidates are
  * restricted to the query's bucket (an equi-join / partition-pruned
  * scan instead of an all-pairs pass).
  *
  * Determinism: per-row dot products fold left-to-right in double —
  * IEEE-deterministic and engine-portable (an oracle folding in index
  * order, e.g. DuckDB list_reduce, reproduces them bit-for-bit);
  * hyperplanes are md5-derived so an external oracle can rebuild the
  * exact same buckets. (Multi-row aggregation is where order-independent
  * decimal accumulation is needed — see ScalarFunctions.dsum.)
  */
object Similarity {

  /** Dot product of two float-array columns: double products folded
    * left-to-right. Double, not decimal: a decimal accumulator is ~4×
    * slower, breaks into interpreted mode for wide vectors, and the
    * fixed per-row fold order already makes doubles deterministic.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Same fold, as the native codegen'd expression (expressions.FloatDot)
    * — bit-identical values, ~10× faster on wide embeddings. Requires
    * `GraftExtensions.register(spark)` (GraftSession does it via
    * spark.sql.extensions).
    */
  def dotNative(a: Column, b: Column): Column =
    call_function("graft_dot", a, b)

  /** Cosine similarity rounded to 6 dp (rounding also stabilizes any
    * residual last-ulp divergence between engines).
    */
  def cosine(a: Column, b: Column): Column =
    round(dotNative(a, b) / (sqrt(dotNative(a, a)) * sqrt(dotNative(b, b))), 6)

  /** Brute-force top-k nearest neighbours of one query vector.
    * The single-row query side is broadcast; the scan side never
    * shuffles; TakeOrderedAndProject keeps k rows per partition.
    */
  def bruteForceTopK(vectors: DataFrame, idCol: String, vecCol: String,
                     query: DataFrame, k: Int): DataFrame = {
    graft.expressions.GraftExtensions.register(vectors.sparkSession)
    val q = query.select(col(vecCol).as("_qvec"))
    vectors.crossJoin(broadcast(q))
      .select(col(idCol), cosine(col(vecCol), col("_qvec")).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol).asc)
      .limit(k)
  }

  /** Pseudo-random hyperplane component in [-1, 1] for (plane, dim),
    * computed at plan-build time (md5-derived, reproducible anywhere).
    */
  def planeComponent(p: Int, d: Int): Double =
    (Hashing.hash64Local(s"plane$p:$d") % 2001 - 1000).toDouble / 1000.0

  /** Sign-pattern LSH bucket id from `planes` hyperplane projections of
    * a `dim`-wide vector. Same-bucket vectors are ANN candidates.
    *
    * The hyperplanes are literal double arrays baked into the plan and
    * each projection is a left-to-right double fold — IEEE-deterministic
    * (same values on any engine folding in index order) and fully
    * codegen'd. A decimal variant was 10× slower: a 512-node decimal
    * tree exceeds Janino's method limits and drops the whole projection
    * out of WholeStageCodegen into interpreted evaluation.
    */
  def hyperplaneBucket(vec: Column, dim: Int, planes: Int): Column = {
    val bits = (0 until planes).map { p =>
      val plane = array((1 to dim).map(d => lit(planeComponent(p, d))): _*)
      val proj = aggregate(
        zip_with(vec, plane, (x, c) => x.cast("double") * c),
        lit(0.0), (acc, v) => acc + v)
      when(proj > 0, lit(1 << p)).otherwise(lit(0))
    }
    bits.reduce(_ + _)
  }

  /** Seeded hyperplane component in [-1, 1] for (seed, plane, dim) —
    * independent plane families (e.g. the L hash tables of a banded
    * pair-search) come from distinct seeds.
    */
  def planeComponentSeeded(seed: String, p: Int, d: Int): Double =
    (Hashing.hash64Local(s"$seed:p$p:d$d") % 2001 - 1000).toDouble / 1000.0

  /** [[hyperplaneBucket]] with an explicit plane-family seed. Same
    * determinism/codegen properties; used where several independent
    * bucket tables are needed (banded near-dup search boosts recall:
    * P(candidate) = 1 - (1 - (1-θ/π)^planes)^tables).
    */
  def hyperplaneBucketSeeded(vec: Column, dim: Int, planes: Int, seed: String): Column = {
    val bits = (0 until planes).map { p =>
      val plane = array((1 to dim).map(d => lit(planeComponentSeeded(seed, p, d))): _*)
      val proj = aggregate(
        zip_with(vec, plane, (x, c) => x.cast("double") * c),
        lit(0.0), (acc, v) => acc + v)
      when(proj > 0, lit(1 << p)).otherwise(lit(0))
    }
    bits.reduce(_ + _)
  }

  /** Per-vector symmetric int8 quantization scale: max|v| / 127.
    * Together with [[quantizeInt8]] this is the compression step a
    * 100 TB embedding store runs before indexing — 4× smaller than
    * float32 with a per-vector scale preserving relative precision.
    */
  def int8Scale(vec: Column): Column =
    array_max(transform(vec, x => abs(x.cast("double")))) / 127.0

  /** Quantized int8 codes: round(v_i / scale). NOTE: a `scale` built
    * from an expression (e.g. [[int8Scale]]) is re-evaluated per
    * element inside the lambda — higher-order functions inline their
    * argument trees (no common-subexpression reuse). Fine at dim 64;
    * for wide vectors materialize the scale column first (checkpoint /
    * shuffle boundary) before calling this.
    */
  def quantizeInt8(vec: Column, scale: Column): Column =
    transform(vec, x => round(x.cast("double") / scale).cast("int"))

  /** Per-dimension absolute reconstruction error |v_i - q_i·scale| of
    * a quantized vector (all double arithmetic: IEEE-deterministic,
    * engine-portable).
    */
  def dequantError(vec: Column, q: Column, scale: Column): Column =
    zip_with(vec, q, (x, qq) => abs(x.cast("double") - qq.cast("double") * scale))

  /** LSH-bucketed ANN: top-k within the query's bucket only. */
  def lshTopK(vectors: DataFrame, idCol: String, vecCol: String,
              query: DataFrame, dim: Int, planes: Int, k: Int): DataFrame = {
    graft.expressions.GraftExtensions.register(vectors.sparkSession)
    val bucketed = vectors.withColumn("_bucket", hyperplaneBucket(col(vecCol), dim, planes))
    val q = query.select(
      col(vecCol).as("_qvec"),
      hyperplaneBucket(col(vecCol), dim, planes).as("_qbucket"))
    bucketed.join(broadcast(q), col("_bucket") === col("_qbucket"))
      .select(col(idCol), cosine(col(vecCol), col("_qvec")).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol).asc)
      .limit(k)
  }
}

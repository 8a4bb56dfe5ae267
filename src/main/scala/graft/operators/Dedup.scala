package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Hashing
import graft.operators.TextAnalysis.tokens

/** Deduplication operators for training-data pipelines: exact (hash
  * groupBy), MinHash+LSH banding, SimHash, and n-gram Jaccard.
  *
  * Scale design: signatures/bands are per-row expressions (no shuffle);
  * candidate generation is an equi-join on (band_index, band_hash) —
  * i.e. a hash-partitioned shuffle where only documents sharing a band
  * bucket ever meet, which is the point of LSH: at 100 TB the all-pairs
  * O(n²) comparison is replaced by |buckets| small joins. The final
  * exact-Jaccard verification runs only on candidate pairs.
  *
  * All hashing is md5-derived (Hashing.hash64) so an external oracle can
  * recompute signatures bit-for-bit.
  */
object Dedup {

  /** Word n-gram shingles. Documents shorter than n tokens contribute a
    * single whole-text shingle so they still participate (and dedup with
    * identical short docs).
    */
  def shingles(text: Column, n: Int): Column = {
    val t = tokens(text)
    val grams = transform(
      sequence(lit(1), size(t) - (n - 1)),
      i => concat_ws(" ", (0 until n).map(k => element_at(t, i + k)): _*))
    when(size(t) < n, array(concat_ws(" ", t))).otherwise(grams)
  }

  /** MinHash signature: k independent min-hashes over the shingle set.
    * Returns an array column of k longs.
    */
  def minhashSignature(shingleCol: Column, k: Int): Column =
    array((0 until k).map { j =>
      array_min(transform(shingleCol, s => Hashing.hash64(s, j)))
    }: _*)

  /** LSH band hashes: the signature is cut into bands of `rowsPerBand`
    * values; each band is hashed to one long. Two docs become candidates
    * iff they agree on at least one band — P(candidate) ≈ 1-(1-j^r)^b
    * for Jaccard j.
    */
  def lshBandHashes(sig: Column, rowsPerBand: Int, numBands: Int): Column =
    array((0 until numBands).map { b =>
      val bandVals = (0 until rowsPerBand)
        .map(r => element_at(sig, b * rowsPerBand + r + 1).cast("string"))
      Hashing.hash64(concat_ws("|", lit(s"band$b") +: bandVals: _*))
    }: _*)

  /** Exact Jaccard similarity of two array columns (over distinct
    * elements), rounded to 6 dp.
    */
  def jaccard(a: Column, b: Column): Column = {
    val ad = array_distinct(a)
    val bd = array_distinct(b)
    val inter = size(array_intersect(ad, bd))
    round(inter.cast("double") /
      (size(ad) + size(bd) - inter), 6)
  }

  /** End-to-end MinHash-LSH near-duplicate pairs.
    *
    * @param df       input
    * @param idCol    unique document id column name
    * @param textCol  text column name
    * @param n        shingle width (words)
    * @param k        signature length
    * @param rowsPerBand r; bands = k / r
    * @param threshold minimum exact Jaccard for an emitted pair
    * @return (id_a, id_b, jaccard) with id_a < id_b, one row per pair
    */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      n: Int, k: Int, rowsPerBand: Int,
                      threshold: Double): DataFrame = {
    val numBands = k / rowsPerBand
    val withSig = df
      .select(col(idCol), col(textCol))
      .withColumn("_sh", shingles(col(textCol), n))
      .withColumn("_bands", lshBandHashes(minhashSignature(col("_sh"), k), rowsPerBand, numBands))
    // one row per (doc, band); candidates meet on (band index, band hash)
    val exploded = withSig.select(
      col(idCol), col("_sh"),
      posexplode(col("_bands")).as(Seq("_b", "_h")))
    val left = exploded.select(
      col(idCol).as("id_a"), col("_sh").as("sh_a"), col("_b"), col("_h"))
    val right = exploded.select(
      col(idCol).as("id_b"), col("_sh").as("sh_b"), col("_b"), col("_h"))
    left.join(right, Seq("_b", "_h"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .distinct()
      .filter(col("jaccard") >= threshold)
  }

  /** SimHash: `bits`-wide locality-sensitive fingerprint of the distinct
    * token set. Bit b is set iff more token hashes have bit b set than
    * unset. Hamming-close simhashes ⇒ similar token distributions.
    */
  def simhash(text: Column, bits: Int): Column = {
    val toks = array_distinct(tokens(text))
    val contribs = transform(toks, w => Hashing.hash64(w))
    val bitCols = (0 until bits).map { b =>
      val balance = aggregate(contribs, lit(0L),
        (acc, h) => acc + (shiftright(h, b).bitwiseAND(1) * 2 - 1))
      when(balance > 0, lit(1L << b)).otherwise(lit(0L))
    }
    bitCols.reduce(_ + _)
  }
}

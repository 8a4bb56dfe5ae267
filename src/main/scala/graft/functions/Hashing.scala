package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable hashing primitives.
  *
  * Everything is built on md5 (bit-identical in every engine) rather than
  * xxhash64/murmur (whose seeds and variants differ between engines), so
  * the same value can be recomputed by an external oracle. All expressions
  * are built-in and codegen'd.
  */
object Hashing {

  /** 60-bit non-negative hash of a string: the first 15 hex digits of
    * md5, as a long. 15 hex digits = 60 bits, so the result always fits
    * a signed 64-bit integer and is never negative.
    */
  def hash64(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Seeded variant: independent hash families derived by suffixing the
    * seed (the classic way to get k MinHash permutations from one base
    * hash).
    */
  def hash64(c: Column, seed: Int): Column =
    hash64(concat(c, lit(s"#$seed")))

  /** Full md5 hex fingerprint. */
  def fingerprint(c: Column): Column = md5(c)

  /** Driver-side twin of [[hash64]] — used to precompute constants
    * (hash-family coefficients, hyperplane components) at plan-build
    * time so the per-row path is plain long/double arithmetic instead
    * of per-row md5.
    */
  def hash64Local(s: String): Long = java.lang.Long.parseLong(
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15), 16)
}

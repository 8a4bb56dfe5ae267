package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.ScalarFunctions._

class ScalarFunctionsSpec extends SparkSpec {

  import spark.implicits._

  test("cleanPercentage: blank/whitespace/unparseable → null, numerics parse") {
    val df = Seq("5.0", "", "   ", "N/A", " 3.25", "abc", "-1.5").toDF("raw")
    val out = df.select(cleanPercentage(col("raw")).as("v")).collect().map(r =>
      if (r.isNullAt(0)) null else r.getDouble(0))
    assert(out.toSeq == Seq(5.0, null, null, null, 3.25, null, -1.5))
  }

  test("cleanPercentage property: parseable doubles round-trip (seeded samples)") {
    val rng = new scala.util.Random(42)
    val samples = Seq.fill(200)(rng.nextDouble() * math.pow(10, rng.nextInt(9) - 4))
      .filterNot(d => d.isNaN || d.isInfinite)
    val out = samples.map(_.toString).toDF("raw")
      .select(cleanPercentage(col("raw")).as("v")).collect().map(_.getDouble(0))
    assert(out.toSeq == samples)
  }

  test("epiweekId builds YYYYWW from date with iso week") {
    val df = Seq("2024-06-15", "2020-01-15").toDF("d")
    val out = df.select(epiweekId(col("d").cast("date")).as("e"))
      .collect().map(_.getInt(0))
    assert(out.toSeq == Seq(202424, 202003))
  }

  test("floorDecade") {
    val out = Seq(2024, 2020, 1999).toDF("y")
      .select(floorDecade(col("y")).as("d")).collect().map(_.getInt(0))
    assert(out.toSeq == Seq(2020, 2020, 1990))
  }

  test("dsum/davg are partition-order independent") {
    val vals = (1 to 1000).map(i => 1.0 / i)
    val a = vals.toDF("v").repartition(1).agg(dsum(col("v"))).head.getDouble(0)
    val b = vals.reverse.toDF("v").repartition(13).agg(dsum(col("v"))).head.getDouble(0)
    assert(a == b) // bit-identical, not just close
  }

  test("hash64 matches an independent md5 computation and is non-negative") {
    val h = Seq("abc").toDF("s").select(Hashing.hash64(col("s"), 0).as("h"))
      .head.getLong(0)
    val expected = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest("abc#0".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15), 16)
    assert(h == expected && h >= 0)
  }
}

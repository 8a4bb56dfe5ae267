package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {

  import spark.implicits._

  // left probes at t=5,15,25,2 for key A (and one key with no rights)
  private lazy val left = Seq(
    (1L, "A", 5L), (2L, "A", 15L), (3L, "A", 25L), (4L, "A", 2L),
    (5L, "B", 10L))
    .toDF("lid", "k", "lt")

  // rights for A at t=3,10,20 (and one exactly at a probe ts)
  private lazy val right = Seq(
    (100L, "A", 3L, 1.0), (101L, "A", 10L, 2.0), (102L, "A", 20L, 3.0),
    (103L, "A", 15L, 9.0))
    .toDF("rid", "k", "rt", "rv")

  test("backward as-of picks the latest right row at-or-before each probe") {
    val out = AsOfJoin.asofBackward(left, right, Seq("k"), "lt", "rt")
      .orderBy("lid")
      .select("lid", "rid", "rt", "rv")
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    assert(out.toSeq == Seq(
      1L -> 100L, // t=5 → right at 3
      2L -> 103L, // t=15 → right exactly at 15 (>= semantics)
      3L -> 102L, // t=25 → right at 20
      4L -> -1L,  // t=2 → nothing before
      5L -> -1L)) // key B has no right rows
  }

  test("same-(key,ts) right rows tie-break deterministically (max payload)") {
    val dupRight = right.union(
      Seq((104L, "A", 20L, 4.0)).toDF("rid", "k", "rt", "rv"))
    val out = AsOfJoin.asofBackward(
        left.filter(col("lid") === 3), dupRight, Seq("k"), "lt", "rt")
      .select("rid").head()
    assert(out.getLong(0) == 104L) // struct-max of (rt=20 payloads)
  }

  test("payload name collisions are rejected") {
    intercept[IllegalArgumentException] {
      AsOfJoin.asofBackward(left, right.withColumnRenamed("rid", "lid"),
        Seq("k"), "lt", "rt")
    }
  }
}

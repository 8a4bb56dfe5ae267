package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class KMeansOpsSpec extends SparkSpec {

  test("lloydStep reproduces the oracle-gated q74 step") {
    val sf = "/root/testdata/sf0.001"
    val emb = graft.Tables.load(spark, sf, "embeddings")
    val init = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").cast("int").as("cid"), col("embedding").as("cv"))
    val step = KMeansOps.lloydStep(emb, "vec_id", "embedding", init)
      .select(col("cid"), posexplode(col("cv")).as(Seq("_pos", "_v")))
      .select(col("cid"), (col("_pos") + 1).as("dim"),
        round(col("_v").cast("double"), 5).as("centroid"))
      .orderBy("cid", "dim")
    val q74 = graft.queries.DataQueries.q74.fn(spark, sf)
      .select(col("cid"), col("dim"), round(col("centroid"), 5).as("centroid"))
      .orderBy("cid", "dim")
    // float storage in the array trims the fixed-point mean to ~7
    // significant digits — compare at 5 dp (values are O(0.1))
    assertRowsEqual(rows(step), rows(q74), tol = 1e-4)
  }

  test("fit converges on planted blobs and recovers both cluster means") {
    import spark.implicits._
    // two tight blobs in 2-D: around (0, 0) and (10, 10)
    val pts = (0 until 20).map { i =>
      val base = if (i % 2 == 0) 0.0f else 10.0f
      (i.toLong, Array(base + (i % 5) * 0.01f, base - (i % 3) * 0.01f))
    }.toDF("id", "vec")
    val init = Seq((0, Array(1.0f, 1.0f)), (1, Array(9.0f, 9.0f)))
      .toDF("cid", "cv")
    val out = KMeansOps.fit(pts, "id", "vec", init, maxIter = 10, tol = 1e-9)
      .orderBy("cid")
      .collect()
    assert(out.length == 2)
    val c0 = out(0).getSeq[Float](1)
    val c1 = out(1).getSeq[Float](1)
    assert(out(0).getLong(2) == 10 && out(1).getLong(2) == 10)
    assert(math.abs(c0(0)) < 0.05 && math.abs(c0(1)) < 0.05, s"c0=$c0")
    assert(math.abs(c1(0) - 10.0) < 0.05 && math.abs(c1(1) - 10.0) < 0.05, s"c1=$c1")
  }
}

package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Behavioral properties of the cluster-engineering batch (q92–q100) —
  * the oracle gate proves engine-vs-engine equality; these pin the
  * invariants the oracle can't express (pruning soundness, interval
  * algebra, distribution bounds, determinism under repartitioning).
  */
class ScaleQueriesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q92: bloom probe has no false negatives and prunes most of the fact") {
    val orders = graft.Tables.load(spark, sf, "orders")
    val dimKeys = graft.Tables.load(spark, sf, "customer")
      .filter(col("c_mktsegment") === "BUILDING" && col("c_nationkey") < 5)
      .select(col("c_custkey")).collect().map(_.getLong(0)).toSet
    val total = orders.count()
    val exact = orders.filter(col("o_custkey").isInCollection(dimKeys)).count()
    val probed = ScaleQueries.bloomProbedOrders(spark, sf)
    val probedKeys = probed.select("o_custkey").collect().map(_.getLong(0))
    // soundness: every true match survives the bloom probe
    assert(probed.filter(col("o_custkey").isInCollection(dimKeys)).count() == exact)
    // pruning: the filter eliminates the overwhelming majority of the
    // non-matching fact (m=2^17 bits for ~100 keys ⇒ FP rate ~1e-6)
    assert(probedKeys.length < total / 5,
      s"bloom kept ${probedKeys.length} of $total rows — not pruning")
    val fps = probedKeys.count(!dimKeys.contains(_))
    assert(fps <= 2, s"$fps bloom false positives — filter badly sized")
  }

  test("q92: bloom + exact verify equals the plain semi-join aggregate") {
    val viaBloom = rows(ScaleQueries.q92.fn(spark, sf))
    val dim = graft.Tables.load(spark, sf, "customer")
      .filter(col("c_mktsegment") === "BUILDING" && col("c_nationkey") < 5)
      .select(col("c_custkey"))
    val plain = graft.Tables.load(spark, sf, "orders")
      .join(dim, col("o_custkey") === col("c_custkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        round(graft.functions.ScalarFunctions.dsum(col("o_totalprice")), 2).as("revenue"))
      .orderBy("o_orderpriority")
    assertRowsEqual(viaBloom, rows(plain))
  }

  test("q93: bm25 scores are positive and sorted descending with doc_id tiebreak") {
    val out = ScaleQueries.q93.fn(spark, sf).collect()
    assert(out.nonEmpty && out.length <= 20)
    assert(out.forall(_.getAs[Double]("bm25") > 0.0))
    val keys = out.map(r => (-r.getAs[Double]("bm25"), r.getAs[Long]("doc_id")))
    assert(keys.sameElements(keys.sorted), "rows not in (bm25 desc, doc_id) order")
  }

  test("q94: split is a partition of the corpus with ~90/5/5 shares, stable under repartitioning") {
    val out = ScaleQueries.q94.fn(spark, sf)
    val total = graft.Tables.load(spark, sf, "documents").count()
    val bySplit = out.groupBy("split").agg(sum("n_docs").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.values.sum == total)
    assert(bySplit("train").toDouble / total > 0.8)
    assert(bySplit("valid") > 0 && bySplit("test") > 0)
    // hash bucketing ⇒ identical assignment whatever the layout
    val again = ScaleQueries.q94.fn(spark, sf).repartition(7).orderBy("split", "source")
    assertRowsEqual(rows(out), rows(again))
  }

  test("q95: SCD2 intervals chain per user, statuses alternate, exactly one current row") {
    val out = ScaleQueries.q95.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getBoolean(4)))
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (user, rs) =>
      val seq = rs.sortBy(_._3)
      // intervals chain: each valid_to equals the next valid_from
      seq.sliding(2).foreach {
        case Array((_, _, _, Some(to), _), (_, _, from, _, _)) =>
          assert(to == from, s"user $user: gap/overlap $to vs $from")
        case _ =>
      }
      // run-length collapsed: no two consecutive rows share a status
      seq.sliding(2).foreach {
        case Array((_, s1, _, _, _), (_, s2, _, _, _)) =>
          assert(s1 != s2, s"user $user: uncollapsed run of $s1")
        case _ =>
      }
      assert(seq.count(_._5) == 1, s"user $user: not exactly one current row")
      assert(seq.last._4.isEmpty, s"user $user: current row has a valid_to")
    }
  }

  test("q96: cube subtotals are consistent with the grand total") {
    val out = ScaleQueries.q96.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getInt(3), r.getLong(4)))
    val grand = out.filter(t => t._1 == "ALL" && t._2 == "ALL")
    assert(grand.length == 1 && grand.head._3 == 1 && grand.head._4 == 1)
    val total = grand.head._5
    assert(total == graft.Tables.load(spark, sf, "lineitem").count())
    // each one-dimension margin sums back to the grand total
    assert(out.filter(t => t._1 != "ALL" && t._2 == "ALL").map(_._5).sum == total)
    assert(out.filter(t => t._1 == "ALL" && t._2 != "ALL").map(_._5).sum == total)
    assert(out.filter(t => t._1 != "ALL" && t._2 != "ALL").map(_._5).sum == total)
  }

  test("q97: skew report orders its quantiles and ratio >= 1") {
    val r = ScaleQueries.q97.fn(spark, sf).collect().head
    val (maxC, p50, p99, ratio) = (r.getAs[Long]("max_cnt"), r.getAs[Double]("p50_cnt"),
      r.getAs[Double]("p99_cnt"), r.getAs[Double]("skew_ratio"))
    assert(p50 <= p99 && p99 <= maxC.toDouble)
    assert(ratio >= 1.0)
  }

  test("q98: hard negatives never share the anchor's label and rank by similarity") {
    val labels = graft.Tables.load(spark, sf, "embeddings")
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val out = ScaleQueries.q98.fn(spark, sf).collect()
      .map(r => (r.getAs[Long]("anchor_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("vec_id"), r.getAs[Double]("cos")))
    assert(out.nonEmpty)
    out.foreach { case (a, _, v, c) =>
      assert(labels(v) != labels(a), s"negative $v shares label with anchor $a")
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
    }
    out.groupBy(_._1).foreach { case (a, rs) =>
      val seq = rs.sortBy(_._2)
      assert(seq.map(_._2).sameElements(1 to seq.length), s"anchor $a ranks not 1..k")
      assert(seq.map(_._4).sliding(2).forall(w => w.length < 2 || w(0) >= w(1)),
        s"anchor $a: similarity not non-increasing in rank")
    }
  }

  test("q99: winsorized mean lies within the clip bounds") {
    val out = ScaleQueries.q99.fn(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (p05, p95) = (r.getAs[Double]("p05"), r.getAs[Double]("p95"))
      val mw = r.getAs[Double]("mean_winsorized")
      assert(p05 <= p95)
      assert(mw >= p05 - 1e-6 && mw <= p95 + 1e-6,
        s"winsorized mean $mw outside [$p05, $p95]")
    }
  }

  test("q101: sampled estimates are deterministic multiples of 8 and track exact counts") {
    val out = ScaleQueries.q101.fn(spark, sf)
    val rows1 = rows(out)
    rows1.foreach { r =>
      assert(r(2).asInstanceOf[Long] % 8 == 0, "estimate not a multiple of the sampling rate")
    }
    // hash sampling ⇒ identical estimates on any layout
    assertRowsEqual(rows1,
      rows(ScaleQueries.q101.fn(spark, sf)
        .repartition(5).orderBy(col("exact_cnt").desc, col("token").asc)))
    // the 1/8 sample should track head tokens within a loose factor
    val errs = rows1.map(_(3).asInstanceOf[Double])
    assert(errs.count(_ < 0.5) >= errs.length / 2,
      s"most head-token estimates off by >50%: $errs")
  }

  test("q102: band rewrite equals the naive theta join and plans no nested loop") {
    val viaBands = ScaleQueries.q102.fn(spark, sf)
    val ev = graft.Tables.load(spark, sf, "events")
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id"), unix_micros(col("ts")).as("c_us"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("_u2"), unix_micros(col("ts")).as("p_us"))
    val theta = c.join(p, col("user_id") === col("_u2")
        && col("p_us") >= col("c_us") && col("p_us") <= col("c_us") + 86400000000L)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_pairs"), min(col("p_us") - col("c_us")).as("min_gap_us"))
      .orderBy("user_id")
    assertRowsEqual(rows(viaBands), rows(theta))
    val plan = viaBands.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
      "band rewrite still plans a nested-loop join")
  }

  test("q103: z-order clusters cover all rows and localize both dimensions") {
    val out = ScaleQueries.q103.fn(spark, sf).collect()
    val orders = graft.Tables.load(spark, sf, "orders")
    assert(out.map(_.getAs[Long]("n_rows")).sum == orders.count())
    val gCust = out.map(_.getAs[Long]("max_cust")).max - out.map(_.getAs[Long]("min_cust")).min
    val gDay = out.map(_.getAs[Long]("max_day")).max - out.map(_.getAs[Long]("min_day")).min
    // mean per-cluster extent must be well under the global extent on
    // BOTH axes — the property single-column sorting can't deliver
    def meanExtent(lo: String, hi: String): Double =
      out.map(r => (r.getAs[Long](hi) - r.getAs[Long](lo)).toDouble).sum / out.length
    assert(meanExtent("min_cust", "max_cust") < gCust * 0.8,
      "clusters do not localize the customer dimension")
    assert(meanExtent("min_day", "max_day") < gDay * 0.8,
      "clusters do not localize the date dimension")
  }

  test("q104: merged partials equal a from-scratch aggregate") {
    val merged = rows(ScaleQueries.q104.fn(spark, sf))
    val direct = graft.Tables.load(spark, sf, "orders")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(28, 6)))
          .as("_t"))
      .select(col("o_orderstatus"), col("n_orders"),
        round(col("_t").cast("double"), 2).as("total_price"),
        round(col("_t").cast("double") / col("n_orders"), 6).as("avg_price"))
      .orderBy("o_orderstatus")
    assertRowsEqual(merged, rows(direct))
  }

  test("q105: containment pairs share an 8-gram and bound the intersection") {
    val out = ScaleQueries.q105.fn(spark, sf).collect()
    assert(out.nonEmpty)
    val g8 = graft.Tables.load(spark, sf, "documents")
      .select(col("doc_id"),
        call_function("graft_shingle_hashes", col("text"), lit(8)).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    out.foreach { r =>
      val (a, b) = (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))
      val (ca, cb) = (r.getAs[Double]("cont_a_in_b"), r.getAs[Double]("cont_b_in_a"))
      assert(a < b, "pairs not ordered")
      assert(ca > 0.0 && ca <= 1.0 && cb > 0.0 && cb <= 1.0)
      assert(math.max(ca, cb) >= 0.5)
      assert(g8(a).intersect(g8(b)).nonEmpty, s"pair ($a,$b) shares no 8-gram")
    }
  }

  test("q106: shards are count-balanced, token-balanced, and match the global window") {
    val out = ScaleQueries.q106.fn(spark, sf).collect()
    assert(out.length == 8)
    val counts = out.map(_.getAs[Long]("n_docs"))
    assert(counts.max - counts.min <= 1, "round-robin counts differ by more than 1")
    val totals = out.map(_.getAs[Long]("total_tokens").toDouble)
    val avg = totals.sum / totals.length
    assert((totals.max - totals.min) / avg < 0.1,
      s"token imbalance ${(totals.max - totals.min) / avg} too high")
    // two-level prefix decomposition == straightforward global window
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n_tokens").desc, col("doc_id").asc)
    val direct = graft.Tables.load(spark, sf, "documents")
      .select(col("doc_id"),
        graft.operators.TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
      .withColumn("shard", pmod(row_number().over(w) - 1, lit(8L)))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("total_tokens"))
      .orderBy("shard")
    assertRowsEqual(rows(ScaleQueries.q106.fn(spark, sf)), rows(direct))
  }

  test("q100: 3-sigma outliers are a small minority and moments are sane") {
    val out = ScaleQueries.q100.fn(spark, sf).collect()
    assert(out.length == 5) // one row per event type
    out.foreach { r =>
      val (n, std, k) = (r.getAs[Long]("n_events"), r.getAs[Double]("std_value"),
        r.getAs[Long]("n_outliers"))
      assert(std > 0.0)
      assert(k <= n / 10, s"${r.getString(0)}: $k of $n flagged — not an outlier rule")
    }
  }

  test("q119: three grouping sets evaluate through one Expand and one shuffle") {
    val plan = ScaleQueries.q119.fn(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), s"no Expand node — sets not fused:\n$plan")
    val aggShuffles = plan.linesIterator
      .count(l => l.contains("Exchange hashpartitioning") && l.contains("spark_grouping_id"))
    assert(aggShuffles == 1,
      s"expected exactly one grouping-id shuffle, found $aggShuffles:\n$plan")
  }

  test("q120: change classes partition the key universe exactly") {
    val keys = graft.Tables.load(spark, sf, "orders")
      .select(col("o_orderkey")).collect().map(_.getLong(0))
    val inY = keys.filter(_ % 3 != 0).toSet
    val inT = keys.filter(_ % 5 != 0).toSet
    val expect = Map(
      "added" -> (inT -- inY).size.toLong,
      "removed" -> (inY -- inT).size.toLong,
      "changed" -> (inY & inT).count(_ % 7 == 0).toLong,
      "unchanged" -> (inY & inT).count(_ % 7 != 0).toLong)
    val got = rows(ScaleQueries.q120.fn(spark, sf))
      .map(r => r(0).asInstanceOf[String] -> r(1).asInstanceOf[Long]).toMap
    assert(got == expect, s"got $got expected $expect")
  }

  test("q121: null-safe join keeps the NULL-key rows a plain join drops") {
    val r = rows(ScaleQueries.q121.fn(spark, sf))
    val nullKeyed = graft.Tables.load(spark, sf, "orders")
      .filter(col("o_orderpriority") === "3-MEDIUM").count()
    val unknown = r.find(_(0) == "UNKNOWN").get
    assert(unknown(1).asInstanceOf[Long] == nullKeyed,
      s"null-safe join lost NULL keys: ${unknown(1)} != $nullKeyed")
    val total = r.map(_(1).asInstanceOf[Long]).sum
    assert(total == graft.Tables.load(spark, sf, "orders").count(),
      "null-safe join must cover every order exactly once")
  }

  test("q200: rendezvous resharding moves only winners, all to the new shard") {
    val r = rows(ScaleQueries.q200.fn(spark, sf))
    assert(r.nonEmpty)
    val moved = r.filter(_(3).asInstanceOf[Boolean])
    // the HRW invariant: a doc moves IFF the new shard (index 8) wins
    // its hash race — so every mover lands on shard 8 and nothing
    // shuffles between old shards
    assert(moved.forall(_(2).asInstanceOf[Long] == 8L),
      s"movers must all land on the new shard: ${moved.take(5)}")
    r.filterNot(_(3).asInstanceOf[Boolean]).foreach { row =>
      assert(row(1) == row(2), s"non-mover changed shard: $row")
    }
    // expected movement is 1/9 of the corpus; allow a generous band
    val frac = moved.length.toDouble / r.length
    assert(frac > 0.02 && frac < 0.25, s"moved fraction $frac implausible for 1/9")
    // balance: with 500 docs over 8 shards, every shard is populated
    val byShard = r.groupBy(_(1).asInstanceOf[Long]).view.mapValues(_.size)
    assert(byShard.keys.toSet == (0L to 7L).toSet, byShard.toMap.toString)
  }

  test("q225: clean star schema audits orphan-free; planted orphans fire") {
    val sf = "/root/testdata/sf0.001"
    val out = graft.queries.ScaleQueries.q225.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.length == 7)
    out.foreach { r =>
      assert(r._3 == 0L && r._4 == 0L, s"clean data read orphans: $r")
    }
    // doctored copy: two customers point at a nation that does not exist
    val dir = java.nio.file.Files.createTempDirectory("graft-fk").toString
    graft.Tables.names.foreach { t =>
      val df = graft.Tables.load(spark, sf, t)
      val doctored =
        if (t == "customer")
          df.withColumn("c_nationkey",
            when(col("c_custkey") <= 2, lit(9999)).otherwise(col("c_nationkey")))
        else df
      doctored.write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    val planted = graft.Tables.load(spark, sf, "customer")
      .filter(col("c_custkey") <= 2).count()
    assert(planted > 0)
    val audited = graft.queries.ScaleQueries.q225.fn(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(2))).toMap
    assert(audited("customer.nation->nation") == planted,
      s"planted orphans not detected: $audited")
    assert(audited.filterNot(_._1 == "customer.nation->nation").values.forall(_ == 0L))
  }
}

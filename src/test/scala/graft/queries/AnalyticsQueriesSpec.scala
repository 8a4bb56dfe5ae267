package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables

/** Behavioral properties of the applied-analytics batch (q245–q252) —
  * cross-query conservation laws and brute-force replays the oracle
  * gate can't express.
  */
class AnalyticsQueriesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q245: per-node triangle counts conserve q163's total (each counted at 3 corners)") {
    val perNode = rows(AnalyticsQueries.q245.fn(spark, sf))
    val total = rows(ExtQueries.q163.fn(spark, sf)).head(3).asInstanceOf[Long]
    val sumTri = perNode.map(_(2).asInstanceOf[Long]).sum
    assert(sumTri == 3 * total, s"sum of per-node t = $sumTri, 3*total = ${3 * total}")
    perNode.foreach { r =>
      val cc = r(3).asInstanceOf[Double]
      assert(cc >= 0.0 && cc <= 1.0 + 1e-9, s"cc out of range: $r")
    }
  }

  test("q246: degree mass sums to 2m, intra-edges to at most m, Q in [-1, 1]") {
    val out = rows(AnalyticsQueries.q246.fn(spark, sf))
    val eIn = out.map(_(1).asInstanceOf[Long]).sum
    val degMass = out.map(_(2).asInstanceOf[Long]).sum
    val q = out.map(_(3).asInstanceOf[Double]).sum
    assert(degMass % 2 == 0 && degMass / 2 >= eIn, s"degMass $degMass, eIn $eIn")
    assert(q >= -1.0 && q <= 1.0, s"modularity $q")
  }

  test("q247: segment census covers every ordering customer, scores in 1..5") {
    val out = rows(AnalyticsQueries.q247.fn(spark, sf))
    val covered = out.map(_(3).asInstanceOf[Long]).sum
    val nCust = Tables.load(spark, sf, "orders")
      .select("o_custkey").distinct().count()
    assert(covered == nCust, s"covered $covered vs $nCust customers")
    out.foreach { r =>
      (0 to 2).foreach { i =>
        val sc = r(i).asInstanceOf[Int]
        assert(sc >= 1 && sc <= 5, s"score out of range: $r")
      }
    }
  }

  test("q248: LTV is non-decreasing within each cohort and conserves total revenue") {
    val out = rows(AnalyticsQueries.q248.fn(spark, sf))
      .map(r => (r(0).asInstanceOf[Int], r(1).asInstanceOf[Int], r(3).asInstanceOf[Long]))
    out.groupBy(_._1).values.foreach { c =>
      val sorted = c.sortBy(_._2).map(_._3)
      assert(sorted == sorted.sorted, "cum revenue decreased within a cohort")
    }
    val finalTotal = out.groupBy(_._1).values.map(_.maxBy(_._2)._3).sum
    val expect = Tables.load(spark, sf, "orders")
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))).collect()(0).getLong(0)
    assert(finalTotal == expect, s"LTV total $finalTotal vs revenue $expect")
  }

  test("q249: permutation entropy matches a brute-force replay of the triples") {
    val out = rows(AnalyticsQueries.q249.fn(spark, sf)).head
    val ev = Tables.load(spark, sf, "events")
      .select(col("user_id"), col("ts").cast("long"), col("event_id"), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val pats = ev.groupBy(_._1).values.flatMap { es =>
      val vs = es.sortBy(e => (e._2, e._3)).map(_._4)
      vs.sliding(3).filter(_.length == 3).map { t =>
        (if (t(0) < t(1)) 4 else 0) + (if (t(1) < t(2)) 2 else 0) + (if (t(0) < t(2)) 1 else 0)
      }
    }.toSeq
    val n = pats.length.toDouble
    val h = math.log(n) - pats.groupBy(identity).values
      .map(g => math.round(math.log(g.size.toDouble) * 1e6).toDouble * g.size).sum / n / 1e6
    assert(out(0).asInstanceOf[Long] == pats.length)
    assert(math.abs(out(2).asInstanceOf[Double] - h) < 1e-5, s"H ${out(2)} vs $h")
    assert(out(2).asInstanceOf[Double] <= math.log(8.0) + 1e-9)
  }

  test("q249: ts-ordering matters — sliding window uses event order, not value order") {
    // a monotone series has exactly one pattern and zero entropy
    import spark.implicits._
    val mono = Seq.tabulate(20)(i => (1L, i.toLong, i.toLong, i.toDouble))
      .toDF("user_id", "sec", "event_id", "value")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("sec").asc, col("event_id").asc)
    val pat = mono
      .withColumn("v2", lead("value", 1).over(w))
      .withColumn("v3", lead("value", 2).over(w))
      .filter(col("v2").isNotNull && col("v3").isNotNull)
      .select((when(col("value") < col("v2"), 4).otherwise(0)
        + when(col("v2") < col("v3"), 2).otherwise(0)
        + when(col("value") < col("v3"), 1).otherwise(0)).as("p"))
      .distinct().collect()
    assert(pat.length == 1 && pat(0).getInt(0) == 7)
  }

  test("q250: pruning fractions match a brute-force zone-map replay") {
    val out = rows(AnalyticsQueries.q250.fn(spark, sf))
      .map(r => r(0).asInstanceOf[Int] -> (r(2).asInstanceOf[Long], r(3).asInstanceOf[Long]))
      .toMap
    val li = Tables.load(spark, sf, "lineitem")
      .select(expr("l_orderkey div 1000"), col("l_shipdate").cast("long"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val files = li.groupBy(_._1).map { case (_, rs) =>
      (rs.map(_._2).min, rs.map(_._2).max, rs.map(_._3).min, rs.map(_._3).max)
    }.toSeq
    val preds = Seq(
      (1, true, 820454400L, 852076799L), (2, true, 852076800L, 883612799L),
      (3, true, 883612800L, 915148799L), (4, true, 946684800L, 978307199L),
      (5, false, 0L, 1000000L), (6, false, 5000000L, 7000000L),
      (7, false, 9000000L, 10500000L), (8, false, 10000000L, Long.MaxValue))
    preds.foreach { case (pid, isDate, lo, hi) =>
      val scanned = files.count { case (dmin, dmax, pmin, pmax) =>
        if (isDate) dmax >= lo && dmin <= hi else pmax >= lo && pmin <= hi
      }
      assert(out(pid) == ((files.size.toLong, scanned.toLong)),
        s"pid $pid: ${out(pid)} vs (${files.size}, $scanned)")
    }
  }

  test("q251: quotas are met exactly and match the target proportions") {
    val out = rows(AnalyticsQueries.q251.fn(spark, sf))
    // totals from the data, not the output: target bins with no source
    // counterpart still contribute to T (the output's left join drops them)
    val tt = Tables.load(spark, sf, "documents")
      .filter(col("source") === "src0").count()
    val ss = Tables.load(spark, sf, "documents")
      .filter(col("source") === "src1").count()
    out.foreach { r =>
      val (t, s, quota, kept) = (r(1).asInstanceOf[Long], r(2).asInstanceOf[Long],
        r(3).asInstanceOf[Long], r(4).asInstanceOf[Long])
      assert(kept == quota, s"kept != quota in $r")
      assert(quota <= s, s"quota exceeds availability in $r")
      // round-half-up(S*t/T) capped at s
      val want = math.min(s, (2 * ss * t + tt) / (2 * tt))
      assert(quota == want, s"quota $quota vs $want in $r")
    }
  }

  test("q260: AP matches a brute-force PR walk and sits in [0,1]") {
    val out = rows(AnalyticsQueries.q260.fn(spark, sf)).head
    val emb = Tables.load(spark, sf, "embeddings")
    // the sibling gains table shares the scoring pipeline; sanity-pin it
    val scored = rows(InferQueries.q259.fn(spark, sf))
    assert(scored.nonEmpty)
    val n = emb.count(); val r = emb.filter(col("label") === 0).count()
    assert(out(0).asInstanceOf[Long] == n && out(1).asInstanceOf[Long] == r)
    val ap = out(2).asInstanceOf[Double]
    assert(ap >= 0.0 && ap <= 1.0 + 1e-9)
    // AP of a random-ish ranking concentrates near the base rate; it
    // must at least never fall below half the base rate here
    assert(ap > 0.5 * r.toDouble / n, s"suspiciously low AP $ap")
  }

  test("q261: rates and z agree with exact counts; z finite and consistent in sign") {
    val out = rows(AnalyticsQueries.q261.fn(spark, "/root/testdata/sf0.01")).head
    val (n1, x1, n2, x2) = (out(0).asInstanceOf[Long], out(1).asInstanceOf[Long],
      out(2).asInstanceOf[Long], out(3).asInstanceOf[Long])
    assert(x1 <= n1 && x2 <= n2)
    val z = out(6).asInstanceOf[Double]
    val p1 = x1.toDouble / n1; val p2 = x2.toDouble / n2
    assert(math.signum(z) == math.signum(p1 - p2), s"sign mismatch: $out")
    val pp = (x1 + x2).toDouble / (n1 + n2)
    val want = (p1 - p2) / math.sqrt(pp * (1 - pp) * (1.0 / n1 + 1.0 / n2))
    assert(math.abs(z - want) < 1e-5)
  }

  test("q261: one-cohort degenerate input yields NULL z, not an ANSI error") {
    val out = rows(AnalyticsQueries.q261.fn(spark, sf)).head
    assert(out(6) == null, s"expected NULL z at degenerate sf0.001: $out")
  }

  test("q262: clusters partition the linked docs and every member matches its block") {
    val out = rows(AnalyticsQueries.q262.fn(spark, sf))
    val sizes = out.map(_(1).asInstanceOf[Long])
    assert(sizes.forall(_ >= 2), "a linked component has at least 2 members")
    // cluster ids are min-ids: strictly increasing and unique
    val ids = out.map(_(0).asInstanceOf[Long])
    assert(ids == ids.sorted && ids.distinct.size == ids.size)
  }

  test("q263: z_trend matches a brute-force Cochran-Armitage computation") {
    val out = rows(AnalyticsQueries.q263.fn(spark, sf)).head
    val g = Tables.load(spark, sf, "orders")
      .select(substring(col("o_orderpriority"), 1, 1).cast("long"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
      .collect().map(r => (r.getLong(0), if (r.getLong(1) > 25000000L) 1L else 0L))
    val byW = g.groupBy(_._1).map { case (w, vs) => (w, vs.length.toLong, vs.map(_._2).sum) }
    val nt = byW.map(_._2).sum; val xt = byW.map(_._3).sum
    val pbar = xt.toDouble / nt
    val swx = byW.map(t => t._1 * t._3).sum
    val swn = byW.map(t => t._1 * t._2).sum
    val swwn = byW.map(t => t._1 * t._1 * t._2).sum
    val z = (swx - pbar * swn) / math.sqrt(pbar * (1 - pbar) * (swwn - swn.toDouble * swn / nt))
    assert(out(0).asInstanceOf[Long] == nt)
    assert(math.abs(out(2).asInstanceOf[Double] - z) < 1e-5, s"z ${out(2)} vs $z")
  }

  test("q264: Q matches a brute-force ACF walk per event type") {
    val out = rows(AnalyticsQueries.q264.fn(spark, sf))
      .map(r => r(0).asInstanceOf[String] -> r(2).asInstanceOf[Double]).toMap
    val daily = Tables.load(spark, sf, "events")
      .groupBy(col("event_type"), expr("CAST(ts AS LONG) div 86400").as("d"))
      .agg(count(lit(1)).as("y"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    daily.groupBy(_._1).foreach { case (et, pts0) =>
      val pts = pts0.sortBy(_._2)
      val n = pts.length
      val ybar = pts.map(_._3).sum.toDouble / n
      val den = pts.map(p => p._3 * p._3).sum - pts.map(_._3).sum * ybar
      val byDay = pts.map(p => p._2 -> p._3).toMap
      var qU = 0L
      (1 to 7).foreach { k =>
        val pairs = pts.flatMap(p => byDay.get(p._2 + k).map(y2 => (p._3, y2)))
        if (pairs.nonEmpty) {
          val num = pairs.map { case (a, b) => a.toDouble * b }.sum -
            ybar * pairs.map { case (a, b) => a + b }.sum + pairs.length * ybar * ybar
          val rhoU = math.round(1e9 * num / den)
          qU += math.round(1e9 * (rhoU / 1e9) * (rhoU / 1e9) / (n - k))
        }
      }
      val q = n.toDouble * (n + 2) * qU / 1e9
      assert(math.abs(out(et) - q) < 1e-4, s"$et: ${out(et)} vs $q")
    }
  }

  test("q265: counts add up and the pooled sign matches the exact cross-multiplication") {
    val out = rows(AnalyticsQueries.q265.fn(spark, sf)).head
    val (ns, agree, flip, tie) = (out(0).asInstanceOf[Long], out(1).asInstanceOf[Long],
      out(2).asInstanceOf[Long], out(3).asInstanceOf[Long])
    assert(ns == agree + flip + tie)
    val pooledSign = out(4).asInstanceOf[Int]
    val pooledDiff = out(5).asInstanceOf[Double]
    assert(math.signum(pooledDiff).toInt == pooledSign)
  }

  test("q266: timed funnel is monotone and never exceeds the untimed q89 funnel") {
    val timed = rows(AnalyticsQueries.q266.fn(spark, sf)).map(_(2).asInstanceOf[Long])
    assert(timed == timed.sorted.reverse, s"funnel not monotone: $timed")
    val untimed = rows(TrainQueries.all.find(_.name == "q89_funnel")
      .getOrElse(EventQueries.all.find(_.name == "q89_funnel").get).fn(spark, sf))
      .map(_(2).asInstanceOf[Long])
    timed.zip(untimed).zipWithIndex.foreach { case ((t, u), i) =>
      if (i == 0) assert(t == u, "stage 1 has no time constraint")
      else assert(t <= u, s"timed stage $i exceeds untimed: $t > $u")
    }
  }

  test("q267: assortativity matches a brute-force edge-end correlation") {
    val out = rows(AnalyticsQueries.q267.fn(spark, sf)).head
    val li = Tables.load(spark, sf, "lineitem")
      .select("l_orderkey", "l_partkey").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val cnt = scala.collection.mutable.Map.empty[(Long, Long), Int].withDefaultValue(0)
    li.groupBy(_._1).values.foreach { g =>
      val ids = g.map(_._2).sorted
      for (i <- ids.indices; j <- (i + 1) until ids.length)
        cnt((ids(i), ids(j))) += 1
    }
    val pairs = cnt.iterator.filter(_._2 >= 2).map(_._1).toSeq
    val deg = (pairs.map(_._1) ++ pairs.map(_._2)).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ends = pairs.flatMap(p => Seq((deg(p._1), deg(p._2)), (deg(p._2), deg(p._1))))
    val n = ends.length.toDouble
    val sx = ends.map(_._1).sum.toDouble; val sy = ends.map(_._2).sum.toDouble
    val sxx = ends.map(e => e._1 * e._1).sum.toDouble
    val syy = ends.map(e => e._2 * e._2).sum.toDouble
    val sxy = ends.map(e => e._1 * e._2).sum.toDouble
    val r = (n * sxy - sx * sy) / (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    assert(out(0).asInstanceOf[Long] == ends.length)
    assert(math.abs(out(1).asInstanceOf[Double] - r) < 1e-5, s"r ${out(1)} vs $r")
  }

  test("q268: mutual-NN pairs are exactly the reciprocal top-1 matches") {
    // full-audit replay; the sampled default is pinned in MutualNNSpec
    spark.conf.set(graft.operators.Similarity.ExactNNFlag, "true")
    val out = (
      try rows(AnalyticsQueries.q268.fn(spark, sf))
      finally spark.conf.unset(graft.operators.Similarity.ExactNNFlag)
    ).map(r => (r(0).asInstanceOf[Long], r(1).asInstanceOf[Long]))
    val emb = Tables.load(spark, sf, "embeddings")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val top1 = emb.map { case (id, v) =>
      id -> emb.filter(_._1 != id)
        .map { case (j, w) => (j, cos(v, w)) }
        .minBy { case (j, c) => (-c, j) }._1
    }.toMap
    val want = top1.collect {
      case (a, b) if a < b && top1(b) == a => (a, b)
    }.toSeq.sorted
    assert(out.sorted == want, s"got ${out.size} pairs, want ${want.size}")
  }

  test("q269: reference segment has impact ratio 1 and no flag; ratios in (0, 1]") {
    val out = rows(AnalyticsQueries.q269.fn(spark, sf))
    val ref = out.find(r => r(0) == r(4)).get
    assert(ref(5).asInstanceOf[Double] == 1.0 && !ref(6).asInstanceOf[Boolean])
    out.foreach { r =>
      val ratio = r(5).asInstanceOf[Double]
      assert(ratio > 0 && ratio <= 1.0 + 1e-9, s"ratio out of range: $r")
      assert(r(6).asInstanceOf[Boolean] == (ratio < 0.8 - 1e-9) ||
        math.abs(ratio - 0.8) < 1e-6, s"flag inconsistent: $r")
    }
  }

  test("q270: Hill alpha matches a brute-force top-k computation") {
    val out = rows(AnalyticsQueries.q270.fn(spark, sf)).head
    val cents = Tables.load(spark, sf, "orders")
      .select(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
      .collect().map(_.getLong(0)).sorted.reverse.take(501)
    val xk1 = cents.last
    val used = cents.filter(_ > xk1)
    val sU = used.map(c => math.round(1e9 * math.log(c.toDouble / xk1))).sum
    val alpha = used.length / (sU / 1e9)
    assert(out(0).asInstanceOf[Long] == used.length.toLong)
    assert(out(1).asInstanceOf[Long] == xk1)
    assert(math.abs(out(2).asInstanceOf[Double] - alpha) < 1e-5, s"alpha $out vs $alpha")
  }

  test("q271: pair set matches a brute-force Levenshtein sweep over journeys") {
    val out = rows(AnalyticsQueries.q271.fn(spark, sf))
      .map(r => (r(0).asInstanceOf[Long], r(1).asInstanceOf[Long], r(4).asInstanceOf[Int]))
    val ev = Tables.load(spark, sf, "events")
      .select(col("user_id"), expr("unix_micros(ts)"), col("event_id"),
        substring(col("event_type"), 1, 1))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val jny = ev.groupBy(_._1).view.mapValues { es =>
      es.sortBy(e => (e._2, e._3)).take(10).map(_._4).mkString
    }.toMap
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val want = (for {
      (ua, ja) <- jny.toSeq; (ub, jb) <- jny.toSeq
      if ua < ub && ja.take(1) == jb.take(1)
      d = lev(ja, jb) if d <= 3
    } yield (ua, ub, d)).sortBy(t => (t._1, t._2))
    assert(out.sortBy(t => (t._1, t._2)) == want,
      s"got ${out.size} pairs, want ${want.size}")
  }

  test("q272: every burst day beats the median and runs are maximal") {
    val out = rows(AnalyticsQueries.q272.fn(spark, sf))
      .map(r => (r(0).asInstanceOf[String], r(1).asInstanceOf[Long],
        r(2).asInstanceOf[Long], r(3).asInstanceOf[Long], r(5).asInstanceOf[Long]))
    assert(out.nonEmpty, "rate-stable data still has above-median runs")
    val daily = Tables.load(spark, sf, "events")
      .groupBy(col("event_type"), expr("CAST(ts AS LONG) div 86400").as("d"))
      .agg(count(lit(1)).as("y"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(t => t._2 -> t._3).toMap).toMap
    out.foreach { case (et, s, e, n, med) =>
      assert(e - s + 1 == n, s"island not contiguous: $et $s..$e n=$n")
      (s to e).foreach(d => assert(daily(et)(d) > med, s"day $d not above median"))
      // maximality: neighbors outside the run are NOT above the median
      daily(et).get(s - 1).foreach(y => assert(y <= med, s"$et run not maximal at ${s - 1}"))
      daily(et).get(e + 1).foreach(y => assert(y <= med, s"$et run not maximal at ${e + 1}"))
    }
  }

  test("q273: WoE signs track bad-share vs good-share and IV sums the terms") {
    val out = rows(AnalyticsQueries.q273.fn(spark, sf))
    val tb = out.map(_(2).asInstanceOf[Long]).sum.toDouble
    val tg = out.map(_(3).asInstanceOf[Long]).sum.toDouble
    var iv = 0.0
    out.foreach { r =>
      val (bads, goods, woe) = (r(2).asInstanceOf[Long], r(3).asInstanceOf[Long],
        r(4).asInstanceOf[Double])
      val bs = bads / tb; val gs = goods / tg
      assert(math.signum(woe) == math.signum(bs - gs) || math.abs(bs - gs) < 1e-9,
        s"WoE sign inconsistent: $r")
      iv += (bs - gs) * woe
    }
    val ivOut = out.head(5).asInstanceOf[Double]
    assert(math.abs(ivOut - iv) < 1e-4, s"IV $ivOut vs $iv")
    assert(out.map(_(0).asInstanceOf[Int]).sorted == Seq(1, 2, 3, 4, 5))
  }

  test("q279: audit internally consistent — precision and MAE reproducible from q36's pairs") {
    val out = rows(AnalyticsQueries.q279.fn(spark, sf)).head
    val (n, above) = (out(0).asInstanceOf[Long], out(1).asInstanceOf[Long])
    val prec = out(2).asInstanceOf[Double]
    val mae = out(3).asInstanceOf[Double]
    assert(above <= n && prec >= 0.0 && prec <= 1.0)
    assert(mae >= 0.0 && mae <= 1.0)
    // q36 is this audit's candidate generator WITH the 0.2 verify: its
    // pair count must equal the audit's above-threshold count
    val q36n = rows(DataQueries.q36.fn(spark, sf)).size.toLong
    assert(q36n == above, s"q36 pairs $q36n vs audit above-0.2 $above")
    assert(math.abs(prec - above.toDouble / n) < 1e-6)
  }

  test("q252: NDCG bounded by 1, MRR in [0,1], and a relevant hit implies positive DCG") {
    val out = rows(AnalyticsQueries.q252.fn(spark, sf))
    assert(out.nonEmpty)
    out.foreach { r =>
      val dcg = r(2).asInstanceOf[Double]
      val mrr = r(4).asInstanceOf[Double]
      assert(dcg >= 0.0)
      if (r(3) != null) {
        val ndcg = r(3).asInstanceOf[Double]
        assert(ndcg >= 0.0 && ndcg <= 1.0 + 1e-9, s"ndcg out of range: $r")
      }
      assert(mrr >= 0.0 && mrr <= 1.0 + 1e-9, s"mrr out of range: $r")
      assert((mrr > 0) == (dcg > 0), s"mrr/dcg inconsistent: $r")
    }
  }
}

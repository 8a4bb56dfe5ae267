package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

class EventQueriesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q205: sweep-line peak equals brute-force interval stabbing") {
    // rebuild the q55 sessions independently, split at midnight, then
    // evaluate concurrency literally at every session start (the max
    // of a +1/-1 sweep is always attained at a start instant)
    val ev = graft.Tables.load(spark, sf, "events")
      .select(col("user_id"), col("event_id"), col("ts").cast("long").as("sec"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val sessions = ev.groupBy(_._1).values.flatMap { rows =>
      val sorted = rows.sortBy(r => (r._3, r._2))
      val bounds = collection.mutable.ArrayBuffer.empty[(Long, Long)]
      sorted.foreach { case (_, _, sec) =>
        if (bounds.nonEmpty && sec - boundsLastEnd(bounds) <= 1800)
          bounds(bounds.length - 1) = (bounds.last._1, sec)
        else bounds += ((sec, sec))
      }
      bounds
    }.toSeq
    // split at midnight
    val perDay = sessions.flatMap { case (s, e) =>
      (s / 86400 to e / 86400).map { day =>
        (day, math.max(s, day * 86400), math.min(e, day * 86400 + 86399))
      }
    }
    val expected = perDay.groupBy(_._1).toSeq.map { case (day, iv) =>
      val candidates = iv.map(_._2).distinct.sorted
      val best = candidates.map { t =>
        (iv.count(x => x._2 <= t && t <= x._3), t)
      }.maxBy { case (c, t) => (c, -t) } // max concurrency, earliest t
      (day, best._1.toLong, best._2)
    }.sortBy(_._1)
    val actual = EventQueries.q205.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(actual == expected)
  }

  private def boundsLastEnd(b: collection.mutable.ArrayBuffer[(Long, Long)]): Long =
    b.last._2

  test("q206: attribution credits replay and sum to exactly 1e6 per conversion") {
    val ev = graft.Tables.load(spark, sf, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("ts").cast("long").as("sec"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val byUser = ev.groupBy(_._1)
    val perType = collection.mutable.Map.empty[String, (Long, Long, Long)]
    var conversionsChecked = 0
    byUser.values.foreach { rows =>
      val purchases = rows.filter(_._3 == "purchase")
      val touches = rows.filter(r => r._3 == "click" || r._3 == "view")
      purchases.foreach { case (_, pid, _, psec) =>
        val win = touches.filter(t => t._4 >= psec - 7 * 86400 && t._4 < psec)
          .sortBy(t => (t._4, t._2))
        if (win.nonEmpty) {
          val k = win.length
          val credits = win.zipWithIndex.map { case (t, idx) =>
            val c =
              if (k == 1) 1000000L
              else if (k == 2) 500000L
              else if (idx == 0) 400000L + 200000L % (k - 2)
              else if (idx == k - 1) 400000L
              else 200000L / (k - 2)
            (t._3, c)
          }
          assert(credits.map(_._2).sum == 1000000L,
            s"conversion $pid credits must sum to 1e6: $credits")
          conversionsChecked += 1
          credits.foreach { case (ty, c) =>
            val (cm, nt, _) = perType.getOrElse(ty, (0L, 0L, 0L))
            perType(ty) = (cm + c, nt + 1, 0L)
          }
        }
      }
    }
    assert(conversionsChecked > 0)
    val actual = EventQueries.q206.fn(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(actual.keySet == perType.keySet)
    perType.foreach { case (ty, (cm, nt, _)) =>
      assert(actual(ty) == ((cm, nt)), s"$ty: ${actual(ty)} != ($cm, $nt)")
    }
  }

  test("q212: closed-form CUSUM equals the literal recurrence replay") {
    val daily = graft.Tables.load(spark, sf, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("y"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    val expected = daily.groupBy(_._1).toSeq.flatMap { case (ty, rows) =>
      val sorted = rows.sortBy(_._2)
      val n = sorted.length.toLong
      val s = sorted.map(_._3).sum
      val slack = s / 4 // s >= 0 so truncating == flooring
      var hi = 0L; var lo = 0L
      sorted.map { case (_, day, y) =>
        val dev = n * y - s
        hi = math.max(0L, hi + dev - slack)
        lo = math.max(0L, lo - dev - slack)
        (ty, day, y, dev, hi, lo, hi > s, lo > s)
      }
    }.sortBy(t => (t._1, t._2))
    val actual = EventQueries.q212.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6), r.getBoolean(7))).toSeq
    assert(actual == expected)
    // the detector must actually fire somewhere on this data, or the
    // spec is vacuous
    assert(actual.exists(r => r._7 || r._8))
  }

  test("q213: seasonal decomposition replays trend/seasonal/residual exactly") {
    val daily = graft.Tables.load(spark, sf, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("y"))
      .collect().map(r => (r.getString(0), r.getDate(1), r.getLong(2)))
    def tdiv(x: Long, d: Long): Long = if (x < 0) -((-x) / d) else x / d
    val expected = daily.groupBy(_._1).toSeq.flatMap { case (ty, rows) =>
      val sorted = rows.sortBy(_._2.toString)
      val det = sorted.indices.collect {
        case i if i >= 3 && i <= sorted.length - 4 =>
          val s7 = (i - 3 to i + 3).map(j => sorted(j)._3).sum
          val trend = (1000000L * s7) / 7
          val d = sorted(i)._2
          // java.sql.Date -> day-of-week 1=Sunday..7=Saturday (Spark's)
          val dow = d.toLocalDate.getDayOfWeek.getValue % 7 + 1
          (d.toString, sorted(i)._3, trend, 1000000L * sorted(i)._3 - trend, dow)
      }
      val seas = det.groupBy(_._5).view.mapValues { g =>
        tdiv(g.map(_._4).sum, g.length.toLong)
      }.toMap
      det.map { case (day, y, trend, dm, dow) =>
        (ty, day, y, trend, seas(dow), dm - seas(dow))
      }
    }.sortBy(t => (t._1, t._2))
    val actual = EventQueries.q213.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(actual == expected)
  }

  test("q215: signed squared cross-correlation replays from the daily series") {
    val daily = graft.Tables.load(spark, sf, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("y"))
      .collect().map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getLong(2)))
    val byType = daily.groupBy(_._1).view.mapValues(_.map(r => r._2 -> r._3).toMap).toMap
    val types = byType.keys.toSeq.sorted
    val expected = (for {
      ta <- types; tb <- types if ta != tb; lag <- 0 to 7
    } yield {
      val pairs = byType(ta).toSeq.flatMap { case (d, x) =>
        byType(tb).get(d.plusDays(lag)).map(yv => (x, yv))
      }
      val n = BigInt(pairs.length)
      val sx = BigInt(pairs.map(_._1).sum); val sy = BigInt(pairs.map(_._2).sum)
      val sxy = pairs.map { case (x, y) => BigInt(x) * y }.sum
      val sxx = pairs.map { case (x, _) => BigInt(x) * x }.sum
      val syy = pairs.map { case (_, y) => BigInt(y) * y }.sum
      val cov = n * sxy - sx * sy
      val vx = n * sxx - sx * sx; val vy = n * syy - sy * sy
      val corr2 = if (vx == 0 || vy == 0) None
        else Some(((BigInt(1000000000000L) * cov * cov / (vx * vy))
          * (if (cov < 0) -1 else 1)).toLong)
      (ta, tb, lag, n.toLong, cov.toLong, corr2)
    }).filter(_._4 > 0).sortBy(t => (t._1, t._2, t._3))
    val actual = EventQueries.q215.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getLong(3),
        r.getLong(4), if (r.isNullAt(5)) None else Some(r.getLong(5)))).toSeq
    assert(actual == expected)
    // Cauchy-Schwarz: |corr²| never exceeds 1 (1e12 pico-units)
    actual.flatMap(_._6).foreach(v => assert(math.abs(v) <= 1000000000000L))
  }

  test("q219: trigram support equals brute-force subsequence counting") {
    val ev = graft.Tables.load(spark, sf, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("ts").cast("long").as("sec"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val support = collection.mutable.Map.empty[(String, String, String), (Long, Set[Long])]
    ev.groupBy(_._1).foreach { case (uid, rows) =>
      val sorted = rows.sortBy(r => (r._4, r._2)).map(_._3)
      sorted.sliding(3).filter(_.length == 3).foreach { w =>
        val k = (w(0), w(1), w(2))
        val (c, us) = support.getOrElse(k, (0L, Set.empty[Long]))
        support(k) = (c + 1, us + uid)
      }
    }
    val expected = support.toSeq
      .map { case ((a, b, c), (n, us)) => (a, b, c, n, us.size.toLong) }
      .sortBy(t => (-t._4, t._1, t._2, t._3)).take(20)
    val actual = EventQueries.q219.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(actual == expected)
  }

  test("q220: rolling 7-day actives equal a literal trailing-window recount") {
    val ud = graft.Tables.load(spark, sf, "events")
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val days = ud.map(_._2).distinct.sorted(Ordering.by((d: java.time.LocalDate) => d.toEpochDay))
    val lo = days.head
    val expected = days.filter(d => !d.isBefore(lo.plusDays(6))).map { d =>
      val dau = ud.count(_._2 == d).toLong
      val wau = ud.filter(u => !u._2.isAfter(d) && !u._2.isBefore(d.minusDays(6)))
        .map(_._1).distinct.length.toLong
      (d.toString, dau, wau, 1000000L * dau / wau)
    }.toSeq
    val actual = EventQueries.q220.fn(spark, sf).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(actual == expected)
    // DAU never exceeds WAU; stickiness in (0, 1e6]
    actual.foreach(r => assert(r._2 <= r._3 && r._4 > 0 && r._4 <= 1000000L))
  }

  test("q227: cohort conversion quantiles replay from a sorted brute-force list") {
    val ev = graft.Tables.load(spark, sf, "events")
      .select(col("user_id"), col("event_type"), col("ts").cast("long").as("sec"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val conv = ev.groupBy(_._1).values.flatMap { rows =>
      val v = rows.filter(_._2 == "view").map(_._3).minOption
      val p = rows.filter(_._2 == "purchase").map(_._3).minOption
      (v, p) match {
        case (Some(a), Some(b)) if b > a =>
          val d = java.time.Instant.ofEpochSecond(a)
            .atZone(java.time.ZoneOffset.UTC).toLocalDate
          val monday = d.minusDays((d.getDayOfWeek.getValue - 1).toLong)
          Some((monday.toString, (b - a) / 3600))
        case _ => None
      }
    }.toSeq
    val expected = conv.groupBy(_._1).toSeq.map { case (cohort, rows) =>
      val tts = rows.map(_._2).sorted
      val n = tts.length
      def q(mult: Int, num: Int): Long =
        tts(tts.indices.find(i => mult * (i + 1) >= num * n).get)
      (cohort, n.toLong, q(2, 1), q(10, 9))
    }.sortBy(_._1)
    val actual = EventQueries.q227.fn(spark, sf).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(actual == expected)
  }

  test("q228: backtest accuracy replays; pairs straddling the cutoff are dropped") {
    val ev = graft.Tables.load(spark, sf, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("ts").cast("long").as("sec"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val pairs = ev.groupBy(_._1).values.toSeq.flatMap { rows =>
      val s = rows.sortBy(r => (r._4, r._2))
      s.zip(s.drop(1)).map { case (a, b) => (a._3, b._3, a._4, b._4) }
    }
    val lo = pairs.map(_._3).min
    val hi = pairs.map(_._4).max
    val cut = lo + 4 * (hi - lo) / 5
    val train = pairs.filter(_._4 < cut)
    val test = pairs.filter(_._3 >= cut)
    // straddlers exist and belong to neither split
    assert(pairs.exists(p => p._4 >= cut && p._3 < cut))
    val pred = train.groupBy(_._1).view.mapValues { g =>
      g.groupBy(_._2).view.mapValues(_.size).toSeq
        .sortBy { case (to, c) => (-c, to) }.head._1
    }.toMap
    val expected = test.groupBy(_._1).toSeq.collect {
      case (from, rows) if pred.contains(from) =>
        val correct = rows.count(_._2 == pred(from)).toLong
        (from, pred(from), rows.length.toLong, correct,
          1000000L * correct / rows.length)
    }.sortBy(_._1)
    val actual = EventQueries.q228.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(actual == expected)
  }

  test("q229: rolling median is the 4th order statistic and spike-resistant") {
    val daily = graft.Tables.load(spark, sf, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("y"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    val expected = daily.groupBy(_._1).toSeq.flatMap { case (ty, rows) =>
      val sorted = rows.sortBy(_._2)
      sorted.indices.collect {
        case i if i >= 3 && i <= sorted.length - 4 =>
          val med = (i - 3 to i + 3).map(j => sorted(j)._3).sorted.apply(3)
          (ty, sorted(i)._2, sorted(i)._3, med)
      }
    }.sortBy(t => (t._1, t._2))
    val actual = EventQueries.q229.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2), r.getLong(3))).toSeq
    assert(actual == expected)
  }

  test("q233: entry/exit grid replays from brute-force sessionization") {
    val ev = graft.Tables.load(spark, sf, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("ts").cast("long").as("sec"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val sessions = ev.groupBy(_._1).values.toSeq.flatMap { rows =>
      val sorted = rows.sortBy(r => (r._4, r._2))
      val out = collection.mutable.ArrayBuffer.empty[Vector[(Long, Long, String, Long)]]
      sorted.foreach { e =>
        if (out.nonEmpty && e._4 - out.last.last._4 <= 1800)
          out(out.length - 1) = out.last :+ e
        else out += Vector(e)
      }
      out
    }
    val grid = sessions.groupBy(s => (s.head._3, s.last._3)).toSeq
      .map { case ((en, ex), ss) =>
        (en, ex, ss.length.toLong, ss.count(_.length == 1).toLong)
      }
    val tot = grid.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val expected = grid.map { case (en, ex, n, b) =>
      (en, ex, n, b, 1000000L * n / tot(en))
    }.sortBy(t => (t._1, t._2))
    val actual = EventQueries.q233.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(actual == expected)
    // every bounce is a same-type cell, and shares sum to ~1e6 per entry
    actual.filter(r => r._4 > 0 && r._3 == r._4)
      .foreach(r => assert(r._1 == r._2 || r._4 < r._3))
    actual.groupBy(_._1).values.foreach { g =>
      val s = g.map(_._5).sum
      assert(s <= 1000000L && s > 1000000L - g.length,
        s"shares sum $s for ${g.head._1}")
    }
  }

  test("q235: features use only pre-cutoff events; labels only post-cutoff") {
    val ev = graft.Tables.load(spark, sf, "events")
      .select(col("user_id"), col("event_type"), col("value"),
        col("ts").cast("long").as("sec"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
    val lo = ev.map(_._4).min; val hi = ev.map(_._4).max
    val cut = lo + 3 * (hi - lo) / 5
    val expected = ev.filter(_._4 < cut).groupBy(_._1).toSeq.map { case (u, rows) =>
      val n7 = rows.count(_._4 >= cut - 7 * 86400).toLong
      val n30 = rows.count(_._4 >= cut - 30 * 86400).toLong
      val pc = rows.filter(_._2 == "purchase")
        .map(r => BigDecimal(r._3 * 100).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).sum
      val rec = (cut - rows.map(_._4).max) / 3600
      val label = if (ev.exists(e => e._1 == u && e._2 == "purchase" &&
        e._4 >= cut && e._4 < cut + 3 * 86400)) 1L else 0L
      (u, n7, n30, pc, rec, label)
    }.sortBy(_._1)
    val actual = EventQueries.q235.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(actual == expected)
    // leakage guard: both label classes must occur, and every feature
    // row must belong to a user seen before the cutoff
    assert(actual.exists(_._6 == 1L) && actual.exists(_._6 == 0L))
    val preUsers = ev.filter(_._4 < cut).map(_._1).toSet
    actual.foreach(r => assert(preUsers.contains(r._1)))
  }

  test("q236: skip-gram supports equal brute-force two-apart counting") {
    val ev = graft.Tables.load(spark, sf, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("ts").cast("long").as("sec"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val sup = collection.mutable.Map.empty[(String, String), (Long, Set[Long])]
    ev.groupBy(_._1).foreach { case (uid, rows) =>
      val s = rows.sortBy(r => (r._4, r._2)).map(_._3)
      s.zip(s.drop(2)).foreach { p =>
        val (c, us) = sup.getOrElse(p, (0L, Set.empty[Long]))
        sup(p) = (c + 1, us + uid)
      }
    }
    val expected = sup.toSeq.map { case ((a, b), (c, us)) => (a, b, c, us.size.toLong) }
      .sortBy(t => (-t._3, t._1, t._2)).take(20)
    val actual = EventQueries.q236.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(actual == expected)
  }

  test("q208: transition matrix equals brute-force consecutive-pair counts") {
    val ev = graft.Tables.load(spark, sf, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("ts").cast("long").as("sec"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val counts = collection.mutable.Map.empty[(String, String), Long]
    ev.groupBy(_._1).values.foreach { rows =>
      val sorted = rows.sortBy(r => (r._4, r._2)).map(_._3)
      sorted.zip(sorted.drop(1)).foreach { p =>
        counts(p) = counts.getOrElse(p, 0L) + 1
      }
    }
    val tot = counts.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val expected = counts.toSeq.map { case ((a, b), c) =>
      (a, b, c, 1000000L * c / tot(a))
    }.sortBy(t => (t._1, t._2))
    val actual = EventQueries.q208.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(actual == expected)
  }
}

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

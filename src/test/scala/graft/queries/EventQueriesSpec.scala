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
}

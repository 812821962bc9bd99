package graft

import graft.sources.Tables
import graft.streaming.Streaming
import org.apache.spark.sql.functions._

class StreamingSpec extends SparkSuite {

  private lazy val nEvents = Tables.events(spark, sf).count()

  test("tumbling windows partition the stream (each event in exactly one window)") {
    val agg = Streaming.tumbling(spark, sf).collect()
    assert(agg.map(_.getLong(2)).sum == nEvents)
  }

  test("sliding windows double-count with slide = width/2") {
    val agg = Streaming.sliding(spark, sf).collect()
    assert(agg.map(_.getLong(1)).sum == 2 * nEvents)
  }

  test("streaming dedup equals batch DISTINCT") {
    val streamed = Streaming.streamDedup(spark, sf).count()
    val batch = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"),
        date_trunc("minute", col("ts")).as("m")).distinct().count()
    assert(streamed == batch)
  }

  test("sessions cover all events and never overlap per user") {
    val s = Streaming.sessionize(spark, sf).collect()
    assert(s.map(_.getLong(3)).sum == nEvents)
    s.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val sorted = rows.map(r => (r.getString(1), r.getString(2))).sortBy(_._1)
      sorted.sliding(2).foreach {
        case Array((_, prevEnd), (nextStart, _)) =>
          assert(nextStart >= prevEnd, "sessions must not overlap")
        case _ =>
      }
    }
  }

  test("mapGroupsWithState per-user stats equal a batch aggregate") {
    val st = Streaming.statefulUserStats(spark, sf).collect()
    val batch = Tables.events(spark, sf).groupBy("user_id")
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(st.map(r => r.getLong(0) -> r.getLong(1)).toMap == batch)
  }
}

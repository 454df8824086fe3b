package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** Streaming semantics (SURVEY.md §5.5): watermark late-row drop via
  * MemoryStream injection, and session-window gap boundaries.
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("watermark drops rows later than the delay after watermark advances") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val agg = mem.toDF().toDF("ts", "k")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("k"))
      .count()
    val q = agg.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("wm_test").start()

    // batch 1: on-time rows up to 12:00 → watermark becomes 11:50
    mem.addData((ts("2024-01-01 10:10:00"), "a"), (ts("2024-01-01 12:00:00"), "a"))
    q.processAllAvailable()
    // batch 2: a late row in the 10:00 window (before watermark) + fresh row
    mem.addData((ts("2024-01-01 10:20:00"), "a"), (ts("2024-01-01 13:00:00"), "a"))
    q.processAllAvailable()
    // batch 3: advance watermark past 13:00 so remaining windows finalize
    mem.addData((ts("2024-01-01 15:00:00"), "a"))
    q.processAllAvailable()
    q.stop()

    val counts = spark.table("wm_test")
      .select(col("window.start").cast("string"), col("count"))
      .as[(String, Long)].collect().toMap
    // the late 10:20 row must NOT be counted: 10:00 window closed at count=1
    assert(counts("2024-01-01 10:00:00") === 1L)
    assert(counts("2024-01-01 12:00:00") === 1L)
  }

  test("session window: gap > 30min opens a new session, <= 30min extends it") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 10:29:59")), // extends (gap < 30min)
      (1L, ts("2024-01-01 11:00:00")), // 30:01 gap → new session
      (2L, ts("2024-01-01 10:00:00")),
      (2L, ts("2024-01-01 10:30:00"))  // exactly the gap → still merges
    ).toDF("user_id", "ts")
    val sessions = df.groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .count()
      .select(col("user_id"), col("count"))
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(sessions(1L) === Seq(1L, 2L)) // sessions of 2 events and 1 event
    assert(sessions(2L) === Seq(2L)) // boundary-equal gap merges (inclusive)
  }

  test("AvailableNow file stream over staged events equals batch counts") {
    val staged = ops.Streaming.stage(SparkTestBase.sfDir, 1)
    val stream = ops.Streaming.eventsStream(spark, staged)
      .groupBy(col("event_type")).count()
    val q = stream.writeStream.outputMode("complete")
      .format("memory").queryName("avail_now_test")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("avail_now_test").as[(String, Long)].collect().toMap
    val batch = Tables.events(spark, SparkTestBase.sfDir)
      .groupBy(col("event_type")).count().as[(String, Long)].collect().toMap
    assert(streamed === batch)
  }
}

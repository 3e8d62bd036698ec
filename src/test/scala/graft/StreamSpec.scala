package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming semantics that no batch oracle can see (SURVEY §5.2 #4):
  * batch/stream window equivalence, watermark lateness drop across
  * batches, stateful dedup within watermark. */
class StreamSpec extends SparkSuite {

  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  test("tumbling stream counts equal the batch answer after drain") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val data = Seq(
      (ts(1), "a"), (ts(5), "b"), (ts(31), "a"), (ts(35), "a"),
      (ts(61), "b"), (ts(65), "a"), (ts(95), "b"))
    mem.addData(data: _*)
    val df = mem.toDF().toDF("ts", "k")
    val agg = df.groupBy(window(col("ts"), "30 minutes"), col("k"))
      .agg(count(lit(1)).as("n"))
    val qy = agg.writeStream.outputMode("complete")
      .format("memory").queryName("spec_tumbling")
      .trigger(Trigger.AvailableNow()).start()
    qy.awaitTermination()
    val streamed = spark.table("spec_tumbling")
      .select(col("window.start").as("w"), col("k"), col("n"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1),
        r.getLong(2))).toSet
    val batch = data.toDF("ts", "k")
      .groupBy(window(col("ts"), "30 minutes"), col("k"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w"), col("k"), col("n"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1),
        r.getLong(2))).toSet
    assert(streamed === batch)
  }

  test("watermark drops late rows across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val agg = mem.toDF().toDF("ts", "k")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n"))
    val qy = agg.writeStream.outputMode("append")
      .format("memory").queryName("spec_watermark").start()
    // batch 1: rows in window [0, 30); watermark advances to 55-10=45
    mem.addData((ts(1), "a"), (ts(5), "b"), (ts(55), "c"))
    qy.processAllAvailable()
    // batch 2: a LATE row at minute 2 (before watermark 45) must be
    // dropped; window [0,30) already closed and emitted
    mem.addData((ts(2), "late"), (ts(90), "d"))
    qy.processAllAvailable()
    qy.stop()
    val out = spark.table("spec_watermark")
      .select(col("window.start").as("w"), col("n"))
      .collect().map(r => (r.getTimestamp(0), r.getLong(1))).toMap
    // window [0,30) emitted with 2 rows — the late third row never counted
    assert(out(ts(0)) === 2L)
  }

  test("dropDuplicatesWithinWatermark suppresses double triggers") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long)]
    val dedup = mem.toDF().toDF("ts", "trigger_id")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("trigger_id")
    val qy = dedup.writeStream.outputMode("append")
      .format("memory").queryName("spec_dedup").start()
    // the double-trigger idiom: same trigger_id twice within ε
    mem.addData((ts(1), 7L), (ts(1), 7L), (ts(2), 8L))
    qy.processAllAvailable()
    mem.addData((ts(3), 7L), (ts(4), 9L)) // still within watermark → dup
    qy.processAllAvailable()
    qy.stop()
    val ids = spark.table("spec_dedup")
      .collect().map(_.getAs[Long]("trigger_id")).toSeq
    assert(ids.sorted === Seq(7L, 8L, 9L))
  }

  test("registry streaming queries settle to their batch equivalents") {
    val settled = q("q_stream_source").collect()
      .map(r => (r.getString(0), r.getAs[Long]("n"))).toMap
    val batch = Tables.t(spark, sf0, "events")
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getAs[Long]("n"))).toMap
    assert(settled === batch)
  }

  test("reset counter: state survives batches, sentinel resets it") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val mem = MemoryStream[(Long, Long, Long, String)]
    val counted = mem.toDS()
      .groupByKey(_._3)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (rb: Long, it: Iterator[(Long, Long, Long, String)],
          state: GroupState[Long]) =>
          var n = state.getOption.getOrElse(0L)
          val rows = it.toSeq.sortBy(r => (r._2, r._1)).map { r =>
            if (r._4 == "signup") n = 0L else n += 1L
            (rb, r._1, n)
          }
          state.update(n)
          rows.iterator
      }
    val qy = counted.toDF("rb", "event_id", "event_cnt")
      .writeStream.outputMode("append")
      .format("memory").queryName("spec_reset").start()
    mem.addData((1L, 10L, 0L, "click"), (2L, 20L, 0L, "view"))
    qy.processAllAvailable() // state now 2
    mem.addData((3L, 30L, 0L, "signup"), (4L, 40L, 0L, "click"))
    qy.processAllAvailable() // sentinel resets, then counts from 1
    qy.stop()
    val got = spark.table("spec_reset")
      .collect().map(r => r.getAs[Long]("event_id") ->
        r.getAs[Long]("event_cnt")).toMap
    assert(got === Map(1L -> 1L, 2L -> 2L, 3L -> 0L, 4L -> 1L))
  }

  test("session windows merge bursts within the gap") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long)]
    mem.addData((ts(1), 1L), (ts(10), 1L), (ts(70), 1L), (ts(75), 1L),
      (ts(5), 2L))
    val agg = mem.toDF().toDF("ts", "user_id")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
    val qy = agg.writeStream.outputMode("complete")
      .format("memory").queryName("spec_session")
      .trigger(Trigger.AvailableNow()).start()
    qy.awaitTermination()
    val sessions = spark.table("spec_session")
      .select(col("user_id"), col("n")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // user 1: two sessions (minutes 1-10 burst, 70-75 burst); user 2: one
    assert(sessions.count(_._1 == 1L) === 2)
    assert(sessions.filter(_._1 == 1L).map(_._2).sorted === Seq(2L, 2L))
    assert(sessions.count(_._1 == 2L) === 1)
  }
}

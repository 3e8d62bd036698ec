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

  test("stream-stream left outer join emits watermark-proven null rows") {
    val settled = q("q_stream_join_outer").collect()
      .map(r => (r.getAs[Long]("e_id"),
        Option(r.get(1)).map(_.asInstanceOf[Long]))).toSeq.sorted
    // the batch left join over the same cutoff is the ground truth
    val e = Tables.t(spark, sf0, "events")
      .filter(col("event_type") === "error" &&
        col("ts") < lit("2024-01-25").cast("timestamp_ntz"))
      .select(col("event_id").as("e_id"), col("user_id").as("e_user"),
        col("ts").as("e_ts"))
    val c = Tables.t(spark, sf0, "events")
      .filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
    val batch = e.join(c,
        expr("""e_user = c_user AND
                c_ts >= e_ts - INTERVAL 1 HOUR AND c_ts <= e_ts"""),
        "left_outer")
      .select(col("e_id"), col("c_id")).collect()
      .map(r => (r.getAs[Long]("e_id"),
        Option(r.get(1)).map(_.asInstanceOf[Long]))).toSeq.sorted
    assert(settled === batch)
    // and the outer semantics actually exercised: some rows unmatched
    assert(settled.exists(_._2.isEmpty), "no null rows — cutoff too tight?")
    assert(settled.exists(_._2.nonEmpty), "no matched rows")
  }

  test("upsert sink: multi-batch merge keeps latest per key; replays are no-ops") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_spec_upsert").toFile.getAbsolutePath
    def mk(rows: (Long, Long, String, Double)*) =
      rows.toDF("user_id", "event_id", "ts_s", "value")
        .select(col("user_id"), col("event_id"),
          col("ts_s").cast("timestamp_ntz").as("ts"), col("value"))
    // batch 0: users 1 and 2
    streaming.StreamOps.upsertBatch(spark, dir, mk(
      (1L, 10L, "2024-01-01 10:00:00", 1.0),
      (2L, 11L, "2024-01-01 11:00:00", 2.0)), 0L)
    // batch 1: newer row for user 1, first row for user 3
    streaming.StreamOps.upsertBatch(spark, dir, mk(
      (1L, 20L, "2024-01-02 10:00:00", 5.0),
      (3L, 21L, "2024-01-02 11:00:00", 3.0)), 1L)
    // REPLAY of batch 1 with different (poisoned) data: must be a no-op
    streaming.StreamOps.upsertBatch(spark, dir, mk(
      (1L, 99L, "2024-01-09 10:00:00", 99.0)), 1L)
    val got = spark.read.parquet(s"$dir/current")
      .collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("event_id"), r.getAs[Double]("value"))).toMap
    assert(got === Map(
      1L -> (20L, 5.0), 2L -> (11L, 2.0), 3L -> (21L, 3.0)))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("binary .dat stream: multi-file arrival decodes across micro-batches") {
    // two .dat blobs, each holding 13-byte (us, word) records; with
    // maxFilesPerTrigger=1 each file is its own micro-batch, so the
    // settled counts prove state accumulates across arrivals.
    val dir = java.nio.file.Files
      .createTempDirectory("graft_spec_dat").toFile
    def write(name: String, recs: Seq[(Long, Long)]): Unit = {
      val os = new java.io.BufferedOutputStream(
        new java.io.FileOutputStream(new java.io.File(dir, name)))
      try recs.foreach { case (us, wd) =>
        var sh = 56
        while (sh >= 0) { os.write(((us >> sh) & 0xFF).toInt); sh -= 8 }
        sh = 32
        while (sh >= 0) { os.write(((wd >> sh) & 0xFF).toInt); sh -= 8 }
      } finally os.close()
    }
    // words: kind in bits 31-32 (non-zero = kept), pix_row in 27-30
    def word(kind: Long, pixRow: Long): Long =
      (kind << 31) | (pixRow << 27)
    val us0 = 1704067200000000L // 2024-01-01 00:00:00 UTC in micros
    write("a.dat", Seq(
      (us0, word(2, 3)), (us0 + 1000000L, word(2, 3)),
      (us0, word(0, 5)))) // filler — suppressed
    write("b.dat", Seq(
      (us0, word(2, 3)), (us0 + 3600000000L, word(1, 7))))
    val binSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("path",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("modificationTime",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("length",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("content",
        org.apache.spark.sql.types.BinaryType)))
    val agg = spark.readStream.format("binaryFile").schema(binSchema)
      .option("maxFilesPerTrigger", "1")
      .load(dir.getAbsolutePath)
      .select(col("content"),
        (length(col("content")) / 13).cast("long").as("n"))
      .select(col("content"),
        explode(expr("sequence(CAST(0 AS BIGINT), n - 1)")).as("i"))
      .select(
        expr("""CAST(conv(hex(substring(content,
                  CAST(i * 13 + 1 AS INT), 8)), 16, 10) AS BIGINT)""")
          .as("us"),
        expr("""CAST(conv(hex(substring(content,
                  CAST(i * 13 + 9 AS INT), 5)), 16, 10) AS BIGINT)""")
          .as("word"))
      .withColumn("ts", expr("CAST(timestamp_micros(us) AS TIMESTAMP_NTZ)"))
      .filter(expr("shiftright(word, 31) & 3") =!= 0)
      .groupBy(window(col("ts"), "1 hour"),
        expr("shiftright(word, 27) & 15").as("pix_row"))
      .agg(count(lit(1)).as("n_hits"))
    val qy = agg.writeStream.outputMode("complete")
      .format("memory").queryName("spec_binary_raw")
      .trigger(Trigger.AvailableNow()).start()
    qy.awaitTermination()
    val batches = qy.recentProgress.count(_.numInputRows > 0)
    assert(batches >= 2, s"expected >=2 micro-batches, saw $batches")
    val res = spark.table("spec_binary_raw")
      .select(unix_micros(col("window.start").cast("timestamp"))
          .divide(lit(1000000L)).cast("long").as("w"),
        col("pix_row"), col("n_hits"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val h0 = us0 / 1000000L
    assert(res === Set(
      (h0, 3L, 3L),        // 2 hits from a.dat + 1 from b.dat, filler dropped
      (h0 + 3600L, 7L, 1L))) // the header word an hour later
    org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("reset counter: multi-batch, 4 boards, cross-day carries") {
    implicit val sqlCtx = spark.sqlContext
    val day = 86400000000L
    // (event_id, us, rb, event_type): 4 boards, 3 days, resets
    // interleaved; split across two MemoryStream batches (ts-ordered
    // per key across batches, the file-arrival contract).
    val batch1 = Seq(
      (1L, 10L, 0L, "click"), (2L, 20L, 0L, "view"),
      (3L, 15L, 1L, "click"),
      (4L, day + 5L, 2L, "click"),
      (5L, 30L, 3L, "signup"))
    val batch2 = Seq(
      (6L, 40L, 0L, "signup"), (7L, 50L, 0L, "click"),
      (8L, day + 25L, 1L, "click"),
      (9L, day + 35L, 2L, "view"),
      (10L, 45L, 3L, "click"),
      (11L, 2 * day + 7L, 0L, "click"))
    val mem = MemoryStream[(Long, Long, Long, String)]
    val qy = streaming.StreamOps.resetCounterLocal(mem.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("spec_reset").start()
    mem.addData(batch1: _*)
    qy.processAllAvailable() // state persists per (rb, day) across batches
    mem.addData(batch2: _*)
    qy.processAllAvailable()
    qy.stop()
    val got = streaming.StreamOps.stitchCarries(spark, "spec_reset")
      .collect().map(r => r.getAs[Long]("event_id") ->
        r.getAs[Long]("event_cnt")).toMap
    // reference: one sequential scan per board over the full tape
    val expected = (batch1 ++ batch2).groupBy(_._3).flatMap {
      case (_, rows) =>
        var n = 0L
        rows.sortBy(r => (r._2, r._1)).map { r =>
          if (r._4 == "signup") n = 0L else n += 1L
          r._1 -> n
        }
    }.toMap
    assert(got === expected)
    // cross-day carry specifically: board 0's day-3 row continues the
    // count that survived the day-1 reset (1 after reset + 1 = 2)
    assert(got(11L) === 2L)
  }

  test("stateful dedup runs on the RocksDB state store provider") {
    implicit val sqlCtx = spark.sqlContext
    val saved = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[(Timestamp, Long)]
      val dedup = mem.toDF().toDF("ts", "trigger_id")
        .withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark("trigger_id")
      val qy = dedup.writeStream.outputMode("append")
        .format("memory").queryName("spec_rocks").start()
      mem.addData((ts(1), 1L), (ts(1), 1L), (ts(2), 2L))
      qy.processAllAvailable()
      mem.addData((ts(3), 1L), (ts(4), 3L))
      qy.processAllAvailable()
      qy.stop()
      val ids = spark.table("spec_rocks")
        .collect().map(_.getAs[Long]("trigger_id")).sorted
      assert(ids.toSeq === Seq(1L, 2L, 3L))
    } finally saved match {
      case Some(v) =>
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None =>
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("checkpointed aggregation state survives a query restart") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = s"${sys.props("java.io.tmpdir")}/graft_ckpt_restart"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    val mem = MemoryStream[(Timestamp, Long)]
    def agg = mem.toDF().toDF("ts", "rb")
      .groupBy(col("rb")).agg(count(lit(1)).as("n"))
    def start() = agg.writeStream.outputMode("complete")
      .format("memory").queryName("spec_ckpt")
      .option("checkpointLocation", ckpt).start()
    val q1 = start()
    mem.addData((ts(1), 0L), (ts(2), 1L), (ts(3), 0L))
    q1.processAllAvailable()
    q1.stop() // simulated failure/redeploy
    val q2 = start() // same checkpoint → counters resume, not reset
    mem.addData((ts(4), 0L), (ts(5), 1L))
    q2.processAllAvailable()
    q2.stop()
    val counts = spark.table("spec_ckpt")
      .collect().map(r => r.getAs[Long]("rb") -> r.getAs[Long]("n")).toMap
    assert(counts === Map(0L -> 3L, 1L -> 2L))
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

  test("stream-static decontamination: multi-batch arrival matches batch, " +
    "bloom-pruned probe per batch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // corpus: ids 0,10,20 hold texts A,B,C; stream: 5 docs across TWO
    // micro-batches — a self-match (id 0), a true dup of A (id 9),
    // a dup of B (id 19), and two novel texts
    val corpus = Seq(
      (0L, "aaa bbb ccc", "en", "s0", 11L),
      (10L, "ddd eee fff", "en", "s0", 11L),
      (20L, "ggg hhh iii", "en", "s1", 11L))
    val dir = fixtureDir("decon_static")(
      "documents" -> corpus.toDF("doc_id", "text", "lang", "source",
        "n_chars"))
    val mem = MemoryStream[(Long, String, String)]
    // drive the REGISTERED per-batch probe (bloom-front + un-hinted
    // join) across two micro-batches; partial sums are commutative so
    // the settled totals must not depend on the batch split
    val partials = scala.collection.mutable.ArrayBuffer.empty[
      (String, Long, Long)]
    val qy = mem.toDF().toDF("doc_id", "text", "source")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        partials ++= graft.streaming.StreamOps
          .deconBatchPartial(batch, dir)
          .collect()
          .map(r => (r.getString(0), r.getAs[Long]("n_docs"),
            r.getAs[Long]("n_dup")))
        ()
      }
      .start()
    mem.addData((0L, "aaa bbb ccc", "s0"), (9L, "aaa bbb ccc", "s0"))
    qy.processAllAvailable()
    mem.addData((19L, "ddd eee fff", "s1"), (100L, "novel one", "s1"),
      (101L, "novel two", "s2"))
    qy.processAllAvailable()
    qy.stop()
    val got = partials.groupBy(_._1).map { case (src, rows) =>
      src -> ((rows.map(_._2).sum, rows.map(_._3).sum))
    }
    // id 0 is its own corpus entry (NOT a dup); 9 and 19 are dups
    assert(got === Map("s0" -> ((2L, 1L)), "s1" -> ((2L, 1L)),
      "s2" -> ((1L, 0L))))
  }

  test("q_stream_decontaminate settles to its batch answer") {
    val settled = q("q_stream_decontaminate").collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_dup"))).toSeq.sorted
    val docs = Tables.t(spark, sf0, "documents")
    val ch = docs.filter(col("doc_id") % 10 < 8)
      .withColumn("h", md5(lower(trim(col("text"))).cast("binary")))
      .groupBy(col("h"))
      .agg(count(lit(1)).as("n_corpus"), min(col("doc_id")).as("min_id"))
    val batch = docs
      .withColumn("h", md5(lower(trim(col("text"))).cast("binary")))
      .join(ch, Seq("h"), "left_outer")
      .withColumn("is_dup", coalesce(
        col("n_corpus") > 1 ||
          (col("n_corpus") === 1 && col("min_id") =!= col("doc_id")),
        lit(false)))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_dup"))
      .collect().map(r => (r.getString(0), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_dup"))).toSeq.sorted
    assert(settled === batch)
    // the synthetic corpus has no EXACT text dups (near-dups only), so
    // n_dup = 0 everywhere here; dup-flagging semantics (self-match
    // exclusion, cross-batch arrival) are proven by the fixture test
    // above, this one pins the stream-static drain to the batch answer
    assert(settled.map(_._2).sum === docs.count())
  }

  test("streaming centroid: state carries across micro-batches — final " +
    "mean covers ALL arrived vectors") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Int, Seq[Float])]
    val agg = mem.toDF().toDF("label", "embedding")
      .select(col("label"),
        posexplode(col("embedding")).as(Seq("pos", "x")))
      .withColumn("x", col("x").cast("double"))
      .groupBy(col("label"), col("pos"))
      .agg(round(avg(col("x")), 6).as("cx"))
    val qy = agg.writeStream.outputMode("complete")
      .format("memory").queryName("spec_stream_centroid").start()
    mem.addData((0, Seq(1.0f, 0.0f)), (0, Seq(3.0f, 2.0f)))
    qy.processAllAvailable()
    // batch 2 shifts the running mean — state must persist, not reset
    mem.addData((0, Seq(5.0f, 4.0f)), (1, Seq(7.0f, 7.0f)))
    qy.processAllAvailable()
    qy.stop()
    val got = spark.table("spec_stream_centroid").collect()
      .map(r => (r.getAs[Int]("label"), r.getAs[Int]("pos")) ->
        r.getAs[Double]("cx")).toMap
    assert(got === Map((0, 0) -> 3.0, (0, 1) -> 2.0,
      (1, 0) -> 7.0, (1, 1) -> 7.0))
  }

  test("streaming topk settles to the batch leaderboard") {
    val got = SparkEntry.queries("q_stream_topk")(spark, sf0).collect()
    assert(got.nonEmpty)
    val byWin = got.groupBy(_.getAs[java.time.LocalDateTime]("w_start"))
    byWin.values.foreach { rows =>
      assert(rows.length <= 3)
      val sorted = rows.sortBy(_.getAs[Int]("rk"))
      assert(sorted.map(_.getAs[Int]("rk")).toSeq ===
        (1 to sorted.length))
      // counts never increase down the leaderboard
      sorted.map(_.getAs[Long]("n")).toSeq.sliding(2).foreach {
        case Seq(a, b) => assert(a >= b)
        case _ => ()
      }
    }
    // spot-check one window against a batch count over the raw table
    val w0 = byWin.keys.minBy(_.toString)
    val batch = Tables.t(spark, sf0, "events")
      .groupBy(expr("date_trunc('hour', ts)").cast("timestamp_ntz")
        .as("h"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("w", expr(
        "CAST(timestamp_micros(unix_micros(CAST(h AS TIMESTAMP)) " +
          "div 21600000000 * 21600000000) AS TIMESTAMP_NTZ)"))
      .groupBy(col("w"), col("event_type"))
      .agg(sum(col("n")).as("n"))
      .filter(col("w") === lit(java.sql.Timestamp.valueOf(w0)))
      .collect().map(r => r.getAs[String]("event_type") ->
        r.getAs[Long]("n")).toMap
    val top = got.filter(
      _.getAs[java.time.LocalDateTime]("w_start") == w0)
      .sortBy(_.getAs[Int]("rk"))
    top.foreach { r =>
      assert(batch(r.getAs[String]("event_type")) === r.getAs[Long]("n"))
    }
  }

  test("streaming anomaly: multi-batch tail carry equals one-shot batch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import streaming.StreamOps.AnomIn
    // one user, 60 calm observations then a spike; split so the spike
    // arrives in a LATER micro-batch than most of its z-score frame —
    // the flag is only correct if state carries the trailing tail
    val calm = (1 to 60).map(i =>
      AnomIn(7L, i.toLong, i.toLong * 1000L, 10.0 + (i % 5) * 0.1))
    val spike = AnomIn(7L, 61L, 61000L, 99.0)
    def run(name: String, batches: Seq[Seq[AnomIn]]): Map[Long, Double] = {
      val mem = MemoryStream[AnomIn]
      val qy = streaming.StreamOps.anomalyLocal(mem.toDS())
        .writeStream.outputMode("append")
        .format("memory").queryName(name).start()
      batches.foreach { b => mem.addData(b: _*); qy.processAllAvailable() }
      qy.stop()
      spark.table(name).collect()
        .map(r => r.getAs[Long]("event_id") -> r.getAs[Double]("z")).toMap
    }
    val oneShot = run("spec_anom_one", Seq(calm :+ spike))
    val split = run("spec_anom_split",
      Seq(calm.take(40), calm.drop(40), Seq(spike)))
    assert(oneShot.contains(61L), "spike must be flagged")
    assert(oneShot(61L) > 3.0)
    assert(split === oneShot,
      "cross-batch state must reproduce the single-batch flags")
    // calm rows are never flagged
    assert(oneShot.keySet === Set(61L))
  }

  test("streaming LSH index: exact copies collide on all 4 bands; " +
    "index accounts for every shingled doc") {
    def mkText(seed: Int, n: Int): String =
      (0 until n).map(i => s"w${(seed * 31 + i * 7) % 97}").mkString(" ")
    val t0 = mkText(3, 40)
    val docsDf = Seq(
      (0L, t0, "en", "s0"),
      (100L, t0, "en", "s0"),            // exact copy of 0
      (5L, mkText(11, 40), "en", "s0"),  // unrelated
      (6L, "too short", "en", "s0"))     // < 5 tokens: no shingles
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val dir = fixtureDir("stream_lsh")("documents" -> docsDf)
    // collapse the fixture dir to a single documents.parquet FILE — the
    // driver layout the streaming source's pathGlobFilter matches on
    val dd = new java.io.File(s"$dir/documents.parquet")
    val part = dd.listFiles().find(f =>
      f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    val tmp = new java.io.File(s"$dir/documents.parquet.tmp")
    java.nio.file.Files.move(part.toPath, tmp.toPath)
    org.apache.commons.io.FileUtils.deleteDirectory(dd)
    java.nio.file.Files.move(tmp.toPath, dd.toPath)
    val idx = q("q_stream_lsh_index", dir).collect()
      .map(r => (r.getAs[Long]("band"), r.getAs[Long]("band_key")) ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("min_doc"))).toMap
    // 3 shingled docs × 4 bands = 12 index entries in total
    assert(idx.values.map(_._1).sum === 12L)
    // the copy pair shares its bucket on all 4 bands, keeper = min id
    val shared = idx.values.filter(_._1 >= 2L)
    assert(shared.size === 4, s"copies must collide on all 4 bands: $idx")
    assert(shared.forall(_._2 === 0L))
    // the short doc contributes nothing
    assert(idx.values.forall(_._1 <= 2L))
  }

  test("streaming LSH index carries state across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    def mkText(seed: Int, n: Int): String =
      (0 until n).map(i => s"w${(seed * 31 + i * 7) % 97}").mkString(" ")
    val t0 = mkText(3, 40)
    val mem = MemoryStream[(Long, String)]
    val idx = streaming.StreamOps.lshIndexAgg(
      streaming.StreamOps.lshBandSignatures(
        mem.toDF().toDF("doc_id", "text")))
    val qy = idx.writeStream.outputMode("complete")
      .format("memory").queryName("spec_lsh_xbatch").start()
    // batch 1: the original; batch 2 (later): its exact copy — the
    // collision only exists if the index state survived batch 1
    mem.addData((0L, t0), (5L, mkText(11, 40)))
    qy.processAllAvailable()
    val afterB1 = spark.table("spec_lsh_xbatch").collect()
      .map(_.getAs[Long]("n_docs"))
    assert(afterB1.forall(_ === 1L), "no collisions before the copy arrives")
    mem.addData((100L, t0))
    qy.processAllAvailable()
    qy.stop()
    val after = spark.table("spec_lsh_xbatch").collect()
      .map(r => r.getAs[Long]("n_docs") -> r.getAs[Long]("min_doc"))
    // copy pair collides on all 4 bands, keeper = min id across batches
    assert(after.count(_._1 == 2L) === 4, s"got ${after.toSeq}")
    assert(after.filter(_._1 == 2L).forall(_._2 === 0L))
  }

  test("CDC apply: users whose last op is a tombstone vanish") {
    val got = q("q_stream_cdc_apply").collect()
      .map(_.getAs[Long]("user_id")).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val lastOps = Tables.t(spark, sf0, "events")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type")).collect()
    val want = lastOps.filter(_.getString(1) != "error")
      .map(_.getLong(0)).toSet
    assert(got === want)
    // the semantics only bite if at least one user IS tombstoned
    assert(lastOps.exists(_.getString(1) == "error"),
      "fixture should contain a trailing delete")
  }

  test("markov processor carries last-event state across micro-batches") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_spec_markov").toFile
    import spark.implicits._
    def write(name: String, rows: Seq[(Long, Long, Long, String)]): Unit =
      rows.toDF("user_id", "us", "event_id", "event_type")
        .coalesce(1).write.mode("overwrite")
        .parquet(new java.io.File(dir, name).getAbsolutePath)
    // batch files arrive in name order; user 7 spans both files so the
    // view->purchase pair exists ONLY if state crosses the batch seam
    write("a", Seq((7L, 1000L, 1L, "click"), (7L, 2000L, 2L, "view"),
      (8L, 1500L, 3L, "signup")))
    write("b", Seq((7L, 3000L, 4L, "purchase"), (8L, 2500L, 5L, "click")))
    val schema = spark.read.parquet(
      new java.io.File(dir, "a").getAbsolutePath).schema
    val savedProv =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val src = spark.readStream.schema(schema).format("parquet")
        .option("maxFilesPerTrigger", "1")
        .load(dir.getAbsolutePath + "/*")
        .select(col("user_id"), col("us"), col("event_id"),
          col("event_type"))
        .as[(Long, Long, Long, String)]
      import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
      val trans = src.groupByKey(_._1)
        .transformWithState(new streaming.StreamOps.TransitionProcessor,
          TimeMode.None(), OutputMode.Append())
      val qy = trans.toDF("prev_type", "next_type").writeStream
        .outputMode("append").format("memory").queryName("spec_markov")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      qy.awaitTermination()
      val batches = qy.recentProgress.count(_.numInputRows > 0)
      assert(batches >= 2, s"expected >=2 micro-batches, saw $batches")
      val pairs = spark.table("spec_markov").collect()
        .map(r => (r.getString(0), r.getString(1))).toSeq.sorted
      assert(pairs === Seq(("click", "view"), ("signup", "click"),
        ("view", "purchase")).sorted)
    } finally {
      savedProv match {
        case Some(v) => spark.conf
          .set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf
          .unset("spark.sql.streaming.stateStore.providerClass")
      }
      org.apache.commons.io.FileUtils.deleteQuietly(dir)
    }
  }

  test("streaming OHLC bars settle to the batch formulation") {
    val got = q("q_stream_ohlc").collect()
      .map(r => (r.getAs[String]("event_type"),
        r.getAs[Any]("day").toString) ->
        (r.getAs[Double]("open"), r.getAs[Double]("close"),
          r.getAs[Long]("n"))).toMap
    val want = q("q_ts_ohlc").collect()
      .map(r => (r.getAs[String]("event_type"),
        r.getAs[Any]("day").toString) ->
        (r.getAs[Double]("open"), r.getAs[Double]("close"),
          r.getAs[Long]("n"))).toMap
    assert(got === want)
  }

  test("vshape processor catches patterns straddling the batch seam") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_spec_vshape").toFile
    import spark.implicits._
    def write(name: String, rows: Seq[(String, Long, Long, Long)]): Unit =
      rows.toDF("event_type", "us", "event_id", "c")
        .coalesce(1).write.mode("overwrite")
        .parquet(new java.io.File(dir, name).getAbsolutePath)
    // V = 1000 -> 500 -> 1000; the rebound row arrives in the SECOND
    // file, so the hit exists only if both prior rows were carried
    write("a", Seq(("click", 1000L, 1L, 1000L), ("click", 2000L, 2L, 500L)))
    write("b", Seq(("click", 3000L, 3L, 1000L)))
    val schema = spark.read.parquet(
      new java.io.File(dir, "a").getAbsolutePath).schema
    val savedProv =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val src = spark.readStream.schema(schema).format("parquet")
        .option("maxFilesPerTrigger", "1")
        .load(dir.getAbsolutePath + "/*")
        .select(col("event_type"), col("us"), col("event_id"), col("c"))
        .as[(String, Long, Long, Long)]
      import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
      val hits = src.groupByKey(_._1)
        .transformWithState(new streaming.StreamOps.VshapeProcessor,
          TimeMode.None(), OutputMode.Append())
      val qy = hits.toDF("event_type", "us").writeStream
        .outputMode("append").format("memory").queryName("spec_vshape")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      qy.awaitTermination()
      val batches = qy.recentProgress.count(_.numInputRows > 0)
      assert(batches >= 2, s"expected >=2 micro-batches, saw $batches")
      val res = spark.table("spec_vshape").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(res === Seq(("click", 3000L)))
    } finally {
      savedProv match {
        case Some(v) => spark.conf
          .set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf
          .unset("spark.sql.streaming.stateStore.providerClass")
      }
      org.apache.commons.io.FileUtils.deleteQuietly(dir)
    }
  }

  test("streaming reconciliation settles to the batch golden count exactly") {
    val got = SparkEntry.queries("q_stream_reconcile")(spark, sf0)
      .collect().map(_.toSeq).toSeq
    val batch = SparkEntry.queries("q_reconcile")(spark, sf0)
      .collect().map(_.toSeq).toSeq
    assert(got === batch)
  }

  test("streaming run-log enrichment settles to the batch environment table") {
    val got = SparkEntry.queries("q_stream_runlog_enrich")(spark, sf0)
      .collect()
    val batch = SparkEntry.queries("q_runlog_enrich")(spark, sf0)
      .collect()
      .map(r => (r.get(0), r.getAs[Int]("module")) -> r).toMap
    assert(got.length === batch.size)
    got.foreach { r =>
      val b = batch((r.get(0), r.getAs[Int]("module")))
      assert(r.getAs[Long]("n_samples") === b.getAs[Long]("n_samples"))
      assert(r.getAs[Double]("imon_max") === b.getAs[Double]("imon_max"))
      assert(r.getAs[Double]("vmon_min") === b.getAs[Double]("vmon_min"))
      // exact-integer mean vs the batch float mean: equal to 1e-5
      // (both round at 6dp; cents are lossless so only the division
      // differs)
      assert(math.abs(r.getAs[Double]("vmon_avg") -
        b.getAs[Double]("vmon_avg")) < 1e-5)
    }
  }

  test("streaming perplexity settles to the per-source batch rollup") {
    val got = SparkEntry.queries("q_stream_perplexity")(spark, sf0)
      .collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("n_bigrams"))
      .toMap
    val batch = SparkEntry.queries("q_text_perplexity")(spark, sf0)
      .collect()
      .groupBy(_.getAs[String]("source"))
      .view.mapValues(_.map(_.getAs[Long]("n_bigrams")).sum).toMap
    assert(got === batch)
  }

  test("streaming curation funnel settles to the batch funnel exactly") {
    val got = SparkEntry.queries("q_stream_curate")(spark, sf0)
      .collect().map(_.toSeq).toSeq
    val batch = SparkEntry.queries("q_curate_v2")(spark, sf0)
      .collect().map(_.toSeq).toSeq
    assert(got === batch)
  }

  test("streaming shard manifest settles to the batch manifest exactly") {
    val got = SparkEntry.queries("q_stream_shard_manifest")(spark, sf0)
      .collect().map(_.toSeq).toSeq
    val batch = SparkEntry.queries("q_shard_manifest")(spark, sf0)
      .collect().map(_.toSeq).toSeq
    assert(got === batch)
  }

  test("streaming DSIR telemetry settles to the batch scoring") {
    val got = SparkEntry.queries("q_stream_dsir")(spark, sf0).collect()
    assert(got.nonEmpty)
    // batch replay: same model slice, same features, same per-source agg
    val model = ops.Corpus.dsirLogRatio(
      ops.Corpus.dsirFeatures(
        Tables.t(spark, sf0, "documents").filter(col("doc_id") % 10 < 8)))
    val batch = ops.Corpus.dsirFeatures(Tables.t(spark, sf0, "documents"))
      .join(broadcast(model), Seq("b"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_feat"),
        round(sum(col("lr")), 6).as("logw_sum"))
      .collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_feat"), r.getAs[Double]("logw_sum"))).toMap
    got.foreach { r =>
      val (nf, lw) = batch(r.getAs[String]("source"))
      assert(r.getAs[Long]("n_feat") === nf)
      assert(math.abs(r.getAs[Double]("logw_sum") - lw) < 1e-5)
    }
  }

  test("streaming KMV sketch: bounded state carries across batches, " +
    "duplicates absorbed, settles to the k smallest distinct") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val kmv = org.apache.spark.sql.functions.udaf(functions.KmvSketch)
    val mem = MemoryStream[(String, Long)]
    val agg = mem.toDF().toDF("source", "h")
      .groupBy(col("source")).agg(kmv(col("h")).as("sk"))
    val qy = agg.writeStream.outputMode("complete")
      .format("memory").queryName("spec_stream_kmv").start()
    // batch 1: 70 values 100..169 (sketch saturates at 64) + a dup
    mem.addData((100L to 169L).map(h => ("sA", h)) :+ ("sA", 100L): _*)
    qy.processAllAvailable()
    // batch 2: smaller values must DISPLACE the tail; dups absorbed
    mem.addData(("sA", 5L), ("sA", 7L), ("sA", 5L), ("sA", 100L))
    qy.processAllAvailable()
    qy.stop()
    val sk = spark.table("spec_stream_kmv").collect()
      .find(_.getAs[String]("source") == "sA").get
      .getAs[scala.collection.Seq[Long]]("sk").toSeq
    val expect = (Seq(5L, 7L) ++ (100L to 169L)).distinct.sorted.take(64)
    assert(sk === expect)
  }

  test("q_stream_benford settles to the batch digit distribution") {
    val got = SparkEntry.queries("q_stream_benford")(spark, sf0).collect()
    assert(got.nonEmpty)
    assert(math.abs(got.map(_.getAs[Double]("obs_p")).sum - 1.0) < 1e-4)
    // batch replay over the same events table
    val batch = Tables.t(spark, sf0, "events")
      .select(floor(col("value") * 100 + 0.5).cast("long").as("c"))
      .filter(col("c") > 0)
      .select(expr(ops.Refine.leadingDigitSql("c", "div")).as("d"))
      .groupBy(col("d")).count().collect()
      .map(r => r.getAs[Long]("d") -> r.getAs[Long]("count")).toMap
    got.foreach { r =>
      assert(r.getAs[Long]("n") === batch(r.getAs[Long]("d")))
    }
  }

  test("q_stream_kmv settles to the batch q_agg_kmv per-source estimates") {
    val got = SparkEntry.queries("q_stream_kmv")(spark, sf0).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Double]("d_est"))
      .toMap
    // batch twin: per-source estimates appear as est_a/est_b on pairs
    val pairs = SparkEntry.queries("q_agg_kmv")(spark, sf0).collect()
    val batch = (pairs.map(r => r.getAs[String]("sa") ->
        r.getAs[Double]("est_a")) ++
      pairs.map(r => r.getAs[String]("sb") ->
        r.getAs[Double]("est_b"))).toMap
    assert(got.nonEmpty)
    batch.foreach { case (src, est) =>
      assert(got(src) === est, s"source $src")
    }
  }

  test("attribution state carries the last touch across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    // rows: (event_id, us, user_id, event_type, cents)
    val mem = MemoryStream[(Long, Long, Long, String, Long)]
    val day = 86400000000L
    val out = graft.streaming.StreamOps.lastTouchCredits(mem.toDS())
    val qy = out.writeStream.outputMode("append")
      .format("memory").queryName("spec_attr").start()
    // batch 1: user 1 clicks, user 2 views then goes stale
    mem.addData((1L, 10L * day, 1L, "click", 0L),
      (2L, 10L * day, 2L, "view", 0L))
    qy.processAllAvailable()
    // batch 2: user 1 purchases within 7 days (credit carried 'click');
    // user 2 purchases after 8 days (stale → 'direct'); user 3 has a
    // same-micros view AND an earlier in-window click — the strict
    // inequality must pass credit to the click
    mem.addData((3L, 12L * day, 1L, "purchase", 500L),
      (4L, 18L * day + 1L, 2L, "purchase", 700L),
      (5L, 13L * day, 3L, "click", 0L),
      (6L, 14L * day, 3L, "view", 0L),
      (7L, 14L * day, 3L, "purchase", 900L))
    qy.processAllAvailable()
    qy.stop()
    val got = spark.table("spec_attr")
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    // user 3's same-us view (event 6) must NOT take the credit; the
    // 13-day click (within 1 day of the purchase) must
    assert(got === Seq(("click", 500L), ("click", 900L), ("direct", 700L)))
  }

  test("streaming FDR monitor settles to the batch decisions exactly") {
    val got = SparkEntry.queries("q_stream_fdr")(spark, sf0)
      .collect().map(_.toSeq).toSeq
    val batch = SparkEntry.queries("q_stats_fdr")(spark, sf0)
      .collect().map(_.toSeq).toSeq
    assert(got === batch)
  }

  test("streaming DP histogram settles to the batch release exactly") {
    val got = SparkEntry.queries("q_stream_dp_hist")(spark, sf0)
      .collect().map(_.toSeq).toSeq
    val batch = SparkEntry.queries("q_audit_dp_hist")(spark, sf0)
      .collect().map(_.toSeq).toSeq
    assert(got === batch)
  }
  test("streaming expectations monitor: clean corpus passes all rules") {
    val got = SparkEntry.queries("q_stream_expectations")(spark, sf0)
      .collect()
    assert(got.length === 4)
    got.foreach { r =>
      assert(r.getAs[Boolean]("pass"),
        s"rule ${r.getAs[String]("rule")} flagged violations on the " +
          "clean driver corpus")
      assert(r.getAs[Long]("n_violations") === 0L)
    }
    assert(got.map(_.getAs[Long]("n_checked")).toSet.size === 1)
  }

  test("q_stream_budget settles to the batch allocation exactly") {
    def rows(id: String) = SparkEntry.queries(id)(spark, sf0).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("rank"),
        r.getAs[Long]("tokens"), r.getAs[Long]("score_micro"),
        r.getAs[Long]("alloc_tokens"),
        r.getAs[Boolean]("truncated"))).toSeq
    assert(rows("q_stream_budget") === rows("q_mix_budget"))
  }

  test("q_stream_genmeans settles to the batch mean family exactly") {
    def rows(id: String) = SparkEntry.queries(id)(spark, sf0).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n"),
        r.getAs[Double]("mean_arith"), r.getAs[Double]("mean_geom"),
        r.getAs[Double]("mean_harm"))).toSeq
    assert(rows("q_stream_genmeans") === rows("q_agg_genmeans"))
  }

  test("q_stream_fano settles to the batch dispersion table exactly") {
    def rows(id: String) = SparkEntry.queries(id)(spark, sf0).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n_days"),
        r.getAs[Double]("mean_daily"), r.getAs[Double]("fano"))).toSeq
    assert(rows("q_stream_fano") === rows("q_events_fano"))
  }

  test("q_stream_brier settles to the batch reliability table exactly") {
    def rows(id: String) = SparkEntry.queries(id)(spark, sf0).collect()
      .map(r => (r.getAs[Long]("bin"), r.getAs[Long]("n"),
        r.getAs[Long]("n_pos"), r.getAs[Double]("mean_p"),
        r.getAs[Double]("frac_pos"), r.getAs[Double]("brier"))).toSeq
    assert(rows("q_stream_brier") === rows("q_ml_brier"))
  }

  test("q_stream_mcnemar settles to the batch paired test exactly") {
    def rows(id: String) = SparkEntry.queries(id)(spark, sf0).collect()
      .map(r => (r.getAs[Long]("n"), r.getAs[Long]("n_both"),
        r.getAs[Long]("b"), r.getAs[Long]("c"),
        r.getAs[Double]("chi2"))).toSeq
    assert(rows("q_stream_mcnemar") === rows("q_stats_mcnemar"))
  }

  test("q_stream_cronbach settles to the batch alpha exactly") {
    def rows(id: String) = SparkEntry.queries(id)(spark, sf0).collect()
      .map(r => (r.getAs[Long]("n_docs"), r.getAs[Long]("k_items"),
        r.getAs[Double]("alpha"))).toSeq
    assert(rows("q_stream_cronbach") === rows("q_stats_cronbach"))
  }

  test("q_stream_bartlett settles to the batch chi2 exactly") {
    def rows(id: String) = SparkEntry.queries(id)(spark, sf0).collect()
      .map(r => (r.getAs[Long]("k_groups"), r.getAs[Long]("n_total"),
        r.getAs[Long]("df"), r.getAs[Double]("bartlett_chi2"))).toSeq
    assert(rows("q_stream_bartlett") === rows("q_stats_bartlett"))
  }

  test("q_stream_cohend settles to the batch effect panel exactly") {
    def rows(id: String) = SparkEntry.queries(id)(spark, sf0).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_docs"),
        r.getAs[Double]("cohen_d"))).toSeq
    assert(rows("q_stream_cohend") === rows("q_stats_cohend"))
  }

  test("q_stream_hhi settles to the batch concentration gauge") {
    def rows(id: String) = SparkEntry.queries(id)(spark, sf0).collect()
      .map(r => (r.getAs[Long]("n_sources"), r.getAs[Double]("hhi_docs"),
        r.getAs[Double]("eff_docs"), r.getAs[Double]("hhi_tokens"),
        r.getAs[Double]("eff_tokens"))).toSeq
    assert(rows("q_stream_hhi") === rows("q_mix_hhi"))
  }

  test("q_stream_rep_scrub settles to the batch scrub accounting exactly") {
    def rows(id: String) = SparkEntry.queries(id)(spark, sf0).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("tokens_before"), r.getAs[Long]("trigram_starts"),
        r.getAs[Long]("tokens_removed"), r.getAs[Long]("docs_affected"),
        r.getAs[Double]("removal_ratio"))).toSeq
    assert(rows("q_stream_rep_scrub") === rows("q_text_rep_scrub"))
  }

  test("q_stream_poisson_gof settles to the batch chi2 table exactly") {
    def rows(id: String) = SparkEntry.queries(id)(spark, sf0).collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("observed"),
        r.getAs[Double]("expected"), r.getAs[Double]("chi2_term"))).toSeq
    assert(rows("q_stream_poisson_gof") === rows("q_stats_poisson_gof"))
  }

  test("q_stream_fleiss settles to the batch kappa exactly") {
    def rows(id: String) = SparkEntry.queries(id)(spark, sf0).collect()
      .map(r => (r.getAs[Long]("n_docs"), r.getAs[Long]("n_raters"),
        r.getAs[Double]("fleiss_kappa"))).toSeq
    assert(rows("q_stream_fleiss") === rows("q_stats_fleiss"))
  }
}

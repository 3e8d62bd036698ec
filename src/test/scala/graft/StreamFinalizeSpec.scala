package graft

/** Proves the no-data finalization-batch skip query by query: every
  * drain that declares emitsOnFinalize = false (emit-on-arrival state,
  * inner joins, update-mode aggs, dropDuplicates) must settle to the
  * IDENTICAL table whether or not the trailing no-data micro-batch
  * runs — the skip is a pure fixed-cost cut, never a semantics change.
  * spark.graft.forceFinalize=true re-enables the batch for the A side.
  * If a future drain wrongly opts out (a timer-driven processor, an
  * append windowed agg, an outer join), its A/B diverges here long
  * before the oracle could notice on different data. */
class StreamFinalizeSpec extends SparkSuite {

  private val skippedDrains = Seq(
    "q_stream_watermark", "q_stream_dedup", "q_stream_reset_counter",
    "q_stream_tws", "q_stream_join", "q_stream_anomaly",
    "q_stream_markov", "q_stream_vshape", "q_stream_attribution")

  // representatives of the complete-mode skip (definitional, but pinned)
  private val completeDrains = Seq("q_stream_source", "q_stream_stateful")

  private def settled(id: String): Seq[String] =
    q(id).collect().map(_.toString).sorted.toSeq

  test("skipped finalization never changes a settled table") {
    (skippedDrains ++ completeDrains).foreach { id =>
      val fast = settled(id)
      spark.conf.set("spark.graft.forceFinalize", "true")
      val full =
        try settled(id)
        finally spark.conf.unset("spark.graft.forceFinalize")
      assert(fast == full,
        s"$id: settled table differs with the finalization batch " +
          s"(skip=${fast.size} rows, finalize=${full.size} rows)")
      assert(fast.nonEmpty, s"$id settled to an empty table")
    }
  }

  test("the outer join keeps its finalization batch (sanity)") {
    // q_stream_join_outer emits null-padded rows on watermark advance;
    // it must NOT be in the skip list, and its drain must produce the
    // outer rows — count strictly above its inner twin proves the
    // finalization batch actually ran and emitted
    val outer = q("q_stream_join_outer").count()
    val inner = q("q_stream_join").count()
    assert(outer > inner,
      s"outer join ($outer rows) must exceed inner ($inner rows) — " +
        "did the finalization batch emit the null-padded side?")
  }
}

package graft

/** Pins the round-13 shared-fixpoint memo layout: cacheOnce memoizes a
  * SMALL (row-measured) fixpoint as an eager localCheckpoint — one
  * flat LogicalRDD leaf — never as a persisted plan whose
  * InMemoryRelation re-prints its whole child tree. The layout is
  * load-bearing twice over: every SQL execution stringifies its plan
  * for the listener event (nested cached plans grew that walk
  * exponentially with fixpoint stacking — profiled at ~1 s of driver
  * time on a 42-row cached count), and the checkpoint right-sizes the
  * partition count from the MEASURED rows so per-round re-scans stop
  * paying session-width task fans over grid-sized frames. A regression
  * back to nested persist() would pass every value check and silently
  * re-tax the whole cached tier — this spec fails instead. */
class CacheShapeSpec extends SparkSuite {
  import org.apache.spark.sql.DataFrame
  import org.apache.spark.sql.execution.LogicalRDD

  private def leafOnly(df: DataFrame, what: String): Unit = {
    val plan = df.queryExecution.analyzed
    assert(plan.isInstanceOf[LogicalRDD],
      s"$what memo is not a flat LogicalRDD leaf — " +
        s"got:\n${plan.treeString.take(800)}")
  }

  test("small shared fixpoints memoize as flat checkpoint leaves") {
    // representative stack: und feeds oriented feeds tricorners — the
    // exact nesting chain whose cached-plan strings blew up
    leafOnly(ops.Insights.undirectedLinkEdges(spark, sf0), "und")
    leafOnly(ops.Insights.linkDegrees(spark, sf0), "unddeg")
    leafOnly(ops.Insights.closedTriangles(spark, sf0), "tricorners")
  }

  test("checkpointed memo width follows the measured row count") {
    val und = ops.Insights.undirectedLinkEdges(spark, sf0)
    val n = und.count()
    val sessW = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val expect = math.max(1L, math.min(sessW.toLong,
      (n + 2047) / 2048)).toInt
    val got = und.rdd.getNumPartitions
    // <= not ==: cacheOnce narrows via coalesce, which can only merge —
    // if AQE already built the frame below the formula's target the
    // memo is legitimately narrower than the formula says.
    assert(got >= 1 && got <= expect,
      s"und: $n rows cached as $got partitions, expected 1..$expect")
  }

  test("durableFixpoints routes the memo through replicated persist") {
    // Cluster switch: with spark.graft.durableFixpoints=true the memo
    // must keep its lineage (no checkpoint truncation — an executor
    // loss must be recomputable) and carry 2x block replication.
    spark.conf.set("spark.graft.durableFixpoints", "true")
    try {
      val df = ops.Insights.cacheOnce(spark, sf0, "cacheshape_durable") {
        spark.range(100).toDF("id")
      }
      assert(!df.queryExecution.analyzed.isInstanceOf[LogicalRDD],
        "durable memo must keep lineage, not truncate to a checkpoint")
      assert(df.storageLevel ===
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_2,
        s"durable memo persisted at ${df.storageLevel}")
      assert(df.count() === 100L)
    } finally spark.conf.unset("spark.graft.durableFixpoints")
  }

  test("eviction frees victims on a wall-clock grace floor, not sweeps") {
    // Past maxCachedDfs the sweep must (a) evict OTHER dirs first —
    // live holders point at the current dir — and (b) free a victim's
    // checkpoint blocks only after the GRACE FLOOR
    // (spark.graft.evictionGraceMs) of wall-clock has passed: a
    // released flat LogicalRDD has no lineage to recompute, so a
    // caller in another thread still mid-count on the victim would
    // fail unrecoverably if the sweep released at eviction time. Two
    // failure modes of the old sweep-count deferral are pinned here:
    // a SECOND overflow moments after the first must NOT shrink the
    // grace to zero, and the blocks must free EVENTUALLY (daemon
    // timer) even if no further sweep ever runs.
    import org.apache.spark.sql.execution.{LogicalRDD => LR}
    def rddId(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.analyzed.collect { case l: LR => l.rdd.id }.head
    spark.conf.set("spark.graft.evictionGraceMs", "60000")
    try {
      val cold = ops.Insights.cacheOnce(spark, "/cacheshape_evict_cold",
        "probe") { spark.range(10).toDF("id") }
      val coldId = rddId(cold)
      assert(spark.sparkContext.getPersistentRDDs.contains(coldId),
        "checkpointed memo should be persisted before eviction")
      // overflow the memo from many other fake dirs → sweep #1 evicts
      // the cold dir's ENTRY and parks its release on the grace floor
      (1 to 70).foreach { i =>
        ops.Insights.cacheOnce(spark, s"/cacheshape_evict_$i", "probe") {
          spark.range(5).toDF("id")
        }
      }
      assert(spark.sparkContext.getPersistentRDDs.contains(coldId),
        "victim blocks must survive the evicting sweep (grace floor)")
      assert(cold.count() === 10L,
        "an in-flight holder of the victim must still be able to run")
      // a fresh request for the evicted key REBUILDS (entry is gone) —
      // it must not resurrect the doomed frame
      val rebuilt = ops.Insights.cacheOnce(spark, "/cacheshape_evict_cold",
        "probe") { spark.range(10).toDF("id") }
      assert(rddId(rebuilt) !== coldId, "evicted entry must rebuild fresh")
      // overflow AGAIN immediately → the quick-succession sweep must
      // NOT free the victim: its 60 s grace floor has not passed
      // (the old sweep-count rule freed it here — near-zero grace)
      (71 to 140).foreach { i =>
        ops.Insights.cacheOnce(spark, s"/cacheshape_evict_$i", "probe") {
          spark.range(5).toDF("id")
        }
      }
      assert(spark.sparkContext.getPersistentRDDs.contains(coldId),
        "a quick second overflow must not shrink the grace floor")
      assert(cold.count() === 10L)
      // now a victim parked under a SHORT floor must free by TIMER —
      // zero further cacheOnce traffic after its eviction
      spark.conf.set("spark.graft.evictionGraceMs", "200")
      val brief = ops.Insights.cacheOnce(spark, "/cacheshape_evict_brief",
        "probe") { spark.range(9).toDF("id") }
      val briefId = rddId(brief)
      (141 to 210).foreach { i =>
        ops.Insights.cacheOnce(spark, s"/cacheshape_evict_$i", "probe") {
          spark.range(5).toDF("id")
        }
      }
      val deadline = System.currentTimeMillis() + 10000
      while (spark.sparkContext.getPersistentRDDs.contains(briefId) &&
          System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(!spark.sparkContext.getPersistentRDDs.contains(briefId),
        "past the grace floor the daemon timer must free the victim " +
          "without any further sweep")
      val hot = ops.Insights.cacheOnce(spark, "/cacheshape_evict_hot",
        "probe") { spark.range(7).toDF("id") }
      assert(hot.count() === 7L)
      val hot2 = ops.Insights.cacheOnce(spark, "/cacheshape_evict_hot",
        "probe") { sys.error("must be served from the memo"); null }
      assert(hot2.count() === 7L)
    } finally spark.conf.unset("spark.graft.evictionGraceMs")
  }

  test("acquireOnce holder blocks an evicted victim's release past the " +
      "grace floor until release() (r17 refcount contract)") {
    // The r16 outside-holder contract was a 60 s wall-clock guess; the
    // r17 accessor makes it airtight: while a tracked holder count is
    // nonzero, a parked release waits on the COUNT, not the clock.
    // Here the grace floor is 200 ms, the holder keeps the victim for
    // seconds past it, and the blocks must survive until release().
    import org.apache.spark.sql.execution.{LogicalRDD => LR}
    def rddId(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.analyzed.collect { case l: LR => l.rdd.id }.head
    spark.conf.set("spark.graft.evictionGraceMs", "200")
    try {
      val (held, release) = ops.Insights.acquireOnce(
        spark, "/cacheshape_ref_cold", "probe") {
        spark.range(11).toDF("id")
      }
      val heldId = rddId(held)
      assert(spark.sparkContext.getPersistentRDDs.contains(heldId))
      // overflow the memo → the held entry is evicted and parked
      (1 to 70).foreach { i =>
        ops.Insights.cacheOnce(spark, s"/cacheshape_ref_$i", "probe") {
          spark.range(5).toDF("id")
        }
      }
      // wait far past the 200 ms grace floor: the holder must keep it
      Thread.sleep(3000)
      assert(spark.sparkContext.getPersistentRDDs.contains(heldId),
        "a tracked holder must block the release past the grace floor")
      assert(held.count() === 11L,
        "the held victim must stay runnable while acquired")
      // release → the timer settles the parked release on its next beat
      release()
      val deadline = System.currentTimeMillis() + 10000
      while (spark.sparkContext.getPersistentRDDs.contains(heldId) &&
          System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(!spark.sparkContext.getPersistentRDDs.contains(heldId),
        "after release() the parked release must settle promptly")
      release() // idempotent per handle — must not over-decrement
    } finally spark.conf.unset("spark.graft.evictionGraceMs")
  }

  test("plan strings over stacked fixpoints stay leaf-sized") {
    // the regression signature was a 100 KB executedPlan string for a
    // trivial consumer of the deepest fixpoint; a flat store keeps it
    // in the low KBs
    val tri = ops.Insights.closedTriangles(spark, sf0)
    val s = tri.groupBy().count().queryExecution.executedPlan.toString
    assert(s.length < 20000,
      s"consumer plan string is ${s.length} chars — nested cache tree?")
  }
}

package graft

import org.apache.spark.sql.functions._

/** Invariants for the completion-sweep operators (ops/More.scala) and
  * the dedup drop-list action. */
class MoreSpec extends SparkSuite {

  test("pivot row sums equal per-user event counts") {
    val pivoted = q("q_pivot").collect()
    val totals = Tables.t(spark, sf0, "events")
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("n"))
      .toMap
    pivoted.foreach { r =>
      val sum = Seq("click", "error", "purchase", "signup", "view")
        .map(c => r.getAs[Long](c)).sum
      assert(sum === totals(r.getAs[Long]("user_id")))
    }
  }

  test("unpivot emits exactly 3 stats per user, min <= avg <= max") {
    val rows = q("q_unpivot").collect()
      .groupBy(_.getAs[Long]("user_id"))
    rows.foreach { case (_, rs) =>
      val m = rs.map(r => r.getAs[String]("stat") -> r.getAs[Double]("v"))
        .toMap
      assert(m.size === 3)
      assert(m("min") <= m("avg") + 1e-9 && m("avg") <= m("max") + 1e-9)
    }
  }

  test("full outer join covers every user exactly once") {
    val rows = q("q_join_full").collect()
    val users = rows.map(_.getAs[Long]("user_id"))
    assert(users.distinct.length === users.length)
    val clickUsers = Tables.t(spark, sf0, "events")
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id")).distinct().count()
    assert(rows.length.toLong === clickUsers)
  }

  test("cross join cardinality is |region| x |event types|") {
    assert(q("q_join_cross").count() === 5L * 5L)
  }

  test("quartiles partition each priority class near-evenly") {
    val byClass = q("q_win_ntile").collect()
      .groupBy(_.getAs[String]("o_orderpriority"))
    byClass.foreach { case (_, rs) =>
      val sizes = rs.groupBy(_.getAs[Long]("quartile")).values.map(_.size)
      assert(sizes.max - sizes.min <= 1)
    }
  }

  test("logprob scores are negative and bounded by vocabulary size") {
    val rows = q("q_text_logprob").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val mean = r.getAs[Double]("mean_logp")
      assert(mean < 0.0)
      assert(mean > -15.0) // ln(1/vocab-total) floor for this corpus
    }
  }

  test("frame sampling keeps only even frames with halved widths") {
    val rows = q("q_multimodal_frames").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("frame_idx") % 2 === 0L)
      assert(r.getAs[Long]("frame_idx") < r.getAs[Long]("n_frames"))
      val w = r.getAs[Long]("resized_w")
      assert(w >= 8L && w <= 72L)
    }
  }

  test("dedup drop-list is a strict subset and keeps at least one per pair") {
    // fixture with a planted near-duplicate (reuse DedupSpec's corpus shape)
    import spark.implicits._
    def mkText(seed: Int): String =
      (0 until 40).map(j => s"d${seed}w$j").mkString(" ")
    val docs = ((0 until 4).map(i => (i.toLong, mkText(i), "en", "s0")) ++
      Seq((100L, mkText(0), "en", "s0")))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val dir = fixtureDir("drop")("documents" -> docs)
    val dropped = q("q_dedup_drop", dir).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(dropped === Set(100L)) // the copy goes, the original stays
  }
}

package graft

import org.apache.spark.sql.functions._

/** Learn tier — structural invariants of the naive-Bayes classifier,
  * the Zipf fit, and the path miner at sf0.001. */
class LearnSpec extends SparkSuite {

  test("naive Bayes classifies every held-out doc exactly once") {
    val rows = q("q_ml_naive_bayes").collect()
    val total = rows.map(_.getAs[Long]("n")).sum
    val want = Tables.t(spark, sf0, "documents")
      .filter(col("doc_id") % 5 === 0).count()
    assert(total === want)
    // all cells reference real languages
    val langs = Tables.t(spark, sf0, "documents")
      .select(col("lang")).distinct().collect().map(_.getString(0)).toSet
    rows.foreach { r =>
      assert(langs.contains(r.getAs[String]("true_lang")))
      assert(langs.contains(r.getAs[String]("pred_lang")))
    }
  }

  test("naive Bayes is deterministic across runs") {
    val a = q("q_ml_naive_bayes").collect().toSeq
    val b = q("q_ml_naive_bayes").collect().toSeq
    assert(a === b)
  }

  test("Zipf slope is negative (frequency falls with rank)") {
    val r = q("q_text_zipf").collect()(0)
    assert(r.getAs[Double]("slope") < 0.0)
    assert(r.getAs[Long]("n_terms") <= 100L)
    assert(r.getAs[Long]("n_terms") > 1L)
  }

  test("quality classifier recovers the rule labels it was trained on") {
    val rows = q("q_quality_classify").collect()
    assert(rows.length === 500)
    // decision is exactly the sign of the emitted margin
    rows.foreach { r =>
      assert((r.getAs[Double]("log_odds") > 0.0) ===
        (r.getAs[Int]("nb_keep") === 1))
    }
    // held-out fold: the distilled model generalizes the rules
    val holdout = rows.filter(_.getAs[Long]("doc_id") % 5 == 0)
    val agree = holdout.count(r =>
      r.getAs[Int]("gopher_pass") === r.getAs[Int]("nb_keep"))
    assert(agree.toDouble / holdout.length >= 0.9,
      s"holdout agreement ${agree.toDouble / holdout.length}")
    // both classes are actually predicted (not a constant classifier)
    assert(rows.count(_.getAs[Int]("nb_keep") === 1) > 50)
    assert(rows.count(_.getAs[Int]("nb_keep") === 0) > 50)
  }

  test("calibration: bins clamp, counts conserve, pass rate monotone") {
    val rows = q("q_quality_calibrate").collect().sortBy(_.getAs[Long]("bin"))
    assert(rows.map(_.getAs[Long]("n_docs")).sum === 500L)
    rows.foreach { r =>
      val b = r.getAs[Long]("bin")
      assert(b >= -4L && b <= 3L)
      // the decision boundary is lo > 0, so sign(bin) pins n_keep
      if (b >= 1) assert(r.getAs[Long]("n_keep") === r.getAs[Long]("n_docs"))
      if (b <= -1) assert(r.getAs[Long]("n_keep") === 0L)
    }
    // reliability: empirical pass rate rises with the margin bin
    val rates = rows.map(_.getAs[Double]("pass_rate"))
    assert(rates.zip(rates.tail).forall { case (a, b) => a <= b },
      s"calibration not monotone: ${rates.toSeq}")
  }

  test("paths are bounded at 5 hops and counts conserve user-days") {
    val rows = q("q_events_paths").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val hops = r.getAs[String]("path").split(">")
      assert(hops.length <= 5 && hops.nonEmpty)
    }
    val totalDays = Tables.t(spark, sf0, "events")
      .select(col("user_id"), to_date(col("ts"))).distinct().count()
    assert(rows.map(_.getAs[Long]("n")).sum <= totalDays)
  }
}

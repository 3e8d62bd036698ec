package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}

/** Bit-level invariants of the 40-bit frame codec (SURVEY §5.2 #3):
  * decode(encode(x)) == x for random field values, plus the reference's
  * counting idioms (filler suppression, flashing mask arithmetic). */
class DecodeSpec extends SparkSuite {

  private val fieldGen = for {
    tot <- Gen.choose(0L, 511L)
    toa <- Gen.choose(0L, 1023L)
    cal <- Gen.choose(0L, 15L)
    c <- Gen.choose(0L, 15L)
    r <- Gen.choose(0L, 15L)
    kind <- Gen.choose(0L, 3L)
  } yield (tot, toa, cal, c, r, kind)

  test("frame encode/decode roundtrip over random 40-bit patterns") {
    import spark.implicits._
    // fixed-seed scalacheck sampling (no scalatestplus bridge on the
    // offline classpath)
    val params = Gen.Parameters.default
    val rows = Gen.listOfN(512, fieldGen)
      .apply(params, rng.Seed(42L)).get
    val df = rows.toDF("tot", "toa", "cal", "c", "r", "kind")
      .withColumn("word", expr(
        """tot | shiftleft(toa, 9) | shiftleft(cal, 19)
           | shiftleft(c, 23) | shiftleft(r, 27) | shiftleft(kind, 31)"""))
      .withColumn("d_tot", expr("word & 511"))
      .withColumn("d_toa", expr("shiftright(word, 9) & 1023"))
      .withColumn("d_cal", expr("shiftright(word, 19) & 15"))
      .withColumn("d_c", expr("shiftright(word, 23) & 15"))
      .withColumn("d_r", expr("shiftright(word, 27) & 15"))
      .withColumn("d_kind", expr("shiftright(word, 31) & 3"))
    val bad = df.filter(
      col("d_tot") =!= col("tot") || col("d_toa") =!= col("toa") ||
      col("d_cal") =!= col("cal") || col("d_c") =!= col("c") ||
      col("d_r") =!= col("r") || col("d_kind") =!= col("kind")).count()
    assert(bad === 0L)
  }

  test("filler suppression: kept + suppressed == total (300-in/300-out)") {
    val total = q("q_scan_binary").collect()(0).getAs[Long]("n_words")
    val kept = q("q_filler_suppress")
      .agg(sum(col("n"))).collect()(0).getLong(0)
    val fillers = q("q_frame_decode")
      .filter(col("kind_name") === "filler").count()
    assert(kept + fillers === total)
  }

  test("flashing mask: masked + kept == total per event type") {
    val rows = q("q_flashing_mask").collect()
    assert(rows.nonEmpty)
    rows.foreach { row =>
      val masked = row.getAs[Long]("n_masked")
      val keptN = row.getAs[Long]("n_kept")
      assert(row.getAs[Long]("n_triggers") <= keptN)
      assert(masked + keptN > 0)
    }
    val total = rows.map(r =>
      r.getAs[Long]("n_masked") + r.getAs[Long]("n_kept")).sum
    assert(total === q("q_scan_binary").collect()(0).getAs[Long]("n_words"))
  }

  test("threshold scan covers exactly the populated pixel cells") {
    val cells = q("q_threshold_scan").collect()
    val expected = Tables.t(spark, sf0, "events")
      .selectExpr("event_id % 16 AS r", "user_id % 16 AS c")
      .distinct().count()
    assert(cells.length.toLong === expected)
    assert(cells.length <= 256)
    assert(cells.forall(_.getAs[Long]("n_samples") > 0))
  }

  test("self-trigger hits all exceed their pixel DAC") {
    val bad = q("q_self_trigger")
      .filter(col("value") <= col("dac")).count()
    assert(bad === 0L)
  }
}

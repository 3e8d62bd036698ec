package graft

import org.apache.spark.sql.functions._

/** Privacy-audit operators: l-diversity census and the seeded
  * DP histogram release. */
class PrivacySpec extends SparkSuite {

  import spark.implicits._

  test("ldiv: a planted single-segment class is flagged, mixed is not") {
    val cust = Seq(
      // class (0, band 1): 4 members, 3 distinct segments — safe
      (1L, 0L, "SEG_A", 1500.0), (2L, 0L, "SEG_B", 1600.0),
      (3L, 0L, "SEG_C", 1700.0), (4L, 0L, "SEG_A", 1800.0),
      // class (1, band 2): 5 members, ONE segment — leaks the segment
      (5L, 1L, "SEG_A", 2100.0), (6L, 1L, "SEG_A", 2200.0),
      (7L, 1L, "SEG_A", 2300.0), (8L, 1L, "SEG_A", 2400.0),
      (9L, 1L, "SEG_A", 2500.0),
      // negative balance lands in band -1 (floor division, not trunc)
      (10L, 2L, "SEG_B", -500.0))
      .toDF("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal")
    val dir = fixtureDir("priv_ldiv")("customer" -> cust)
    val got = q("q_audit_ldiv", dir).collect()
      .map(r => (r.getAs[Long]("c_nationkey"), r.getAs[Long]("bal_band"))
        -> (r.getAs[Long]("class_size"), r.getAs[Long]("l_div"),
          r.getAs[Boolean]("at_risk"))).toMap
    assert(got((0L, 1L)) === ((4L, 3L, false)))
    assert(got((1L, 2L)) === ((5L, 1L, true)))
    // -500.00 cents = -50000; (-50000 + 100000) div 100000 - 1 = -1
    assert(got((2L, -1L)) === ((1L, 1L, true)))
  }

  test("dp_hist: noise is bounded, deterministic, and n_dp floored at 0") {
    val r1 = q("q_audit_dp_hist").collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_true"), r.getAs[Long]("noise"),
          r.getAs[Long]("n_dp"))).toMap
    r1.foreach { case (et, (n, noise, ndp)) =>
      assert(noise >= -16L && noise <= 16L, s"$et noise $noise")
      assert(ndp === math.max(0L, n + noise), s"$et floor")
    }
    // seeded draw: identical across reruns
    val r2 = q("q_audit_dp_hist").collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_true"), r.getAs[Long]("noise"),
          r.getAs[Long]("n_dp"))).toMap
    assert(r1 === r2)
    // and the noise CASE chain actually varies across categories on a
    // synthetic many-category fixture (not stuck on one branch)
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val ev = (0 until 400).map { i =>
      (i.toLong, ts0, i.toLong, s"type_$i", 10.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = fixtureDir("priv_dp")("events" -> ev)
    val noises = q("q_audit_dp_hist", dir).collect()
      .map(_.getAs[Long]("noise")).toSet
    assert(noises.size >= 3, s"noise distribution collapsed: $noises")
  }

  test("t-closeness: per-segment EMD rollup replays exactly") {
    val rows = Tables.t(spark, sf0, "customer")
      .select(col("c_mktsegment"), col("c_nationkey").cast("long"),
        expr("""(CAST(floor(c_acctbal * 100 + 0.5D) AS BIGINT)
                 + 100000L) div 110000L""").as("sbin"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val nn = rows.length.toLong
    val gcum = (0L to 8L).map(j => j -> rows.count(_._3 <= j).toLong)
      .toMap
    val perClass = rows.groupBy(r => (r._1, r._2)).map {
      case ((seg, _), rs) =>
        val ng = rs.length.toLong
        val emd = (0L to 8L).map { j =>
          (BigInt(rs.count(_._3 <= j)) * nn - BigInt(gcum(j)) * ng).abs
        }.sum
        (seg, ng, (BigInt(1000000) * emd / (BigInt(ng) * nn * 9)).toLong)
    }.toSeq
    val bySeg = perClass.groupBy(_._1)
    val got = q("q_audit_tcloseness").collect()
    assert(got.length === bySeg.size)
    got.foreach { r =>
      val cs = bySeg(r.getAs[String]("c_mktsegment"))
      assert(r.getAs[Long]("n_classes") === cs.length.toLong)
      assert(r.getAs[Long]("max_t_micro") === cs.map(_._3).max)
      val viol = cs.filter(_._3 > 250000)
      assert(r.getAs[Long]("n_violations") === viol.length.toLong)
      assert(r.getAs[Long]("rows_at_risk") === viol.map(_._2).sum)
      // t is a distance between distributions: inside [0, 1]
      cs.foreach(c => assert(c._3 >= 0L && c._3 <= 1000000L))
    }
  }
}

package graft

import org.apache.spark.sql.functions._

/** Biz tier — overlap symmetry/bounds, RFM scoring invariants, and
  * basket-lift recompute at sf0.001. */
class BizSpec extends SparkSuite {

  test("source overlap is a full upper-triangular matrix of ratios") {
    val rows = q("q_source_overlap").collect()
    val sources = Tables.t(spark, sf0, "documents")
      .select(col("source")).distinct().count().toInt
    assert(rows.length === sources * (sources - 1) / 2)
    rows.foreach { r =>
      val j = r.getAs[Double]("jaccard")
      assert(j >= 0.0 && j <= 1.0)
      assert(r.getAs[String]("sa") < r.getAs[String]("sb"))
    }
  }

  test("RFM scores equal a driver-side percentile-cut recompute") {
    val rows = q("q_events_rfm").collect()
    assert(rows.nonEmpty)
    // the exact (n-1)p interpolation both engines use for the cuts
    def cuts(xs: Seq[Long]): Seq[Double] = {
      val s = xs.sorted
      Seq(0.2, 0.4, 0.6, 0.8).map { pt =>
        val rank = (s.length - 1) * pt
        val lo = rank.toInt
        val frac = rank - lo
        if (lo + 1 < s.length) s(lo) + frac * (s(lo + 1) - s(lo))
        else s(lo).toDouble
      }
    }
    def bucket(v: Long, cs: Seq[Double]): Long = cs.count(v > _).toLong
    val rc = cuts(rows.map(_.getAs[Long]("recency_days")).toSeq)
    val fc = cuts(rows.map(_.getAs[Long]("frequency")).toSeq)
    val mc = cuts(rows.map(_.getAs[Long]("monetary_cents")).toSeq)
    rows.foreach { r =>
      // value quintiles, 5 = best: recency inverted, freq/monetary up
      assert(r.getAs[Long]("r_score") ===
        5L - bucket(r.getAs[Long]("recency_days"), rc))
      assert(r.getAs[Long]("f_score") ===
        1L + bucket(r.getAs[Long]("frequency"), fc))
      assert(r.getAs[Long]("m_score") ===
        1L + bucket(r.getAs[Long]("monetary_cents"), mc))
      assert(r.getAs[String]("segment") ===
        s"${r.getAs[Long]("r_score")}${r.getAs[Long]("f_score")}" +
          s"${r.getAs[Long]("m_score")}")
      assert(r.getAs[Long]("recency_days") >= 0L)
    }
    // ties share a bucket, so scores are monotone in the metric
    val byRec = rows.sortBy(_.getAs[Long]("recency_days"))
    assert(byRec.sliding(2).forall(w =>
      w(0).getAs[Long]("r_score") >= w(1).getAs[Long]("r_score")))
  }

  test("basket lift matches a driver-side recompute for the top pair") {
    val top = q("q_basket_lift").collect().head
    val (ba, bb) = (top.getAs[String]("ba"), top.getAs[String]("bb"))
    val lines = Tables.t(spark, sf0, "lineitem")
      .join(Tables.t(spark, sf0, "part"),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("p_brand")).distinct()
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val byOrder = lines.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val nBoth = byOrder.values.count(s => s.contains(ba) && s.contains(bb))
    val na = lines.count(_._2 == ba)
    val nb = lines.count(_._2 == bb)
    val nOrders = Tables.t(spark, sf0, "orders").count()
    assert(top.getAs[Long]("n_both") === nBoth.toLong)
    val want = BigDecimal(nBoth.toDouble * nOrders / (na.toLong * nb))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(top.getAs[Double]("lift") === want)
  }

  test("Wilson lower bound is below the raw proportion and in [0,1]") {
    val rows = q("q_stats_wilson").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val p = r.getAs[Long]("n_returned").toDouble / r.getAs[Long]("n_lines")
      val wl = r.getAs[Double]("wilson_lower")
      assert(wl >= 0.0 && wl <= 1.0)
      assert(wl <= p + 1e-9, s"lower bound above raw proportion: $wl > $p")
    }
  }

  test("cohort LTV curves are monotone non-decreasing in age") {
    val rows = q("q_cohort_ltv").collect()
      .map(r => (r.getAs[Long]("cohort_week"), r.getAs[Long]("age_week"),
        r.getAs[Double]("cum_revenue")))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, curve) =>
      val sorted = curve.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b._3 >= a._3)
        case _ => ()
      }
    }
  }

  test("streaks match a driver-side islands replay") {
    val got = q("q_events_streaks").collect()
      .map(r => r.getAs[Long]("user_id") ->
        r.getAs[Long]("longest_streak")).toMap
    val days = Tables.t(spark, sf0, "events")
      .select(col("user_id"), datediff(col("ts").cast("date"),
        lit("2024-01-01").cast("date")).cast("long")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    days.groupBy(_._1).foreach { case (u, ds) =>
      val sorted = ds.map(_._2).sorted
      var best = 1L; var cur = 1L
      sorted.sliding(2).foreach { w =>
        if (w.length == 2) {
          if (w(1) == w(0) + 1) { cur += 1; best = math.max(best, cur) }
          else cur = 1
        }
      }
      assert(got(u) === best, s"user $u")
    }
  }

  test("cadence gaps conserve the order count per customer") {
    val rows = q("q_orders_cadence").collect()
    assert(rows.nonEmpty)
    val orderCounts = Tables.t(spark, sf0, "orders")
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val ck = r.getAs[Long]("o_custkey")
      assert(r.getAs[Long]("n_gaps") === orderCounts(ck) - 1)
      assert(r.getAs[Double]("mean_gap_days") <=
        r.getAs[Long]("max_gap").toDouble + 1e-9)
    }
  }

  test("Gini matches a driver-side replay and sits in [0,1)") {
    val r = q("q_agg_gini").collect()(0)
    val g = r.getAs[Double]("gini")
    assert(g >= 0.0 && g < 1.0)
    val cents = Tables.t(spark, sf0, "orders")
      .select(col("o_custkey"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("c"))
      .groupBy(col("o_custkey")).agg(sum(col("c")).as("c"))
      .collect().map(x => (x.getLong(0), x.getLong(1)))
      .sortBy(t => (t._2, t._1)).map(_._2)
    val n = cents.length.toLong
    val sx = cents.sum
    val six = cents.zipWithIndex.map { case (c, i) => (i + 1L) * c }.sum
    val want = BigDecimal(six.toDouble * 2 / (n * sx.toDouble) -
      (n + 1).toDouble / n)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(g === want)
  }

  test("DAU/MAU stickiness is a ratio and MAU dominates DAU") {
    val rows = q("q_events_dau_mau").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("mau") >= r.getAs[Long]("dau"))
      val st = r.getAs[Double]("stickiness")
      assert(st > 0.0 && st <= 1.0)
    }
  }

  test("lead-time percentiles are ordered p50 <= p90 <= max") {
    val rows = q("q_orders_leadtime").collect()
    assert(rows.length === 5)
    rows.foreach { r =>
      val p50 = r.getAs[Double]("p50_days")
      val p90 = r.getAs[Double]("p90_days")
      assert(p50 >= 0.0 && p50 <= p90)
      assert(p90 <= r.getAs[Long]("max_days").toDouble)
    }
    val total = rows.map(_.getAs[Long]("n_lines")).sum
    assert(total === Tables.t(spark, sf0, "lineitem").count())
  }

  test("gini: sharded rank equals a driver-side global-sort recompute") {
    // the sharded bucket/offset rank must reproduce the exact
    // rank-weighted identity a single global sort would give
    val row = q("q_agg_gini").collect().head
    val per = Tables.t(spark, sf0, "orders")
      .select(col("o_custkey"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
      .groupBy(col("o_custkey")).agg(sum(col("cents")).as("cents"))
      .collect().map(r => (r.getAs[Long]("o_custkey"), r.getAs[Long]("cents")))
    val sorted = per.sortBy { case (k, c) => (c, k) }
    val n = sorted.length.toLong
    val sx = sorted.map(_._2).sum
    val six = sorted.zipWithIndex.map { case ((_, c), i) => (i + 1) * c }.sum
    val want = BigDecimal(six.toDouble * 2 / (n * sx.toDouble) -
      (n + 1).toDouble / n)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(row.getAs[Long]("n") === n)
    assert(row.getAs[Double]("gini") === want)
  }

  test("ANN eval table covers all five variants with recall in [0,1]") {
    val rows = q("q_sim_ann_eval").collect()
    assert(rows.map(_.getAs[String]("variant")).toSeq ===
      Seq("ivf", "ivfpq", "lsh", "multiband", "pq"))
    rows.foreach { r =>
      assert(r.getAs[Long]("k") === 10L)
      val rec = r.getAs[Double]("recall_at_10")
      assert(rec >= 0.0 && rec <= 1.0)
    }
    // the OR-amplified multiband config must dominate single-bucket LSH
    // on the quasi-random fixture (that is what it was tuned for)
    val byV = rows.map(r => r.getAs[String]("variant") ->
      r.getAs[Double]("recall_at_10")).toMap
    assert(byV("multiband") >= byV("lsh"))
  }

  test("orders_backlog: interval accounting conserves and replays") {
    val rows = q("q_orders_backlog").collect()
    val nOrders = Tables.t(spark, sf0, "orders").count()
    val nClosed = Tables.t(spark, sf0, "lineitem")
      .select(col("l_orderkey")).distinct().count()
    assert(rows.map(_.getAs[Long]("opened")).sum === nOrders)
    assert(rows.map(_.getAs[Long]("closed")).sum === nClosed)
    // running identity: backlog == cum(opened) - cum(closed) row by row
    var co = 0L; var cc = 0L
    rows.foreach { r =>
      co += r.getAs[Long]("opened"); cc += r.getAs[Long]("closed")
      assert(r.getAs[Long]("backlog") === co - cc)
    }
    // final backlog = orders that never shipped a line
    assert(rows.last.getAs[Long]("backlog") === nOrders - nClosed)
  }

  test("multimodal_scenecut: cut census matches a scalar feature walk") {
    val got = SparkEntry.queries("q_multimodal_scenecut")(spark, sf0)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_frames"), r.getAs[Long]("n_cuts")))
      .toMap
    val docs = Tables.t(spark, sf0, "documents")
      .filter(col("doc_id") % 3 === 2)
      .select(col("doc_id"), md5(col("text").cast("binary")))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    docs.foreach { case (id, hex) =>
      val nf = 1 + (hex.charAt(2).toInt % 7)
      val feats = (0 until nf).map(i =>
        (hex.charAt(i % 8).toInt * 7 + i * 13) % 256)
      val cuts = feats.sliding(2).count {
        case Seq(a, b) => math.abs(b - a) > 64
        case _ => false
      }
      val (gn, gc) = got(id)
      assert(gn === nf.toLong, s"doc $id frames")
      assert(gc === cuts.toLong, s"doc $id cuts")
    }
  }
  test("cooccur: counts and lift match a scalar bipartite replay") {
    val got = q("q_events_cooccur").collect()
      .map(r => (r.getAs[String]("type_a"), r.getAs[String]("type_b"))
        -> (r.getAs[Long]("n_both"), r.getAs[Long]("lift_micro"),
          r.getAs[Double]("cosine"))).toMap
    val ut = Tables.t(spark, sf0, "events")
      .select(col("user_id"), col("event_type")).distinct()
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val byType = ut.groupBy(_._2).view.mapValues(_.map(_._1).toSet)
      .toMap
    val nTotal = ut.map(_._1).distinct.length.toLong
    val types = byType.keys.toSeq.sorted
    for (i <- types.indices; j <- (i + 1) until types.length) {
      val (a, b) = (types(i), types(j))
      val nb = (byType(a) & byType(b)).size.toLong
      val (na, nbb) = (byType(a).size.toLong, byType(b).size.toLong)
      if (nb > 0) {
        val (gn, gl, gc) = got((a, b))
        assert(gn === nb, s"($a,$b) n_both")
        assert(gl === (BigInt(1000000) * nb * nTotal /
          (BigInt(na) * nbb)).toLong, s"($a,$b) lift")
        assert(math.abs(gc - nb / math.sqrt(na.toDouble * nbb)) < 1e-6)
      }
    }
  }

  test("fano: daily-count dispersion replays exactly per type") {
    val cells = Tables.t(spark, sf0, "events")
      .select(col("event_type"), to_date(col("ts")))
      .collect().map(r => (r.getString(0), r.getDate(1).toString))
      .groupBy(identity).view.mapValues(_.size.toLong)
      .toSeq.groupBy(_._1._1)
    val got = q("q_events_fano").collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_days"), r.getAs[Double]("mean_daily"),
          r.getAs[Double]("fano"))).toMap
    cells.foreach { case (et, ds) =>
      val ns = ds.map(_._2)
      val d = ns.length.toLong
      val s1 = ns.sum
      val s2 = ns.map(n => BigInt(n) * n).sum
      val mean = s1.toDouble / d
      val fano = (s2.toDouble - s1.toDouble * s1 / d) / (d - 1) / mean
      def r6(x: Double) = BigDecimal(x)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got(et)._1 === d)
      assert(got(et)._2 === r6(mean))
      assert(got(et)._3 === r6(fano), s"fano for $et")
    }
  }

  test("jsd: bounded in [0, ln 2] and the first pair replays exactly") {
    val got = q("q_text_jsd").collect()
    val nSources = Tables.t(spark, sf0, "documents")
      .select(col("source")).distinct().count()
    assert(got.length === (nSources * (nSources - 1) / 2).toInt)
    got.foreach { r =>
      val v = r.getAs[Double]("jsd")
      assert(v >= 0.0 && v <= math.log(2.0) + 1e-9, s"jsd=$v")
    }
    // scalar replay for the lexicographically first source pair
    val first = got.head
    val (sa, sb) = (first.getAs[String]("sa"), first.getAs[String]("sb"))
    val counts = Tables.t(spark, sf0, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .collect().map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).view
      .mapValues(_.groupBy(_._2).view.mapValues(_.length.toLong).toMap)
      .toMap
    val (ta, tb) = (counts(sa), counts(sb))
    val (na, nb) = (ta.values.sum, tb.values.sum)
    val sharedW = ta.keySet.intersect(tb.keySet)
    val st = sharedW.toSeq.map { w =>
      val p = ta(w).toDouble / na
      val q = tb(w).toDouble / nb
      math.floor((p * math.log(2.0 * p / (p + q)) +
        q * math.log(2.0 * q / (p + q))) * 1e12 + 0.5).toLong
    }.sum
    val sca = sharedW.toSeq.map(ta).sum
    val scb = sharedW.toSeq.map(tb).sum
    val want = BigDecimal(0.5 * (st.toDouble / 1e12 +
      (1.0 - sca.toDouble / na) * math.log(2.0) +
      (1.0 - scb.toDouble / nb) * math.log(2.0)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(first.getAs[Long]("n_shared") === sharedW.size.toLong)
    assert(first.getAs[Double]("jsd") === want)
  }
}

package graft

import org.apache.spark.sql.functions._

/** Scalar replays for the survival / attribution / resampling tier:
  * every statistic is recomputed with naive driver-side code on sf0.001
  * and compared against the distributed result, plus the exact-credit
  * conservation laws the largest-remainder splits must obey. */
class CausalSpec extends SparkSuite {

  private def md5u32(key: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(key.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 8), 16)
  }

  /** (t, e) observations: per-customer gaps, censored tail at max date. */
  private def survObs(): Array[(Long, Int)] = {
    val rows = Tables.t(spark, sf0, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("date"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getDate(2).toLocalDate))
    val mx = rows.map(_._3).max
    rows.groupBy(_._1).values.flatMap { os =>
      val sorted = os.sortBy(o => (o._3.toEpochDay, o._2))
      val gaps = sorted.sliding(2).collect {
        case Array(a, b) => (b._3.toEpochDay - a._3.toEpochDay, 1)
      }.toSeq
      gaps :+ ((mx.toEpochDay - sorted.last._3.toEpochDay, 0))
    }.toArray
  }

  test("surv_km: curve matches a scalar product-limit replay") {
    val got = q("q_surv_km").collect()
    val obs = survObs()
    val byT = obs.groupBy(_._1).view.mapValues { g =>
      (g.count(_._2 == 1).toLong, g.count(_._2 == 0).toLong)
    }.toMap
    val ts = byT.keys.toSeq.sorted
    var atRisk = obs.length.toLong
    var surv = 1.0
    val want = ts.map { t =>
      val (d, c) = byT(t)
      val row = (t, atRisk, d, c, {
        surv *= 1.0 - d.toDouble / atRisk; surv
      })
      atRisk -= d + c
      row
    }
    assert(got.length === want.length)
    got.zip(want).foreach { case (g, (t, n, d, c, s)) =>
      assert(g.getAs[Long]("t") === t)
      assert(g.getAs[Long]("n_at_risk") === n)
      assert(g.getAs[Long]("d") === d)
      assert(g.getAs[Long]("c") === c)
      assert(math.abs(g.getAs[Double]("surv") - s) < 1e-5,
        s"t=$t got ${g.getAs[Double]("surv")} want $s")
    }
    // monotone non-increasing survival
    val survs = got.map(_.getAs[Double]("surv"))
    assert(survs.zip(survs.tail).forall { case (a, b) => b <= a + 1e-9 })
  }

  test("surv_logrank: chi2 matches a scalar replay") {
    val row = q("q_surv_logrank").collect().head
    val seg = Tables.t(spark, sf0, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = Tables.t(spark, sf0, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("date"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDate(2).toLocalDate))
    val mx = rows.map(_._3).max
    val obs = rows.groupBy(_._1).toSeq.flatMap { case (cust, os) =>
      val g = if (seg(cust) == "BUILDING") 1 else 0
      val sorted = os.sortBy(o => (o._3.toEpochDay, o._2))
      val gaps = sorted.sliding(2).collect {
        case Array(a, b) => (b._3.toEpochDay - a._3.toEpochDay, 1, g)
      }.toSeq
      gaps :+ ((mx.toEpochDay - sorted.last._3.toEpochDay, 0, g))
    }
    val byT = obs.groupBy(_._1).view.mapValues { rs =>
      (rs.count(r => r._2 == 1 && r._3 == 1).toLong,
        rs.count(r => r._2 == 0 && r._3 == 1).toLong,
        rs.count(_._2 == 1).toLong, rs.count(_._2 == 0).toLong)
    }.toMap
    var n1 = obs.count(_._3 == 1).toLong
    var nn = obs.length.toLong
    var sumOe = 0L; var sumV = 0L; var d1Total = 0L
    byT.keys.toSeq.sorted.foreach { t =>
      val (d1, c1, d, c) = byT(t)
      if (d > 0 && nn > 1) {
        val e1 = d.toDouble * n1 / nn
        val v = d.toDouble * (n1.toDouble / nn) * (1.0 - n1.toDouble / nn) *
          (nn - d) / (nn - 1)
        sumOe += d1 * 1000000L - math.floor(e1 * 1e6 + 0.5).toLong
        sumV += math.floor(v * 1e6 + 0.5).toLong
        d1Total += d1
      }
      n1 -= d1 + c1; nn -= d + c
    }
    val chi2 = math.pow(sumOe / 1e6, 2) / (sumV / 1e6)
    assert(row.getAs[Long]("d1_total") === d1Total)
    assert(math.abs(row.getAs[Double]("chi2") - chi2) < 1e-5,
      s"got ${row.getAs[Double]("chi2")} want $chi2")
  }

  test("attribution: every model conserves total purchase cents exactly") {
    val rows = q("q_events_attribution").collect()
    val totalPc = Tables.t(spark, sf0, "events")
      .filter(col("event_type") === "purchase")
      .select(floor(col("value") * 100 + 0.5).cast("long").as("pc"))
      .collect().map(_.getLong(0)).sum
    Seq("first_cents", "last_cents", "linear_cents", "pos_cents")
      .foreach { m =>
        val s = rows.map(_.getAs[Long](m)).sum
        assert(s === totalPc, s"$m sums $s, want $totalPc")
      }
    // channels restricted to the modeled grid
    assert(rows.map(_.getAs[String]("channel")).toSet
      .subsetOf(Set("click", "view", "direct")))
  }

  test("pps: deterministic priorities, ascending, exactly 200 rows") {
    val got = q("q_sample_pps", "/root/testdata/sf0.01").collect()
    assert(got.length === 200)
    val pris = got.map(_.getAs[Double]("pri_scaled"))
    assert(pris.zip(pris.tail).forall { case (a, b) => a <= b })
    // replay the winning set scalar-side from the same hash
    val want = Tables.t(spark, "/root/testdata/sf0.01", "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
      .collect()
      .map { r =>
        val k = r.getLong(0)
        val w = math.floor(r.getDouble(1) * 100 + 0.5).toLong
        val pri = (md5u32(k.toString) + 1L) / 4294967296.0 / w
        (k, pri)
      }
      .sortBy { case (k, pri) => (pri, k) }
      .take(200).map(_._1).toSet
    assert(got.map(_.getAs[Long]("o_orderkey")).toSet === want)
  }

  test("sample_ht: estimator matches a scalar Poisson-PPS replay") {
    val row = q("q_sample_ht").collect().head
    val os = Tables.t(spark, sf0, "orders")
      .select(col("o_orderkey"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val ww = os.map(_._2).sum
    var nS = 0L; var htN = 0L; var htT = 0L
    os.foreach { case (k, w) =>
      val u = (md5u32(k.toString) + 1L) / 4294967296.0
      val pi = math.min(1.0, 200.0 * w / ww)
      // certainty units (pi >= 1) are unconditionally in-sample
      if (u < pi || pi >= 1.0) {
        nS += 1
        htN += math.floor(1e6 / pi + 0.5).toLong
        htT += math.floor(w * 1e2 / pi + 0.5).toLong
      }
    }
    assert(row.getAs[Long]("n_pop") === os.length.toLong)
    assert(row.getAs[Long]("true_total_cents") === ww)
    assert(row.getAs[Long]("n_sampled") === nS)
    assert(math.abs(row.getAs[Double]("ht_n_est") - htN / 1e6) < 1e-5)
    assert(math.abs(row.getAs[Double]("ht_total_est") - htT / 1e2) < 1e-5)
    // HT size estimate should land in the right ballpark of the truth
    assert(math.abs(row.getAs[Double]("ht_n_est") - os.length) <
      0.5 * os.length)
  }

  test("ml_adaboost: two boosted stumps match a scalar replay") {
    val row = q("q_ml_adaboost").collect().head
    val data = Tables.t(spark, sf0, "events")
      .select(when(col("event_type") === "error", 1L).otherwise(0L),
        hour(col("ts")).cast("long"),
        floor(col("value") * 100 + 0.5).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // weighted stump search: (feature, thr, predL, predR, werr, wt)
    def search(wgt: ((Long, Long, Long)) => Long)
        : (String, Long, Long, Long, Long, Long) = {
      def forF(f: String, x: ((Long, Long, Long)) => Long) = {
        val cells = data.groupBy(x).toSeq.sortBy(_._1)
        val wt = data.map(wgt).sum
        val wtp = data.filter(_._1 == 1L).map(wgt).sum
        var wl = 0L; var wlp = 0L
        cells.dropRight(1).map { case (xv, g) =>
          wl += g.map(wgt).sum; wlp += g.filter(_._1 == 1L).map(wgt).sum
          val predL = if (2 * wlp > wl) 1L else 0L
          val predR = if (2 * (wtp - wlp) > wt - wl) 1L else 0L
          val werr = math.min(wlp, wl - wlp) +
            math.min(wtp - wlp, (wt - wl) - (wtp - wlp))
          (werr, f, xv, predL, predR, wt)
        }
      }
      val all = forF("hour", _._2) ++ forF("cents", _._3)
      val b = all.minBy(c => (c._1, c._2, c._3))
      (b._2, b._3, b._4, b._5, b._1, b._6)
    }
    val s1 = search(_ => 1000000L)
    val rq = (BigInt(s1._6 - s1._5) * 1000000 / s1._5).toLong
    def p1(r: (Long, Long, Long)): Long = {
      val x = if (s1._1 == "hour") r._2 else r._3
      if (x <= s1._2) s1._3 else s1._4
    }
    val s2 = search(r => if (p1(r) == r._1) 1000000L else rq)
    assert(row.getAs[String]("f1") === s1._1)
    assert(row.getAs[Long]("t1") === s1._2)
    assert(row.getAs[String]("f2") === s2._1)
    assert(row.getAs[Long]("t2") === s2._2)
    val a1 = 0.5 * math.log((s1._6.toDouble - s1._5) / s1._5)
    val a2 = 0.5 * math.log((s2._6.toDouble - s2._5) / s2._5)
    assert(math.abs(row.getAs[Double]("alpha1") - a1) < 1e-5)
    assert(math.abs(row.getAs[Double]("alpha2") - a2) < 1e-5)
    def p2(r: (Long, Long, Long)): Long = {
      val x = if (s2._1 == "hour") r._2 else r._3
      if (x <= s2._2) s2._3 else s2._4
    }
    val correct = data.count(r =>
      (if (a1 * (2 * p1(r) - 1) + a2 * (2 * p2(r) - 1) > 0.0) 1L
       else 0L) == r._1)
    assert(row.getAs[Long]("n_correct") === correct.toLong)
  }

  test("ml_stump: winner matches a naive exhaustive split search") {
    val row = q("q_ml_stump").collect().head
    val data = Tables.t(spark, sf0, "events")
      .select(when(col("event_type") === "error", 1L).otherwise(0L),
        hour(col("ts")).cast("long"),
        floor(col("value") * 100 + 0.5).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def bestFor(feature: String, xs: Array[(Long, Long)])
        : Seq[(Double, String, Long)] = {
      val nn = xs.length.toLong
      val pp = xs.map(_._2).sum
      xs.groupBy(_._1).toSeq.sortBy(_._1).foldLeft(
        (0L, 0L, Seq.empty[(Double, String, Long)])) {
        case ((nl0, pl0, acc), (x, g)) =>
          val nl = nl0 + g.length; val pl = pl0 + g.map(_._2).sum
          if (nl < nn) {
            val nr = nn - nl; val pr = pp - pl
            val gini = (nl - (pl.toDouble * pl +
              (nl - pl).toDouble * (nl - pl)) / nl +
              nr - (pr.toDouble * pr +
                (nr - pr).toDouble * (nr - pr)) / nr) / nn
            (nl, pl, acc :+ ((gini, feature, x)))
          } else (nl, pl, acc)
      }._3
    }
    val cands =
      bestFor("hour", data.map(r => (r._2, r._1))) ++
        bestFor("cents", data.map(r => (r._3, r._1)))
    val (gini, feature, thr) = cands.minBy(c => (c._1, c._2, c._3))
    assert(row.getAs[String]("feature") === feature)
    assert(row.getAs[Long]("threshold") === thr)
    assert(math.abs(row.getAs[Double]("gini") - gini) < 1e-5)
  }

  test("bootstrap: CI matches a scalar Poisson-multiplicity replay") {
    val row = q("q_stats_bootstrap").collect().head
    val pur = Tables.t(spark, sf0, "events")
      .filter(col("event_type") === "purchase")
      .select(col("event_id"),
        floor(col("value") * 100 + 0.5).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val th = Array(0.36787944117144233, 0.7357588823428847,
      0.9196986029286058, 0.9810118431238462, 0.9963401531726563,
      0.9994058151824183, 0.9999167589426509)
    val means = (0 until 100).map { b =>
      var num = BigInt(0); var den = 0L
      pur.foreach { case (id, c) =>
        val h = md5u32(id.toString) % 2147483647L
        val u = ((h * 48271L + b * 16807L) % 2147483647L + 0.5) /
          2147483647.0
        val m = th.indexWhere(u < _) match {
          case -1 => 7
          case i  => i
        }
        num += BigInt(m) * c; den += m
      }
      ((num * 1000000) / den).toLong -> b
    }.sortBy(identity)
    val point = pur.map(_._2).sum * 1000000L / pur.length
    assert(math.abs(row.getAs[Double]("mean_cents") - point / 1e6) < 1e-5)
    assert(math.abs(row.getAs[Double]("ci_lo") - means(2)._1 / 1e6) < 1e-5)
    assert(math.abs(row.getAs[Double]("ci_hi") - means(97)._1 / 1e6) < 1e-5)
    assert(row.getAs[Double]("ci_lo") <= row.getAs[Double]("ci_hi"))
  }

  test("stats_permutation: p-value matches a scalar reallocation replay") {
    val row = q("q_stats_permutation").collect().head
    val pur = Tables.t(spark, sf0, "events")
      .filter(col("event_type") === "purchase")
      .select(col("event_id"),
        floor(col("value") * 100 + 0.5).cast("long"),
        when(expr("dayofweek(ts) IN (1, 7)"), 1L).otherwise(0L))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val (sa, na) = (pur.filter(_._3 == 1).map(_._2).sum,
      pur.count(_._3 == 1).toLong)
    val (sb, nb) = (pur.filter(_._3 == 0).map(_._2).sum,
      pur.count(_._3 == 0).toLong)
    val tObs = math.abs(sa * 1000000L / na - sb * 1000000L / nb)
    val n = na + nb
    val nExceed = (100 until 300).count { b =>
      var sa2 = 0L; var na2 = 0L; var sb2 = 0L; var nb2 = 0L
      pur.foreach { case (id, c, _) =>
        val h = md5u32(id.toString) % 2147483647L
        val u = (h * 48271L + b * 16807L) % 2147483647L
        if (u * n < na * 2147483647L) { sa2 += c; na2 += 1 }
        else { sb2 += c; nb2 += 1 }
      }
      val tB =
        if (na2 == 0 || nb2 == 0) 0L
        else math.abs(sa2 * 1000000L / na2 - sb2 * 1000000L / nb2)
      tB >= tObs
    }
    assert(row.getAs[Long]("na") === na)
    assert(row.getAs[Long]("nb") === nb)
    assert(math.abs(row.getAs[Double]("diff_obs_cents") - tObs / 1e6)
      < 1e-5)
    assert(row.getAs[Long]("n_exceed") === nExceed.toLong)
    assert(math.abs(row.getAs[Double]("p_value") -
      (1.0 + nExceed) / 201.0) < 1e-5)
  }

  test("sim_ndcg: micro-quantized DCG matches a scalar replay") {
    val exact = SparkEntry.queries("q_sim_topk")(spark, sf0)
      .limit(10).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("cos_sim")))
      .sortBy { case (v, c) => (-c, v) }
    val ann = SparkEntry.queries("q_sim_ann_ivf")(spark, sf0)
      .collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("cos_sim")))
      .sortBy { case (v, c) => (-c, v) }
    val eRank = exact.zipWithIndex.map { case ((v, _), i) =>
      v -> (i + 1L)
    }.toMap
    val dcg = ann.zipWithIndex.map { case ((v, _), i) =>
      val rel = eRank.get(v).map(11L - _).getOrElse(0L)
      math.floor(rel * 1e6 / math.log(i + 2.0) + 0.5).toLong
    }.sum
    val idcg = (1 to exact.length).map(r =>
      math.floor((11L - r) * 1e6 / math.log(r + 1.0) + 0.5).toLong).sum
    val row = SparkEntry.queries("q_sim_ndcg")(spark, sf0)
      .collect().head
    assert(row.getAs[Long]("dcg_micro") === dcg)
    assert(row.getAs[Long]("idcg_micro") === idcg)
    assert(math.abs(row.getAs[Double]("ndcg_at_10") -
      dcg.toDouble / idcg) < 1e-5)
    // sanity: a correct index scores in (0, 1]
    assert(row.getAs[Double]("ndcg_at_10") > 0.0 &&
      row.getAs[Double]("ndcg_at_10") <= 1.0)
  }

  test("ts_stl: decomposition reconstructs revenue exactly") {
    val rows = SparkEntry.queries("q_ts_stl")(spark, sf0).collect()
    rows.foreach { r =>
      if (!r.isNullAt(r.fieldIndex("trend"))) {
        val rev = r.getAs[Long]("rev").toDouble
        val recon = r.getAs[Double]("trend") +
          r.getAs[Double]("seasonal") + r.getAs[Double]("resid")
        assert(math.abs(recon - rev) < 1e-3,
          s"day ${r.get(0)}: $recon != $rev")
      }
    }
    // trend only where the 7-day window is full (edges null)
    assert(rows.take(3).forall(_.isNullAt(rows.head.fieldIndex("trend"))))
    assert(rows.takeRight(3)
      .forall(_.isNullAt(rows.head.fieldIndex("trend"))))
    // weekday seasonal is constant per weekday
    val byWd = rows.filter(!_.isNullAt(rows.head.fieldIndex("seasonal")))
      .groupBy(_.getAs[Long]("wd"))
    byWd.values.foreach { g =>
      assert(g.map(_.getAs[Double]("seasonal")).distinct.length === 1)
    }
  }

  test("ml_kfold: per-fold stumps match a scalar train/test replay") {
    val got = SparkEntry.queries("q_ml_kfold")(spark, sf0).collect()
      .map(r => r.getAs[Long]("fold") ->
        (r.getAs[String]("feature"), r.getAs[Long]("threshold"),
          r.getAs[Long]("n_test"), r.getAs[Long]("n_correct")))
      .toMap
    val data = Tables.t(spark, sf0, "events")
      .select(when(col("event_type") === "error", 1L).otherwise(0L),
        hour(col("ts")).cast("long"),
        floor(col("value") * 100 + 0.5).cast("long"),
        col("event_id"))
      .collect().map { r =>
        (r.getLong(0), r.getLong(1), r.getLong(2),
          md5u32(r.getLong(3).toString) % 5L)
      }
    (0L until 5L).foreach { f =>
      val train = data.filter(_._4 != f)
      def search(feat: String, x: ((Long, Long, Long, Long)) => Long) = {
        val wt = train.length.toLong
        val wtp = train.count(_._1 == 1L).toLong
        val cells = train.groupBy(x).toSeq.sortBy(_._1)
        var wl = 0L; var wlp = 0L
        cells.dropRight(1).map { case (xv, g) =>
          wl += g.length; wlp += g.count(_._1 == 1L)
          val werr = math.min(wlp, wl - wlp) +
            math.min(wtp - wlp, (wt - wl) - (wtp - wlp))
          (werr, feat, xv,
            if (2 * wlp > wl) 1L else 0L,
            if (2 * (wtp - wlp) > wt - wl) 1L else 0L)
        }
      }
      val cands = search("hour", _._2) ++ search("cents", _._3)
      val (_, feat, thr, pl, pr) = cands.minBy(c => (c._1, c._2, c._3))
      val test = data.filter(_._4 == f)
      val correct = test.count { r =>
        val x = if (feat == "hour") r._2 else r._3
        (if (x <= thr) pl else pr) == r._1
      }
      val (gf, gt, gn, gc) = got(f)
      assert(gf === feat, s"fold $f feature")
      assert(gt === thr, s"fold $f threshold")
      assert(gn === test.length.toLong)
      assert(gc === correct.toLong, s"fold $f correct")
    }
  }

  test("loghist: bit-length buckets match, median_est on one row only") {
    val rows = q("q_agg_loghist").collect()
    val cs = Tables.t(spark, sf0, "events")
      .select(floor(col("value") * 100 + 0.5).cast("long"))
      .collect().map(_.getLong(0)).filter(_ >= 1)
    val want = cs.groupBy(c => 64 - java.lang.Long.numberOfLeadingZeros(c))
    rows.foreach { r =>
      val b = r.getAs[Long]("bucket").toInt
      assert(r.getAs[Long]("n") === want(b).length.toLong)
      assert(r.getAs[Long]("lo_bound") === (1L << (b - 1)))
      assert(r.getAs[Long]("hi_bound") === (1L << b) - 1)
      assert(r.getAs[Long]("min_c") >= r.getAs[Long]("lo_bound"))
      assert(r.getAs[Long]("max_c") <= r.getAs[Long]("hi_bound"))
    }
    val ests = rows.flatMap(r => Option(r.getAs[Any]("median_est")))
    assert(ests.length === 1, "median estimate must land on one bucket")
    // the estimate sits inside its bucket's bounds
    val est = ests.head.asInstanceOf[Long]
    val crossing = rows.find(r => !r.isNullAt(r.fieldIndex("median_est"))).get
    assert(est >= crossing.getAs[Long]("lo_bound") &&
      est <= crossing.getAs[Long]("hi_bound"))
  }

  test("surv_hazard: cumulative hazard matches an integer replay") {
    val got = q("q_surv_hazard").collect()
    val obs = survObs()
    val byT = obs.groupBy(_._1).view.mapValues { g =>
      (g.count(_._2 == 1).toLong, g.count(_._2 == 0).toLong)
    }.toMap
    var atRisk = obs.length.toLong
    var cum = 0L
    val want = byT.keys.toSeq.sorted.map { t =>
      val (d, c) = byT(t)
      val h = d * 1000000L / atRisk
      cum += h
      val row = (t, atRisk, d, h, cum)
      atRisk -= d + c
      row
    }
    assert(got.length === want.length)
    got.zip(want).foreach { case (g, (t, n, d, h, hh)) =>
      assert(g.getAs[Long]("t") === t)
      assert(g.getAs[Long]("n_at_risk") === n)
      assert(g.getAs[Long]("h_micro") === h)
      assert(g.getAs[Long]("cumhaz_micro") === hh)
    }
  }

  test("ml_logreg: weights match a scalar snapped-GD replay") {
    val row = q("q_ml_logreg").collect().head
    val data = Tables.t(spark, sf0, "events")
      .select(when(col("event_type") === "error", 1.0).otherwise(0.0),
        floor(col("value") * 100 + 0.5).cast("long"),
        hour(col("ts")).cast("long"))
      .collect()
      .map(r => (r.getDouble(0), r.getLong(1) / 50000.0,
        r.getLong(2) / 24.0))
    def snap(x: Double, dp: Int): Double = {
      val f = math.pow(10, dp); math.floor(x * f + 0.5) / f
    }
    var w = (0.0, 0.0, 0.0)
    for (_ <- 1 to 3) {
      var g0 = 0.0; var g1 = 0.0; var g2 = 0.0
      data.foreach { case (y, x1, x2) =>
        val p = 1.0 / (1.0 + math.exp(-(w._1 + w._2 * x1 + w._3 * x2)))
        g0 += p - y; g1 += (p - y) * x1; g2 += (p - y) * x2
      }
      val n = data.length.toDouble
      w = (snap(w._1 - 2.0 * snap(g0, 4) / n, 8),
        snap(w._2 - 2.0 * snap(g1, 4) / n, 8),
        snap(w._3 - 2.0 * snap(g2, 4) / n, 8))
    }
    assert(math.abs(row.getAs[Double]("w0") - w._1) < 1e-6)
    assert(math.abs(row.getAs[Double]("w1") - w._2) < 1e-6)
    assert(math.abs(row.getAs[Double]("w2") - w._3) < 1e-6)
    val correct = data.count { case (y, x1, x2) =>
      (if (w._1 + w._2 * x1 + w._3 * x2 > 0) 1.0 else 0.0) == y
    }
    assert(row.getAs[Long]("n_correct") === correct.toLong)
  }

  test("ml_featimp: permuted accuracies match a scalar derangement replay") {
    val got = SparkEntry.queries("q_ml_featimp")(spark, sf0).collect()
      .map(r => r.getAs[String]("variant") ->
        (r.getAs[Long]("n_correct"), r.getAs[Double]("importance")))
      .toMap
    val data = Tables.t(spark, sf0, "events")
      .select(when(col("event_type") === "error", 1.0).otherwise(0.0),
        floor(col("value") * 100 + 0.5).cast("long"),
        hour(col("ts")).cast("long"), col("event_id"))
      .collect()
      .map(r => (r.getDouble(0), r.getLong(1) / 50000.0,
        r.getLong(2) / 24.0, r.getLong(3)))
    def snap(x: Double, dp: Int): Double = {
      val f = math.pow(10, dp); math.floor(x * f + 0.5) / f
    }
    var w = (0.0, 0.0, 0.0)
    for (_ <- 1 to 3) {
      var g0 = 0.0; var g1 = 0.0; var g2 = 0.0
      data.foreach { case (y, x1, x2, _) =>
        val p = 1.0 / (1.0 + math.exp(-(w._1 + w._2 * x1 + w._3 * x2)))
        g0 += p - y; g1 += (p - y) * x1; g2 += (p - y) * x2
      }
      val n = data.length.toDouble
      w = (snap(w._1 - 2.0 * snap(g0, 4) / n, 8),
        snap(w._2 - 2.0 * snap(g1, 4) / n, 8),
        snap(w._3 - 2.0 * snap(g2, 4) / n, 8))
    }
    val ranked = data.sortBy { case (_, _, _, id) =>
      (md5u32(id.toString), id)
    }
    val nn = ranked.length
    def pred(x1: Double, x2: Double): Double =
      if (w._1 + w._2 * x1 + w._3 * x2 > 0) 1.0 else 0.0
    var cBase = 0L; var cPermV = 0L; var cPermH = 0L
    ranked.zipWithIndex.foreach { case ((y, x1, x2, _), i) =>
      val (dy, dx1, dx2, _) = ranked((i + 1) % nn)
      val _ = dy
      if (pred(x1, x2) == y) cBase += 1
      if (pred(dx1, x2) == y) cPermV += 1
      if (pred(x1, dx2) == y) cPermH += 1
    }
    assert(got("base")._1 === cBase)
    assert(got("perm_value")._1 === cPermV)
    assert(got("perm_hour")._1 === cPermH)
    assert(got("base")._2 === 0.0)
    assert(math.abs(got("perm_value")._2 -
      snap((cBase - cPermV).toDouble / nn, 6)) < 1e-9)
  }

  test("ts_changepoint: argmax matches a naive cumulative scan") {
    val df = SparkEntry.queries("q_ts_changepoint")(spark, sf0)
    // round-11 emit rule: the DECIMAL(38,0) score is internal-only;
    // nothing decimal may leave the operator (cross-engine hash).
    assert(!df.schema.fields.exists(_.dataType
      .isInstanceOf[org.apache.spark.sql.types.DecimalType]),
      s"decimal column emitted: ${df.schema.treeString}")
    val row = df.collect().head
    val days = Tables.t(spark, sf0, "events")
      .select(to_date(col("ts")),
        floor(col("value") * 100 + 0.5).cast("long"))
      .collect()
      .groupBy(_.getDate(0).toLocalDate)
      .view.mapValues(_.map(_.getLong(1)).sum).toSeq
      .sortBy(_._1.toEpochDay)
    val m = days.length.toLong
    val total = days.map(_._2).sum
    var cum = 0L
    val scored = days.zipWithIndex.flatMap { case ((day, rev), idx) =>
      cum += rev
      val i = idx + 1L
      if (i < m) Some((math.abs(m * cum - i * total), day, i, cum))
      else None
    }
    val best = scored.minBy(s => (-s._1, s._2.toEpochDay))
    // argmax rides DECIMAL(38,0) internally; the emit is score div m
    // as BIGINT (cross-engine-stable, bounded by total)
    assert(row.getAs[Long]("score_div_m") === best._1 / m)
    assert(row.getAs[java.sql.Date]("day").toLocalDate === best._2)
    assert(row.getAs[Long]("split_idx") === best._3)
    assert(row.getAs[Long]("mean_before_cents") === best._4 / best._3)
  }

  test("agg_theilsen: slope matches a naive pairwise-median replay") {
    val row = SparkEntry.queries("q_agg_theilsen")(spark, sf0)
      .collect().head
    val days = Tables.t(spark, sf0, "events")
      .select(to_date(col("ts")),
        floor(col("value") * 100 + 0.5).cast("long"))
      .collect()
      .groupBy(_.getDate(0).toLocalDate)
      .view.mapValues(_.map(_.getLong(1)).sum).toSeq
      .sortBy(_._1.toEpochDay)
      .zipWithIndex.map { case ((_, rev), idx) => (idx + 1L, rev) }
    val slopes = (for {
      (ia, ra) <- days; (ib, rb) <- days if ia < ib
    } yield (rb - ra).toDouble / (ib - ia)).sorted
    val np = slopes.length
    val medSlope =
      (slopes((np + 1) / 2 - 1) + slopes((np + 2) / 2 - 1)) / 2
    val resid = days.map { case (i, rev) => rev - medSlope * i }.sorted
    val mm = resid.length
    val medRes = (resid((mm + 1) / 2 - 1) + resid((mm + 2) / 2 - 1)) / 2
    assert(row.getAs[Long]("n_days") === days.length.toLong)
    assert(math.abs(row.getAs[Double]("slope_cents_per_day") - medSlope)
      < 1e-5)
    assert(math.abs(row.getAs[Double]("intercept_cents") - medRes) < 1e-4)
  }

  test("mix_pareto: skyline matches a naive dominance scan") {
    val got = SparkEntry.queries("q_mix_pareto")(spark, sf0).collect()
      .map(r => (r.getAs[Long]("ttr"), r.getAs[Long]("n_chars"),
        r.getAs[Long]("doc_id")))
    val docs = Tables.t(spark, sf0, "documents")
      .select(col("doc_id"), col("n_chars"), col("text")).collect()
      .map { r =>
        val toks = r.getString(2).split(" ")
        (toks.distinct.length.toLong * 100 / toks.length,
          r.getLong(1), r.getLong(0))
      }
    // cell representatives: per ttr the longest doc, lowest id on ties
    val cells = docs.groupBy(_._1).map { case (_, g) =>
      g.minBy(x => (-x._2, x._3))
    }.toSeq
    val want = cells.filter { c =>
      !cells.exists(o => o._1 > c._1 && o._2 >= c._2)
    }.sortBy(-_._1)
    assert(got.toSeq === want)
    // every returned doc is truly non-dominated in the raw corpus
    got.foreach { c =>
      assert(!docs.exists(o =>
        o._1 >= c._1 && o._2 >= c._2 && (o._1 > c._1 || o._2 > c._2) &&
          o._3 != c._3),
        s"dominated skyline point $c")
    }
  }

  test("eff_diameter: interpolated 90th crossing matches a BFS replay") {
    val row = SparkEntry.queries("q_graph_eff_diameter")(spark, sf0)
      .collect().head
    val n = Tables.t(spark, sf0, "documents").count()
    val adj = (0L until n).flatMap { src =>
      Seq(src / 2, (src * 31 + 17) % n, (src * src + 1) % n)
        .filter(_ != src).flatMap(dst => Seq(src -> dst, dst -> src))
    }.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val hist = scala.collection.mutable.Map[Long, Long]()
    (0L until 8L).foreach { l =>
      val dist = scala.collection.mutable.Map(l -> 0L)
      var frontier = Set(l)
      (1 to 6).foreach { dd =>
        frontier = frontier.flatMap(v => adj.getOrElse(v, Set.empty))
          .filterNot(dist.contains)
        frontier.foreach(v => dist(v) = dd.toLong)
      }
      dist.values.filter(_ > 0).foreach(dd =>
        hist(dd) = hist.getOrElse(dd, 0L) + 1)
    }
    val nn = hist.values.sum
    val target = (9 * nn + 9) / 10
    var cum = 0L
    val (d90, prevCum, nAt) = hist.keys.toSeq.sorted.iterator.map { dd =>
      val p = cum; cum += hist(dd); (dd, p, hist(dd))
    }.find { case (_, p, nb) => p < target && p + nb >= target }.get
    val eff = ((d90 - 1) * 1000000L +
      (target - prevCum) * 1000000L / nAt) / 1e6
    assert(row.getAs[Long]("d90_hop") === d90)
    assert(row.getAs[Long]("n_pairs_total") === nn)
    assert(math.abs(row.getAs[Double]("eff_diameter") - eff) < 1e-5)
  }

  test("graph_betweenness: top-20 matches a scalar truncated Brandes") {
    val got = SparkEntry.queries("q_graph_betweenness")(spark, sf0)
      .collect().map(r => (r.getAs[Long]("v"), r.getAs[Long]("del_sum")))
    val n = Tables.t(spark, sf0, "documents").count()
    val adj = (0L until n).flatMap { src =>
      Seq(src / 2, (src * 31 + 17) % n, (src * src + 1) % n)
        .filter(_ != src).flatMap(dst => Seq(src -> dst, dst -> src))
    }.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val R = 4
    val delSum = scala.collection.mutable.Map[Long, Long]()
    (0L until 8L).foreach { l =>
      val dist = scala.collection.mutable.Map(l -> 0)
      var frontier = Set(l)
      (1 to R).foreach { dd =>
        frontier = frontier.flatMap(v => adj.getOrElse(v, Set.empty))
          .filterNot(dist.contains)
        frontier.foreach(v => dist(v) = dd)
      }
      val sigma = scala.collection.mutable.Map(l -> 1L)
      (1 to R).foreach { dd =>
        dist.filter(_._2 == dd).keys.foreach { v =>
          sigma(v) = adj(v).filter(u => dist.get(u).contains(dd - 1))
            .toSeq.map(sigma).sum
        }
      }
      val del = scala.collection.mutable.Map[Long, Long]()
      dist.filter(_._2 == R).keys.foreach(v => del(v) = 0L)
      (R - 1 to 0 by -1).foreach { dd =>
        dist.filter(_._2 == dd).keys.foreach { v =>
          del(v) = adj(v).filter(w => dist.get(w).contains(dd + 1))
            .toSeq.map(w => sigma(v) * (1000000L + del(w)) / sigma(w))
            .sum
        }
      }
      del.foreach { case (v, dl) =>
        if (v != l) delSum(v) = delSum.getOrElse(v, 0L) + dl
      }
    }
    val want = delSum.toSeq.sortBy { case (v, s) => (-s, v) }.take(20)
    assert(got.toSeq === want)
  }

  test("scan_parquet_meta: footer stats agree with the table read") {
    val row = q("q_scan_parquet_meta").collect().head
    val ev = Tables.t(spark, sf0, "events")
    assert(row.getAs[Long]("n_rows") === ev.count())
    assert(row.getAs[Long]("n_columns") === 6L)
    assert(row.getAs[Long]("n_row_groups") >= 1L)
    assert(row.getAs[Long]("max_group_rows") <= row.getAs[Long]("n_rows"))
  }

  test("sql_recursive: ancestor census matches a scalar chain walk") {
    val got = SparkEntry.queries("q_sql_recursive")(spark, sf0)
      .collect().map(r => (r.getAs[Long]("depth"), r.getAs[Long]("n_chains"),
        r.getAs[Long]("sum_anc_chars")))
    val docs = Tables.t(spark, sf0, "documents")
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val chars = docs.toMap
    val agg = scala.collection.mutable.Map[Long, (Long, Long)]()
    docs.foreach { case (id, _) =>
      var a = id; var depth = 0L
      var go = true
      while (go) {
        chars.get(a).foreach { nc =>
          val (c, sc) = agg.getOrElse(depth, (0L, 0L))
          agg(depth) = (c + 1, sc + nc)
        }
        if (a > 0) { a = a / 2; depth += 1 } else go = false
      }
    }
    val want = agg.toSeq.sortBy(_._1).map { case (d, (c, sc)) => (d, c, sc) }
    assert(got.toSeq === want)
  }

  test("closeness: harmonic sums match a scalar multi-source BFS") {
    val got = q("q_graph_closeness").collect()
      .map(r => r.getAs[Long]("v") ->
        (r.getAs[Long]("n_landmarks"), r.getAs[Long]("harmonic_micro")))
      .toMap
    val n = Tables.t(spark, sf0, "documents").count()
    val adj = (0L until n).flatMap { src =>
      Seq(src / 2, (src * 31 + 17) % n, (src * src + 1) % n)
        .filter(_ != src).flatMap(dst => Seq(src -> dst, dst -> src))
    }.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val want = scala.collection.mutable.Map[Long, (Long, Long)]()
    (0L until 8L).foreach { l =>
      val dist = scala.collection.mutable.Map(l -> 0L)
      var frontier = Set(l)
      (1 to 4).foreach { dd =>
        frontier = frontier.flatMap(v => adj.getOrElse(v, Set.empty))
          .filterNot(dist.contains)
        frontier.foreach(v => dist(v) = dd.toLong)
      }
      dist.foreach { case (v, dd) =>
        if (dd > 0) {
          val (c, h) = want.getOrElse(v, (0L, 0L))
          want(v) = (c + 1, h + 1000000L / dd)
        }
      }
    }
    assert(got === want.toMap)
  }

  test("ts_backtest: error census matches a scalar walk-forward replay") {
    val got = SparkEntry.queries("q_ts_backtest")(spark, sf0).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_eval"), r.getAs[Double]("mae_value"),
          r.getAs[Double]("bias_value"))).toMap
    val ev = Tables.t(spark, sf0, "events")
      .select(col("event_type"),
        expr("unix_micros(CAST(ts AS TIMESTAMP))"), col("event_id"),
        floor(col("value") * 100 + 0.5).cast("long"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(3)))
    val alpha = 0.3
    val ws = (1 to 8).map(k => alpha * math.pow(1 - alpha, k - 1))
    ev.groupBy(_._1).foreach { case (t, rs) =>
      val cs = rs.sortBy(r => (r._2, r._3)).map(_._4)
      var n = 0L; var sAbs = 0L; var sSig = 0L
      cs.indices.foreach { i =>
        if (i >= 8) {
          val hist = (1 to 8).map(k => cs(i - k).toDouble)
          val fc = hist.zip(ws).map { case (c, w) => c * w }.sum / ws.sum
          val e = math.floor((cs(i) - fc) * 1e4 + 0.5).toLong
          n += 1; sAbs += math.abs(e); sSig += e
        }
      }
      val (gn, gm, gb) = got(t)
      assert(gn === n, s"type $t n")
      assert(math.abs(gm - sAbs / 1e4 / n / 100) < 1e-5, s"type $t mae")
      assert(math.abs(gb - sSig / 1e4 / n / 100) < 1e-5, s"type $t bias")
    }
  }

  test("conversion_lag: quartile crossings match a scalar lag census") {
    val got = SparkEntry.queries("q_events_conversion_lag")(spark, sf0)
      .collect()
      .map(r => r.getAs[String]("quantile") -> r.getAs[Long]("lag_h"))
      .toMap
    val ev = Tables.t(spark, sf0, "events")
      .select(col("event_type"), col("user_id"),
        expr("unix_micros(CAST(ts AS TIMESTAMP))"), col("event_id"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    val sevenD = 7L * 86400000000L
    val touches = ev.filter(r => r._1 == "click" || r._1 == "view")
    val lags = ev.filter(_._1 == "purchase").flatMap {
      case (_, u, pts, _) =>
        val cand = touches.filter(t =>
          t._2 == u && t._3 < pts && t._3 >= pts - sevenD)
        if (cand.isEmpty) None
        else Some((pts - cand.map(_._3).max) / 3600000000L)
    }
    val grid = lags.groupBy(identity).view.mapValues(_.length.toLong)
      .toSeq.sortBy(_._1)
    val nn = lags.length.toLong
    Seq(("p25", 1L), ("p50", 2L), ("p75", 3L)).foreach { case (name, k) =>
      val target = (k * nn + 3) / 4
      var cum = 0L
      val cross = grid.find { case (_, n) =>
        val prev = cum; cum += n; prev < target && cum >= target
      }.get._1
      assert(got(name) === cross, s"$name")
    }
    // quartiles are non-decreasing
    assert(got("p25") <= got("p50") && got("p50") <= got("p75"))
  }
  test("did: a planted post-period treated lift is recovered exactly") {
    import spark.implicits._
    def ts(day: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")
    // control (odd users): 10.00 in both periods; treated (even):
    // 10.00 pre, 12.50 post -> DiD = +2.50 exactly
    val ev = Seq(
      (1L, ts(2), 2L, "purchase", 10.0, "{}"),
      (2L, ts(2), 4L, "purchase", 10.0, "{}"),
      (3L, ts(20), 6L, "purchase", 12.5, "{}"),
      (4L, ts(20), 8L, "purchase", 12.5, "{}"),
      (5L, ts(2), 1L, "purchase", 10.0, "{}"),
      (6L, ts(2), 3L, "purchase", 10.0, "{}"),
      (7L, ts(20), 5L, "purchase", 10.0, "{}"),
      (8L, ts(20), 7L, "purchase", 10.0, "{}"),
      // non-purchase noise must be excluded
      (9L, ts(20), 2L, "view", 99.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = fixtureDir("causal_did")("events" -> ev)
    val r = q("q_causal_did", dir).collect().head
    assert(r.getAs[Long]("n_pre_t") === 2L)
    assert(r.getAs[Long]("n_post_t") === 2L)
    assert(r.getAs[Long]("n_pre_c") === 2L)
    assert(r.getAs[Long]("n_post_c") === 2L)
    assert(r.getAs[Double]("mean_post_treated") === 1250.0)
    assert(r.getAs[Double]("mean_pre_treated") === 1000.0)
    assert(r.getAs[Long]("did_micro") === 250L * 1000000L)
  }
}

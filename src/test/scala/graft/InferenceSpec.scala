package graft

import org.apache.spark.sql.functions._

/** Scalar replays + plan shape for the inference tier: every statistic is
  * recomputed here with naive O(n²)-tolerant driver-side code on sf0.001
  * and compared against the distributed result. */
class InferenceSpec extends SparkSuite {

  private def eventVals(): Array[(String, Long)] =
    Tables.t(spark, sf0, "events")
      .select(col("event_type"), floor(col("value") * 100 + 0.5)
        .cast("long").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))

  test("anova: F matches a scalar sufficient-statistics replay") {
    val row = q("q_stats_anova").collect().head
    val vs = eventVals()
    val groups = vs.groupBy(_._1).view.mapValues(_.map(_._2.toDouble))
    val n = vs.length.toDouble
    val k = groups.size
    val grand = vs.map(_._2.toDouble).sum / n
    val ssb = groups.values.map(g =>
      g.length * math.pow(g.sum / g.length - grand, 2)).sum
    val ssw = groups.values.map(g => {
      val m = g.sum / g.length; g.map(v => (v - m) * (v - m)).sum
    }).sum
    val f = (ssb / (k - 1)) / (ssw / (n - k))
    assert(row.getAs[Long]("k") === k.toLong)
    assert(row.getAs[Long]("n") === vs.length.toLong)
    assert(math.abs(row.getAs[Double]("f") - f) < 1e-3,
      s"got ${row.getAs[Double]("f")} want $f")
  }

  test("kruskal: H matches a scalar midrank replay") {
    val row = q("q_stats_kruskal").collect().head
    val vs = eventVals()
    val n = vs.length
    // midranks over the full sample
    val byVal = vs.map(_._2).sorted
    val rankOf = byVal.zipWithIndex.groupBy(_._1).view
      .mapValues(ps => ps.map(_._2 + 1.0).sum / ps.length).toMap
    val groups = vs.groupBy(_._1)
    val srj = groups.values.map { g =>
      val rj = g.map(v => rankOf(v._2)).sum
      rj * rj / g.length
    }.sum
    val tieCnt = vs.groupBy(_._2).values
      .map(t => math.pow(t.length, 3) - t.length).sum
    val h0 = 12.0 * srj / (n.toDouble * (n + 1)) - 3.0 * (n + 1)
    val h = h0 / (1.0 - tieCnt / (math.pow(n, 3) - n))
    assert(row.getAs[Long]("n") === n.toLong)
    assert(math.abs(row.getAs[Double]("h") - h) < 1e-3,
      s"got ${row.getAs[Double]("h")} want $h")
  }

  test("kendall: tau-b matches a scalar all-pairs replay") {
    val row = q("q_stats_kendall").collect().head
    val xs = Tables.t(spark, sf0, "lineitem")
      .select(col("l_quantity").cast("long"),
        round(col("l_discount") * 100).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    var conc = 0L; var disc = 0L; var tx = 0L; var ty = 0L
    var i = 0
    while (i < xs.length) {
      var j = i + 1
      while (j < xs.length) {
        val s = java.lang.Long.signum(xs(i)._1 - xs(j)._1) *
          java.lang.Long.signum(xs(i)._2 - xs(j)._2)
        if (s > 0) conc += 1
        else if (s < 0) disc += 1
        else {
          if (xs(i)._1 == xs(j)._1) tx += 1
          if (xs(i)._2 == xs(j)._2) ty += 1
        }
        j += 1
      }
      i += 1
    }
    // the query counts within-cell pairs in BOTH tx and ty (they tie on
    // x and y); the replay above puts an x&y tie in both too — aligned.
    val n0 = xs.length.toDouble * (xs.length - 1) / 2
    // replay tx/ty exclude pairs tied on both axes only when counted
    // once; recompute inclusively to mirror the query's tie masses
    var txAll = 0L; var tyAll = 0L
    i = 0
    while (i < xs.length) {
      var j = i + 1
      while (j < xs.length) {
        if (xs(i)._1 == xs(j)._1) txAll += 1
        if (xs(i)._2 == xs(j)._2) tyAll += 1
        j += 1
      }
      i += 1
    }
    val tau = (conc - disc) / math.sqrt((n0 - txAll) * (n0 - tyAll))
    assert(row.getAs[Double]("concordant") === conc.toDouble)
    assert(row.getAs[Double]("discordant") === disc.toDouble)
    assert(math.abs(row.getAs[Double]("tau_b") - tau) < 1e-4,
      s"got ${row.getAs[Double]("tau_b")} want $tau")
  }

  test("auc: rank formulation equals the brute-force pair count") {
    val row = q("q_ml_auc").collect().head
    val ds = Tables.t(spark, sf0, "documents")
      .select(col("n_chars"), (col("lang") === "en").as("p"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    val pos = ds.filter(_._2).map(_._1)
    val neg = ds.filterNot(_._2).map(_._1)
    var mass = 0.0
    pos.foreach(p => neg.foreach { q2 =>
      if (p > q2) mass += 1.0 else if (p == q2) mass += 0.5
    })
    val auc = mass / (pos.length.toDouble * neg.length)
    assert(row.getAs[Long]("n1") === pos.length.toLong)
    assert(row.getAs[Long]("n0") === neg.length.toLong)
    assert(math.abs(row.getAs[Double]("auc") - auc) < 1e-6,
      s"got ${row.getAs[Double]("auc")} want $auc")
  }

  test("winsorized mean: fences clamp, never drop") {
    val rows = q("q_agg_winsorized").collect()
    assert(rows.nonEmpty)
    val plain = Tables.t(spark, sf0, "events")
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      // winsorization keeps every row (clamp semantics)
      assert(r.getAs[Long]("n") === plain(r.getAs[String]("event_type")))
      assert(r.getAs[Double]("lo") <= r.getAs[Double]("hi"))
      val m = r.getAs[Double]("mean_w")
      assert(m >= r.getAs[Double]("lo") - 1e-9 &&
        m <= r.getAs[Double]("hi") + 1e-9,
        "winsorized mean must lie inside the fences")
    }
  }

  test("cramer: V in [0,1] and chi2 consistent with margins replay") {
    val row = q("q_stats_cramer").collect().head
    val v = row.getAs[Double]("cramer_v")
    assert(v >= 0.0 && v <= 1.0)
    val cells = Tables.t(spark, sf0, "orders")
      .groupBy(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).cast("double").as("o"))
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getDouble(2)))
    val n = cells.map(_._2).sum
    val rm = cells.groupBy(_._1._1).view.mapValues(_.map(_._2).sum)
    val cm = cells.groupBy(_._1._2).view.mapValues(_.map(_._2).sum)
    val chi = (for { (rk, rv) <- rm; (ck, cv) <- cm } yield {
      val obs = cells.find(c => c._1 == ((rk, ck))).map(_._2).getOrElse(0.0)
      val e = rv * cv / n
      (obs - e) * (obs - e) / e
    }).sum
    assert(math.abs(row.getAs[Double]("chi2") - chi) < 1e-3)
    assert(row.getAs[Long]("n") === n.toLong)
  }

  test("readability: per-source counts match a scalar regex replay") {
    val rows = q("q_text_readability").collect()
    assert(rows.nonEmpty)
    val docs = Tables.t(spark, sf0, "documents")
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val bySrc = docs.groupBy(_._1)
    rows.foreach { r =>
      val ds = bySrc(r.getAs[String]("source"))
      val words = ds.map(_._2.split(" ", -1).length.toLong).sum
      val syl = ds.map(d =>
        "[aeiouy]+".r.findAllIn(d._2.toLowerCase).length.toLong).sum
      val sen = ds.map(d =>
        math.max("[.!?]+".r.findAllIn(d._2).length.toLong, 1L)).sum
      assert(r.getAs[Long]("n_docs") === ds.length.toLong)
      assert(r.getAs[Long]("words") === words)
      assert(r.getAs[Long]("syllables") === syl)
      assert(r.getAs[Long]("sentences") === sen)
      val flesch = 206.835 - 1.015 * words.toDouble / sen -
        84.6 * syl.toDouble / words
      assert(math.abs(r.getAs[Double]("flesch") - flesch) < 1e-4)
    }
  }

  test("hits: authority concentrates on the contraction target ids") {
    val rows = q("q_graph_hits").collect()
    val n = rows.length
    assert(n > 0)
    // L1 normalization: scores sum to ~1 on each axis
    assert(math.abs(rows.map(_.getAs[Double]("hub")).sum - 1.0) < 1e-4)
    assert(math.abs(rows.map(_.getAs[Double]("auth")).sum - 1.0) < 1e-4)
    // node i links to i/2: low ids accumulate in-links → top authority
    // mass must sit in the low-id half
    val sorted = rows.sortBy(-_.getAs[Double]("auth")).take(10)
    assert(sorted.count(_.getAs[Long]("doc_id") < n / 2) >= 8,
      "authority should concentrate on contraction targets (low ids)")
  }

  test("kendall plan: raw table collapses to the cell grid before the self-join") {
    // the self-join must consume the ≤550-cell aggregate, not raw rows:
    // the NLJ's broadcast input is the keyed (x, y) count table
    val p = q("q_stats_kendall").queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"cell-pair join is a theta join (expected NLJ):\n${p.take(800)}")
    assert(!p.contains("CartesianProductExec"),
      "cell-pair join must not be a partitioned cartesian")
    assert(p.contains("HashAggregate(keys=[x"),
      "self-join inputs must be the aggregated cell table")
  }

  test("fdr: z, p, and BH decisions match a scalar replay") {
    val rows = q("q_stats_fdr").collect()
    // scalar replay from the raw events, same formula order
    val cents = Tables.t(spark, sf0, "events")
      .select(col("event_type"),
        floor(col("value") * 100 + 0.5).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val byT = cents.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val nn = cents.length.toDouble
    val tsc = BigInt(cents.map(c => BigInt(c._2)).sum.toString)
    val tsc2 = cents.map(c => BigInt(c._2) * BigInt(c._2)).sum
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val scalar = byT.map { case (t, cs) =>
      val n = cs.length.toDouble
      val sc = cs.map(BigInt(_)).sum
      val sc2 = cs.map(c => BigInt(c) * BigInt(c)).sum
      val z = (sc.toDouble / n - (tsc - sc).toDouble / (nn - n)) /
        math.sqrt(
          (sc2.toDouble / n - (sc.toDouble / n) * (sc.toDouble / n)) / n +
            ((tsc2 - sc2).toDouble / (nn - n) -
              ((tsc - sc).toDouble / (nn - n)) *
                ((tsc - sc).toDouble / (nn - n))) / (nn - n))
      val zr = r6(z)
      val az = math.abs(zr)
      val tt = 1.0 / (1.0 + 0.2316419 * az)
      val p = 2.0 * 0.3989422804014327 * math.exp(-(az * az) / 2.0) *
        (((((1.330274429 * tt - 1.821255978) * tt + 1.781477937) * tt -
          0.356563782) * tt + 0.319381530) * tt)
      t -> (cs.length.toLong, zr, math.floor(p * 1e6 + 0.5).toLong)
    }
    val m = scalar.size
    val sortedP = scalar.toSeq.sortBy { case (t, (_, _, pm)) => (pm, t) }
    val imax = sortedP.zipWithIndex
      .filter { case ((_, (_, _, pm)), i) => pm * m <= (i + 1) * 50000L }
      .map(_._2 + 1).lastOption.getOrElse(0)
    assert(rows.length === m)
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      val (n, zr, pm) = scalar(t)
      assert(r.getAs[Long]("n") === n, s"$t n")
      assert(r.getAs[Double]("zr") === zr, s"$t z")
      assert(r.getAs[Long]("p_micro") === pm, s"$t p")
      assert(r.getAs[Boolean]("rejected") ===
        (r.getAs[Long]("rnk") <= imax), s"$t BH decision")
    }
    // rejections form a rank prefix (step-up property)
    val rej = rows.sortBy(_.getAs[Long]("rnk"))
      .map(_.getAs[Boolean]("rejected"))
    assert(rej.sliding(2).forall(w => w.length < 2 || w(0) || !w(1)),
      "rejected set must be a prefix of the p-ranked list")
  }
  test("cmh: stratified chi2 matches a scalar replay") {
    val row = q("q_stats_cmh").collect().head
    val rows = Tables.t(spark, sf0, "events")
      .select(weekofyear(col("ts")).cast("long"),
        (hour(col("ts")) < 12).cast("long"),
        (col("event_type") === "purchase").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    var sumA = 0L; var sumE = 0L; var sumV = 0L; var k = 0L
    rows.groupBy(_._1).foreach { case (_, g) =>
      val a = g.count(x => x._2 == 1 && x._3 == 1).toLong
      val b = g.count(x => x._2 == 1 && x._3 == 0).toLong
      val c = g.count(x => x._2 == 0 && x._3 == 1).toLong
      val dd = g.count(x => x._2 == 0 && x._3 == 0).toLong
      val n = a + b + c + dd
      if (n > 1) {
        k += 1; sumA += a
        sumE += math.floor(
          ((a + b).toDouble * (a + c)) / n * 1e6 + 0.5).toLong
        sumV += math.floor(
          (BigInt(a + b) * BigInt(c + dd) * BigInt(a + c) *
            BigInt(b + dd)).toDouble /
            (n.toDouble * n * (n - 1)) * 1e6 + 0.5).toLong
      }
    }
    val dAbs = math.abs(1000000L * sumA - sumE) / 1e6 - 0.5
    val chi2 = dAbs * dAbs / (sumV / 1e6)
    assert(row.getAs[Long]("k_strata") === k)
    assert(row.getAs[Long]("sum_a") === sumA)
    assert(math.abs(row.getAs[Double]("chi2") - chi2) < 1e-5,
      s"got ${row.getAs[Double]("chi2")} want $chi2")
  }

  test("runs: streaky and alternating fixtures hit the exact counts") {
    import spark.implicits._
    def ts(day: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")
    // 4 low days then 4 high days: 2 runs, n1 = n2 = 4
    val ev = (1 to 8).map { i =>
      (i.toLong, ts(i), i.toLong, "purchase",
        if (i <= 4) 10.0 else 90.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = fixtureDir("inf_runs")("events" -> ev)
    val r = q("q_stats_runs", dir).collect().head
    assert(r.getAs[Long]("n1") === 4L)
    assert(r.getAs[Long]("n2") === 4L)
    assert(r.getAs[Long]("runs") === 2L)
    // z for R=2, n1=n2=4: mu = 5, var = 16*8/(64*7) wait — use formula
    val mu = 2.0 * 4 * 4 / 8 + 1
    val v = 2.0 * 4 * 4 * (2.0 * 4 * 4 - 8) / (8.0 * 8 * 7)
    assert(math.abs(r.getAs[Double]("z") - (2 - mu) / math.sqrt(v))
      < 1e-6)
  }
  test("levene: W matches a scalar Brown-Forsythe replay") {
    val row = q("q_stats_levene").collect().head
    val vs = eventVals()
    val groups = vs.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    def median(xs: Seq[Long]): Double = {
      val s = xs.sorted
      val r = (s.length - 1) * 0.5
      val lo = r.toInt
      if (lo + 1 < s.length) s(lo) + (r - lo) * (s(lo + 1) - s(lo))
      else s(lo).toDouble
    }
    // doubled half-cent deviations, exactly as the query quantizes
    val zByG = groups.map { case (g, xs) =>
      val m = median(xs)
      g -> xs.map(x => math.floor(math.abs(x - m) * 2 + 0.5).toLong)
    }
    val k = zByG.size
    val nn = vs.length.toDouble
    val tsz = zByG.values.flatten.map(BigInt(_)).sum
    val tsz2 = zByG.values.flatten.map(z => BigInt(z) * BigInt(z)).sum
    val sgr = zByG.values.map { zs =>
      val sz = zs.map(BigInt(_)).sum
      (sz * sz) / zs.length   // integer division, like the query
    }.sum
    val w = ((sgr.toDouble - tsz.toDouble * tsz.toDouble / nn) /
      (k - 1)) / ((tsz2.toDouble - sgr.toDouble) / (nn - k))
    assert(row.getAs[Long]("k") === k.toLong)
    assert(row.getAs[Long]("n") === vs.length.toLong)
    assert(math.abs(row.getAs[Double]("w_stat") - w) < 1e-4,
      s"got ${row.getAs[Double]("w_stat")} want $w")
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("jarque-bera: moment statistic replays from exact power sums") {
    val byType = Tables.t(spark, sf0, "events")
      .select(col("event_type"),
        floor(col("value") * 100 + 0.5).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1)
    val got = q("q_stats_jarque_bera").collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n"), r.getAs[Double]("jb_stat"),
          r.getAs[Double]("p_value"))).toMap
    byType.foreach { case (et, rows) =>
      val cs = rows.map(_._2)
      val n = cs.length
      val Seq(s1, s2, s3, s4) = (1 to 4).map(p =>
        cs.map(c => Seq.fill(p)(BigInt(c)).product).sum).toSeq
      val nd = n.toDouble
      val mean = s1.toDouble / nd
      val e2 = s2.toDouble / nd
      val e3 = s3.toDouble / nd
      val e4 = s4.toDouble / nd
      val m2 = e2 - mean * mean
      val sk = (e3 - 3.0 * mean * e2 + 2.0 * mean * mean * mean) /
        math.pow(m2, 1.5)
      val ku = (e4 - 4.0 * mean * e3 + 6.0 * mean * mean * e2 -
        3.0 * mean * mean * mean * mean) / (m2 * m2) - 3.0
      val jb = nd / 6.0 * (sk * sk + ku * ku / 4.0)
      assert(got(et)._1 === n.toLong)
      assert(math.abs(got(et)._2 - jb) < 1e-4, s"jb for $et")
      assert(math.abs(got(et)._3 - math.exp(-jb / 2.0)) < 1e-6)
    }
  }

  test("pr curve: fence counts replay and recall matches gains capture") {
    val rows = scoreRows()
    val sorted = rows.map(_._1.toDouble).sorted
    def pct(p: Double): Double = {
      val idx = (sorted.length - 1) * p
      val lo = math.floor(idx).toInt
      val hi = math.ceil(idx).toInt
      sorted(lo) + (idx - lo) * (sorted(hi) - sorted(lo))
    }
    val got = q("q_ml_pr_curve").collect()
    assert(got.length === 9)
    got.foreach { r =>
      val t = pct(r.getAs[Long]("fence") / 10.0)
      val tp = rows.count { case (c, p) => c > t && p }
      val fp = rows.count { case (c, p) => c > t && !p }
      val fn = rows.count { case (c, p) => c <= t && p }
      assert(r.getAs[Long]("tp") === tp.toLong)
      assert(r.getAs[Long]("fp") === fp.toLong)
      assert(r.getAs[Long]("fn") === fn.toLong)
      assert(r.getAs[Double]("precision") ===
        round6(tp.toDouble / (tp + fp)))
      assert(r.getAs[Double]("recall") ===
        round6(tp.toDouble / (tp + fn)))
      assert(r.getAs[Double]("f1") ===
        round6(2.0 * tp / (2.0 * tp + fp + fn)))
    }
    // walking the fences from strict to lax only gains recall
    val recalls = got.sortBy(_.getAs[Long]("fence")).reverse
      .map(_.getAs[Double]("recall")).toSeq
    assert(recalls === recalls.sorted)
  }

  test("welch: heteroscedastic F replays from quantized group stats") {
    val byType = Tables.t(spark, sf0, "events")
      .select(col("event_type"),
        floor(col("value") * 100 + 0.5).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).values.toSeq
    def q(x: Double, s: Double) = math.floor(x * s + 0.5).toLong
    val g = byType.map { rows =>
      val cs = rows.map(_._2)
      val n = cs.length
      val s1 = cs.map(BigInt(_)).sum
      val s2 = cs.map(c => BigInt(c) * c).sum
      val m = s1.toDouble / n
      val v = (s2.toDouble - s1.toDouble * s1.toDouble / n) / (n - 1)
      val w = n / v
      (n, q(w, 1e9), q(w * m, 1e9), q(w * m * m, 1e6))
    }
    val k = g.length
    val ww = g.map(_._2).sum
    val sm = g.map(_._3).sum
    val sm2 = g.map(_._4).sum
    val sl = g.map { case (n, wq, _, _) =>
      q((1.0 - wq.toDouble / ww) * (1.0 - wq.toDouble / ww) / (n - 1),
        1e12) }.sum
    val a = (sm2.toDouble / 1e6 - sm.toDouble * sm / 1e9 / ww) / (k - 1)
    val b = 1.0 + 2.0 * (k - 2) / (k.toDouble * k - 1) * (sl / 1e12)
    val row = SparkEntry.queries("q_stats_welch")(spark, sf0)
      .collect().head
    assert(row.getAs[Long]("k") === k.toLong)
    assert(row.getAs[Double]("f_welch") === round6(a / b))
    assert(row.getAs[Double]("df2") ===
      round6((k.toDouble * k - 1) / (3.0 * sl / 1e12)))
  }

  test("cochran-armitage: the daily trend statistic replays exactly") {
    val days = Tables.t(spark, sf0, "events")
      .select(to_date(col("ts")),
        when(col("value") > 90.0, 1L).otherwise(0L))
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
      .groupBy(_._1).toSeq.sortBy(_._1.toEpochDay)
      .zipWithIndex.map { case ((_, rs), i) =>
        (i + 1L, rs.length.toLong, rs.map(_._2).sum) }
    val nn = days.map(_._2).sum
    val rr = days.map(_._3).sum
    val sn = days.map { case (s, n, _) => BigInt(s) * n }.sum
    val sr = days.map { case (s, _, r) => BigInt(s) * r }.sum
    val sn2 = days.map { case (s, n, _) => BigInt(s) * s * n }.sum
    val t = (BigInt(nn) * sr - BigInt(rr) * sn).toDouble
    val varT = rr.toDouble * (nn - rr) *
      (BigInt(nn) * sn2 - sn * sn).toDouble / nn
    val row = SparkEntry.queries("q_stats_trend_ca")(spark, sf0)
      .collect().head
    assert(row.getAs[Long]("n_days") === days.length.toLong)
    assert(row.getAs[Long]("n_total") === nn)
    assert(row.getAs[Long]("n_pos") === rr)
    assert(row.getAs[Double]("chi2_trend") === round6(t * t / varT))
    assert(row.getAs[Double]("z_trend") ===
      round6(t / math.sqrt(varT)))
    // consistency: z^2 tracks chi2
    assert(math.abs(math.pow(row.getAs[Double]("z_trend"), 2) -
      row.getAs[Double]("chi2_trend")) < 1e-4)
  }

  test("friedman: doubled-midrank statistic replays exactly") {
    val cells = Tables.t(spark, sf0, "events")
      .select(expr("dayofweek(CAST(ts AS DATE))").as("blk"),
        col("event_type"),
        floor(col("value") * 100 + 0.5).cast("long").as("c"))
      .groupBy(col("blk"), col("event_type"))
      .agg(sum(col("c")).as("v")).collect()
      .map(r => (r.getAs[Int]("blk"), r.getAs[String]("event_type"),
        r.getAs[Long]("v")))
    val k = cells.map(_._2).distinct.length
    val complete = cells.groupBy(_._1).filter(_._2.length == k)
    val n = complete.size
    val r2 = scala.collection.mutable.Map[String, Long]()
      .withDefaultValue(0L)
    complete.values.foreach { rows =>
      rows.foreach { case (_, et, v) =>
        val lt = rows.count(_._3 < v)
        val eq = rows.count(_._3 == v)
        r2(et) += 2L * (lt + 1) + eq - 1
      }
    }
    val ssq = r2.values.map(x =>
      BigInt(x - n.toLong * (k + 1)) * (x - n.toLong * (k + 1))).sum
    val want = round6(3.0 * ssq.toDouble / (n.toLong * k * (k + 1)))
    val row = q("q_stats_friedman").collect().head
    assert(row.getAs[Long]("n_blocks") === n.toLong)
    assert(row.getAs[Long]("k") === k.toLong)
    assert(row.getAs[Long]("df") === (k - 1).toLong)
    assert(row.getAs[Double]("fr_stat") === want)
  }

  test("cochran q: incidence-matrix statistic replays exactly") {
    val ut = Tables.t(spark, sf0, "events")
      .filter(col("value") > 90.0)
      .select(col("user_id"), col("event_type")).distinct()
      .collect().map(r => (r.getAs[Long]("user_id"), r.getString(1)))
    val k = Tables.t(spark, sf0, "events")
      .filter(col("value") > 90.0)
      .select(col("event_type")).distinct().count()
    val cj = ut.groupBy(_._2).view.mapValues(_.length.toLong).values
    val ri = ut.groupBy(_._1).view.mapValues(_.length.toLong).values
    val nn = ut.length.toLong
    val nums = cj.map(c => BigInt(k * c - nn) * (k * c - nn)).sum
    val dens = ri.map(r => k * r - r * r).sum
    val row = q("q_stats_cochran_q").collect().head
    assert(row.getAs[Long]("n_users") === ri.size.toLong)
    assert(row.getAs[Long]("k") === k)
    assert(row.getAs[Double]("q_stat") ===
      round6((k - 1).toDouble * nums.toDouble / (k * dens.toDouble)))
    // thresholded incidence must actually vary, or Q is degenerate
    assert(dens > 0L)
  }

  /** (score, positive) pairs for the n_chars → lang='en' rank model. */
  private def scoreRows(): Array[(Long, Boolean)] =
    Tables.t(spark, sf0, "documents")
      .select(col("n_chars").cast("long"), col("lang") === "en")
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))

  test("gains: bucketing and lift replay against a scalar recompute") {
    val rows = scoreRows()
    val sorted = rows.map(_._1.toDouble).sorted
    def pct(p: Double): Double = {
      val idx = (sorted.length - 1) * p
      val lo = math.floor(idx).toInt
      val hi = math.ceil(idx).toInt
      sorted(lo) + (idx - lo) * (sorted(hi) - sorted(lo))
    }
    val thr = (1 to 9).map(i => pct(i / 10.0))
    val byBucket = rows.groupBy { case (c, _) =>
      9L - thr.count(t => c > t) }
    val nn = rows.length.toLong
    val pp = rows.count(_._2).toLong
    var (cumN, cumP) = (0L, 0L)
    val got = q("q_ml_gains").collect()
    assert(got.map(_.getAs[Long]("decile")).toSeq ===
      byBucket.keys.toSeq.sorted)
    got.foreach { r =>
      val b = byBucket(r.getAs[Long]("decile"))
      assert(r.getAs[Long]("n") === b.length.toLong)
      assert(r.getAs[Long]("n_pos") === b.count(_._2).toLong)
      cumN += b.length; cumP += b.count(_._2)
      assert(r.getAs[Long]("cum_n") === cumN)
      assert(r.getAs[Long]("cum_pos") === cumP)
      assert(r.getAs[Double]("lift") ===
        round6(cumP.toDouble * nn / (cumN.toDouble * pp)))
      assert(r.getAs[Double]("capture") === round6(cumP.toDouble / pp))
    }
    // the walk ends at full capture, lift settles to 1
    assert(got.last.getAs[Double]("capture") === 1.0)
    assert(got.last.getAs[Double]("lift") === 1.0)
  }

  test("brier: reliability bins replay against a scalar recompute") {
    val rows = scoreRows()
    val nn = rows.length.toLong
    val vc = rows.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (c, rs) =>
        (c, rs.length.toLong, rs.count(_._2).toLong) }
    var cum = 0L
    val binned = vc.map { case (_, na, n1c) =>
      cum += na
      val p = 1000000L * cum / nn
      (math.min(9L, p / 100000L), na, n1c, p)
    }
    val got = q("q_ml_brier").collect()
    assert(got.map(_.getAs[Long]("bin")).toSeq ===
      binned.map(_._1).distinct.sorted)
    got.foreach { r =>
      val b = binned.filter(_._1 == r.getAs[Long]("bin"))
      val n = b.map(_._2).sum
      val n1 = b.map(_._3).sum
      assert(r.getAs[Long]("n") === n)
      assert(r.getAs[Long]("n_pos") === n1)
      assert(r.getAs[Double]("mean_p") === round6(
        b.map(x => BigInt(x._2) * x._4).sum.toDouble / n / 1e6))
      assert(r.getAs[Double]("frac_pos") === round6(n1.toDouble / n))
      val sq = b.map(x => BigInt(x._3) * (1000000 - x._4) *
        (1000000 - x._4) + BigInt(x._2 - x._3) * x._4 * x._4).sum
      assert(r.getAs[Double]("brier") ===
        round6(sq.toDouble / n / 1e12))
    }
  }
}

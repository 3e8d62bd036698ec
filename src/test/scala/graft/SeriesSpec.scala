package graft

import org.apache.spark.sql.functions._

/** Series tier — statistical identities and independent re-computations
  * over the events table at sf0.001. */
class SeriesSpec extends SparkSuite {

  test("ACF values are correlations in [-1, 1] for every series") {
    val rows = q("q_ts_acf").collect()
    assert(rows.length === 5)
    rows.foreach { r =>
      Seq("acf1", "acf2", "acf3").foreach { c =>
        val v = r.getAs[Double](c)
        assert(v >= -1.0 && v <= 1.0, s"$c = $v")
      }
    }
  }

  test("MAD outlier count matches a driver-side recomputation") {
    val got = q("q_ts_mad").collect()
      .map(r => r.getAs[String]("event_type") ->
        r.getAs[Long]("n_outliers")).toMap
    val byType = Tables.t(spark, sf0, "events")
      .select(col("event_type"), col("value")).collect()
      .groupBy(_.getString(0))
    def median(xs: Array[Double]): Double = {
      val s = xs.sorted
      val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    byType.foreach { case (et, rs) =>
      val vals = rs.map(_.getDouble(1))
      val med = median(vals)
      val mad = median(vals.map(v => math.abs(v - med)))
      val want = vals.count(v => math.abs(v - med) > mad * 3 * 1.4826)
      assert(got(et) === want.toLong, s"outliers for $et")
    }
  }

  test("seasonality strength is a fraction and peak hour is an hour") {
    val rows = q("q_ts_seasonal").collect()
    assert(rows.length === 5)
    rows.foreach { r =>
      val s = r.getAs[Double]("strength")
      assert(s >= 0.0 && s <= 1.0)
      val h = r.getAs[Long]("peak_hour")
      assert(h >= 0L && h <= 23L)
    }
  }

  test("CUSUM peak matches an exact driver-side replay for one series") {
    val got = q("q_ts_cusum").collect()
      .map(r => r.getAs[String]("event_type") ->
        r.getAs[Double]("peak_cusum")).toMap
    val rows = Tables.t(spark, sf0, "events")
      .filter(col("event_type") === "click")
      .select(unix_micros(col("ts").cast("timestamp")), col("event_id"),
        col("value")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(t => (t._1, t._2))
    val cents = rows.map(t => math.floor(t._3 * 100 + 0.5).toLong)
    val n = cents.length
    val mu = cents.sum.toDouble / n
    val sd = math.sqrt((cents.map(c => c.toDouble * c).sum -
      cents.sum.toDouble * cents.sum / n) / (n - 1))
    var acc = 0L
    var peak = 0L
    cents.foreach { c =>
      acc += math.floor((c - mu) / sd * 1000000 + 0.5).toLong
      if (math.abs(acc) > math.abs(peak)) peak = acc
    }
    assert(got("click") ===
      BigDecimal(peak / 1000000.0).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("Markov transition probabilities sum to 1 per source state") {
    val rows = q("q_events_markov").collect()
    val byPrev = rows.groupBy(_.getAs[String]("prev_type"))
    assert(byPrev.nonEmpty)
    byPrev.foreach { case (_, rs) =>
      val total = rs.map(_.getAs[Double]("p")).sum
      assert(math.abs(total - 1.0) < 1e-4)
    }
    // transition count conservation: sum n = rows - first-event-per-user
    val nTrans = rows.map(_.getAs[Long]("n")).sum
    val ev = Tables.t(spark, sf0, "events")
    val want = ev.count() - ev.select(col("user_id")).distinct().count()
    assert(nTrans === want)
  }

  test("OHLC bars: open/close match the day's boundary rows") {
    val bars = q("q_ts_ohlc").collect()
    assert(bars.nonEmpty)
    bars.foreach { b =>
      val hi = b.getAs[Double]("high")
      val lo = b.getAs[Double]("low")
      assert(hi >= lo)
      assert(b.getAs[Double]("open") >= lo && b.getAs[Double]("open") <= hi)
      assert(b.getAs[Double]("close") >= lo &&
        b.getAs[Double]("close") <= hi)
    }
    // spot-check one bar end-to-end
    val one = bars.head
    val rows = Tables.t(spark, sf0, "events")
      .filter(col("event_type") === one.getAs[String]("event_type") &&
        to_date(col("ts")) === lit(one.getAs[Any]("day").toString)
          .cast("date"))
      .select(unix_micros(col("ts").cast("timestamp")), col("event_id"),
        col("value")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(t => (t._1, t._2))
    assert(one.getAs[Double]("open") === rows.head._3)
    assert(one.getAs[Double]("close") === rows.last._3)
    assert(one.getAs[Long]("n") === rows.length.toLong)
  }

  test("EWMA head equals the raw value and stays inside the tap range") {
    val ew = q("q_ts_ewma").collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Double]("ewma")).toMap
    val clicks = Tables.t(spark, sf0, "events")
      .filter(col("event_type") === "click")
      .select(unix_micros(col("ts").cast("timestamp")), col("event_id"),
        col("value")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(t => (t._1, t._2))
    // first observation has only the k=0 tap: ewma == value
    val head = clicks.head
    assert(math.abs(ew(head._2) - head._3) < 1e-6)
    // every smoothed point lies within the min/max of its 8-tap window
    clicks.indices.foreach { i =>
      val win = clicks.slice(math.max(0, i - 7), i + 1).map(_._3)
      val v = ew(clicks(i)._2)
      assert(v >= win.min - 1e-6 && v <= win.max + 1e-6)
    }
  }

  test("V-shape count matches a driver-side replay for one series") {
    val got = q("q_ts_vshape").collect()
      .map(r => r.getAs[String]("event_type") ->
        r.getAs[Long]("n_vshapes")).toMap
    val rows = Tables.t(spark, sf0, "events")
      .filter(col("event_type") === "view")
      .select(unix_micros(col("ts").cast("timestamp")), col("event_id"),
        col("value")).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        math.floor(r.getDouble(2) * 100 + 0.5).toLong))
      .sortBy(t => (t._1, t._2)).map(_._3)
    val want = rows.sliding(3).count { w =>
      val (c1, c2, c3) = (w(0), w(1), w(2))
      (c1 - c2) * 5 >= c1 && (c3 - c2) * 5 >= c3 }
    assert(got("view") === want.toLong)
  }
  test("markov pi: settled vector matches an 8-step scalar replay") {
    val got = q("q_events_markov_pi").collect()
      .map(r => r.getAs[String]("event_type") ->
        r.getAs[Double]("pi")).toMap
    // scalar transition matrix from the same (user, ts, id) ordering
    val rows = Tables.t(spark, sf0, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"))
      .collect()
      .map(r => (r.getLong(0),
        r.getAs[java.time.LocalDateTime](1), r.getLong(2),
        r.getString(3)))
    val trans = rows.groupBy(_._1).values.flatMap { g =>
      val s = g.sortBy(x =>
        (x._2.toEpochSecond(java.time.ZoneOffset.UTC),
          x._2.getNano, x._3)).map(_._4)
      s.sliding(2).collect { case Array(a, b) => (a, b) }
    }.toSeq.groupBy(x => x).view.mapValues(_.size.toLong).toMap
    val tot = trans.groupBy(_._1._1).view
      .mapValues(_.values.sum).toMap
    val p = trans.map { case ((a, b), n) =>
      (a, b) -> n.toDouble / tot(a)
    }
    val states = trans.keys.map(_._1).toSeq.distinct.sorted
    def r10(x: Double): Double =
      BigDecimal(x).setScale(10, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    var pi = states.map(_ -> 1.0 / states.size).toMap
    (1 to 8).foreach { _ =>
      pi = states.map { s2 =>
        s2 -> r10(states.map(s1 =>
          pi.getOrElse(s1, 0.0) * p.getOrElse((s1, s2), 0.0)).sum)
      }.toMap
    }
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    assert(got.keySet === pi.keySet)
    pi.foreach { case (s2, v) =>
      assert(math.abs(got(s2) - r6(v)) < 2e-6, s"$s2: ${got(s2)} vs $v")
    }
    // a proper distribution (mass within rounding of 1)
    assert(math.abs(got.values.sum - 1.0) < 1e-4)
  }
  test("markov pi: a state fed only by source-only types is dropped") {
    // The oracle's iterated join DROPS a state whose inbound key chain
    // dies: B is fed ONLY by A, and A never appears as a next_type, so
    // B exists in r1 but not r2..r8. The dense array-algebra form must
    // propagate the live key set and emit only keys_8 — a naive
    // "emit every receiver" form returns B with pi = 0.0 here.
    import spark.implicits._
    val ev = Seq(
      (1L, "2024-01-01 00:00:00", 1L, "A"),
      (1L, "2024-01-01 00:00:01", 2L, "B"),
      (1L, "2024-01-01 00:00:02", 3L, "C"),
      (1L, "2024-01-01 00:00:03", 4L, "D"),
      (1L, "2024-01-01 00:00:04", 5L, "C"),
      (1L, "2024-01-01 00:00:05", 6L, "D"))
      .toDF("user_id", "ts", "event_id", "event_type")
      .withColumn("ts", to_timestamp(col("ts")))
    val dir = fixtureDir("markov_sourceonly")("events" -> ev)
    val got = q("q_events_markov_pi", dir).collect()
      .map(r => r.getAs[String]("event_type") ->
        r.getAs[Double]("pi")).toMap
    // chain: keys_0={A,B,C,D}, keys_1={B,C,D}, keys_2..8={C,D};
    // settled mass alternates into the C<->D cycle at 0.5 each
    assert(got.keySet === Set("C", "D"), s"emitted ${got.keySet}")
    assert(math.abs(got("C") - 0.5) < 1e-9)
    assert(math.abs(got("D") - 0.5) < 1e-9)
  }

  test("hurst: R/S profile and slope match a scalar replay") {
    val got = q("q_ts_hurst").collect()
    val days = Tables.t(spark, sf0, "events")
      .select(to_date(col("ts")),
        floor(col("value") * 100 + 0.5).cast("long"))
      .collect()
      .groupBy(_.getDate(0).toLocalDate)
      .view.mapValues(_.map(_.getLong(1)).sum).toSeq
      .sortBy(_._1.toEpochDay).map(_._2)
    def rsFor(w: Int): (Long, Double) = {
      val nb = days.length / w
      val rs = (0 until nb).map { b =>
        val blk = days.slice(b * w, (b + 1) * w).map(BigInt(_))
        val bs = blk.sum
        val sv2 = blk.map(v => v * v).sum
        var cum = BigInt(0)
        val ws = blk.zipWithIndex.map { case (v, j0) =>
          cum += v; BigInt(w) * cum - BigInt(j0 + 1) * bs
        }
        val r = (ws.max - ws.min).toDouble
        val s2 = (BigInt(w) * sv2 - bs * bs).toDouble
        math.floor(r / math.sqrt(s2) * 1e6 + 0.5).toLong
      }
      (nb.toLong,
        BigDecimal(rs.sum.toDouble / nb / 1e6)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val pts = Seq(5, 10, 15).map { w =>
      val (nb, mrs) = rsFor(w)
      val row = got.find(_.getAs[Long]("w") == w).get
      assert(row.getAs[Long]("n_blocks") === nb, s"w=$w blocks")
      assert(row.getAs[Double]("mean_rs") === mrs, s"w=$w mean R/S")
      (math.floor(math.log(w) * 1e6 + 0.5).toLong,
        math.floor(math.log(mrs) * 1e6 + 0.5).toLong)
    }
    val np = pts.length.toLong
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val slope = (np * sxy - sx * sy).toDouble / (np * sxx - sx * sx)
    got.foreach { r =>
      assert(math.abs(r.getAs[Double]("hurst") - slope) < 1e-5)
      // a valid rescaled-range exponent
      assert(r.getAs[Double]("hurst") > 0.0 &&
        r.getAs[Double]("hurst") < 1.0)
    }
  }

  /** Daily revenue totals in cents at sf0.001, day-ordered. */
  private def dailyCents(): Seq[Long] =
    Tables.t(spark, sf0, "events")
      .select(to_date(col("ts")),
        floor(col("value") * 100 + 0.5).cast("long"))
      .collect()
      .groupBy(_.getDate(0).toLocalDate)
      .view.mapValues(_.map(_.getLong(1)).sum).toSeq
      .sortBy(_._1.toEpochDay).map(_._2)

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("ljungbox: rho and Q replay exactly at all 7 lags") {
    val days = dailyCents().map(BigInt(_))
    val n = days.length
    val sv = days.sum
    val dev = days.map(v => BigInt(n) * v - sv)
    val den = dev.map(d => d * d).sum
    var cum = 0L
    val want = (1 to 7).map { k =>
      val num = (k until n).map(t => dev(t) * dev(t - k)).sum
      val rho = math.floor(
        num.toDouble / den.toDouble * 1e6 + 0.5).toLong
      cum += rho * rho / (n - k)
      (k.toLong, round6(rho.toDouble / 1e6),
        round6(n.toDouble * (n + 2) * cum.toDouble / 1e12))
    }
    val got = q("q_ts_ljungbox").collect()
      .map(r => (r.getAs[Long]("lag"), r.getAs[Double]("rho"),
        r.getAs[Double]("q_stat"))).toSeq
    assert(got === want)
    // Q is a running sum of non-negative terms
    assert(got.map(_._3) === got.map(_._3).sorted)
  }

  test("durbin-watson replays exactly and sits in [0, 4]") {
    val days = dailyCents()
    val n = days.length
    val si = (1 to n).map(BigInt(_)).sum
    val sv = days.map(BigInt(_)).sum
    val sii = (1 to n).map(i => BigInt(i) * i).sum
    val siv = days.zipWithIndex.map { case (v, i) =>
      BigInt(i + 1) * v }.sum
    val b = (BigInt(n) * siv - si * sv).toDouble /
      (BigInt(n) * sii - si * si).toDouble
    val a = (sv.toDouble - b * si.toDouble) / n
    val ec = days.zipWithIndex.map { case (v, i) =>
      math.floor((v - a - b * (i + 1)) * 100 + 0.5).toLong }
    val s2 = ec.map(e => BigInt(e) * e).sum
    val sd2 = ec.sliding(2).map(p => BigInt(p(1) - p(0)) *
      (p(1) - p(0))).sum
    val r = q("q_ts_dw").collect().head
    assert(r.getAs[Long]("n_days") === n.toLong)
    assert(r.getAs[Double]("slope") === round6(b))
    val dw = r.getAs[Double]("dw")
    assert(dw === round6(sd2.toDouble / s2.toDouble))
    assert(dw >= 0.0 && dw <= 4.0)
  }

  test("periodogram: power fractions replay and are a valid share") {
    val days = dailyCents().map(BigInt(_))
    val n = days.length
    val sv = days.sum
    val dev = days.map(v => BigInt(n) * v - sv)
    val den = dev.map(d => d * d).sum
    val got = q("q_ts_periodogram").collect()
      .map(r => r.getAs[Long]("period") ->
        (r.getAs[Long]("n_days"), r.getAs[Double]("power_frac"))).toMap
    Seq(7, 14, 30).foreach { p =>
      val cw = (0 until p).map(j =>
        math.floor(math.cos(2 * math.Pi * j / p) * 1e6 + 0.5).toLong)
      val sw = (0 until p).map(j =>
        math.floor(math.sin(2 * math.Pi * j / p) * 1e6 + 0.5).toLong)
      val cs = dev.zipWithIndex.map { case (dv, i) =>
        dv * cw(i % p) }.sum
      val ss = dev.zipWithIndex.map { case (dv, i) =>
        dv * sw(i % p) }.sum
      val want = round6(2.0 * (cs.toDouble * cs.toDouble +
        ss.toDouble * ss.toDouble) / (1e12 * n * den.toDouble))
      assert(got(p.toLong)._1 === n.toLong)
      assert(got(p.toLong)._2 === want, s"p=$p")
      // a fraction of total spectral mass
      assert(want >= 0.0 && want <= 1.0 + 1e-9)
    }
  }

  test("pacf: Durbin-Levinson closed forms replay from the rho grid") {
    val days = dailyCents().map(BigInt(_))
    val n = days.length
    val sv = days.sum
    val dev = days.map(v => BigInt(n) * v - sv)
    val den = dev.map(d => d * d).sum
    val r = (1 to 3).map { k =>
      val num = (k until n).map(t => dev(t) * dev(t - k)).sum
      math.floor(num.toDouble / den.toDouble * 1e6 + 0.5) / 1e6
    }
    val p11 = r(0)
    val p22 = (r(1) - r(0) * r(0)) / (1.0 - r(0) * r(0))
    val p21 = r(0) - p22 * r(0)
    val p33 = (r(2) - p21 * r(1) - p22 * r(0)) /
      (1.0 - p21 * r(0) - p22 * r(1))
    val got = q("q_ts_pacf").collect()
      .map(x => x.getAs[Long]("lag") ->
        (x.getAs[Double]("rho"), x.getAs[Double]("pacf"))).toMap
    Seq((1L, r(0), p11), (2L, r(1), p22), (3L, r(2), p33)).foreach {
      case (k, rho, pacf) =>
        assert(got(k)._1 === round6(rho), s"rho lag $k")
        assert(got(k)._2 === round6(pacf), s"pacf lag $k")
    }
    // lag-1 pacf IS the lag-1 autocorrelation
    assert(got(1L)._1 === got(1L)._2)
  }

  test("holt-winters: the triple-smoothing recursion replays exactly") {
    val days = dailyCents().map(_.toDouble)
    assert(days.length >= 15)
    var lvl = days.take(7).sum / 7.0
    // textual order matters: the engines sum v1..v7 left-to-right
    def wsum(xs: Seq[Double]) = xs.reduceLeft(_ + _)
    lvl = wsum(days.take(7)) / 7.0
    var trd = (wsum(days.slice(7, 14)) / 7.0 - lvl) / 7.0
    val seas = Array.tabulate(7)(k => days(k) - lvl)
    val want = (8 to days.length).map { t =>
      val j = (t - 1) % 7
      val sOld = seas(j)
      val fit = lvl + trd + sOld
      val v = days(t - 1)
      val lnew = 0.3 * (v - sOld) + 0.7 * (lvl + trd)
      val bnew = 0.1 * (lnew - lvl) + 0.9 * trd
      val snew = 0.2 * (v - lnew) + 0.8 * sOld
      lvl = lnew; trd = bnew; seas(j) = snew
      (t.toLong, round6(lnew / 100.0), round6(bnew / 100.0),
        round6(snew / 100.0), round6(fit / 100.0))
    }
    val got = q("q_ts_holtwinters").collect().map(r =>
      (r.getAs[Long]("idx"), r.getAs[Double]("level"),
        r.getAs[Double]("trend"), r.getAs[Double]("seasonal"),
        r.getAs[Double]("fitted"))).toSeq
    assert(got === want)
  }

  test("interarrival: exponential-fit KS replays per event type") {
    val rows = Tables.t(spark, sf0, "events")
      .select(col("event_type"), col("event_id"),
        expr("unix_micros(CAST(ts AS TIMESTAMP))").as("tm"))
      .collect()
      .map(r => (r.getString(0), r.getAs[Long]("event_id"),
        r.getAs[Long]("tm")))
    val got = q("q_events_interarrival").collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_gaps"), r.getAs[Double]("mean_gap_s"),
          r.getAs[Double]("ks_stat"))).toMap
    rows.groupBy(_._1).foreach { case (et, rs) =>
      val sorted = rs.sortBy(r => (r._3, r._2))
      val gaps = sorted.sliding(2)
        .map(p => (p(1)._3 - p(0)._3) / 1000000L).toSeq
      val n = gaps.length.toLong
      val sg = gaps.map(BigInt(_)).sum
      val vc = gaps.groupBy(identity).toSeq.sortBy(_._1)
        .map { case (g, gs) => (g, gs.length.toLong) }
      var cum = 0L
      val ks = vc.map { case (g, cnt) =>
        cum += cnt
        val fexp = 1.0 - math.exp(-(n.toDouble / sg.toDouble) * g)
        math.max(cum.toDouble / n - fexp,
          fexp - (cum - cnt).toDouble / n)
      }.max
      assert(got(et)._1 === n)
      assert(got(et)._2 === round6(sg.toDouble / n.toDouble))
      assert(got(et)._3 === round6(ks), s"ks for $et")
    }
  }

  test("grubbs: the extreme-day statistic replays exactly") {
    val days = Tables.t(spark, sf0, "events")
      .select(to_date(col("ts")),
        floor(col("value") * 100 + 0.5).cast("long"))
      .collect()
      .groupBy(_.getDate(0).toLocalDate)
      .view.mapValues(_.map(_.getLong(1)).sum).toSeq
      .sortBy(_._1.toEpochDay)
    val vs = days.map(v => BigInt(v._2))
    val n = vs.length
    val sv = vs.sum
    val svv = vs.map(v => v * v).sum
    val adevs = days.map { case (day, v) =>
      (day, (BigInt(n) * v - sv).abs) }
    val mdev = adevs.map(_._2).max
    val peak = adevs.filter(_._2 == mdev).map(_._1.toString).max
    val sd = math.sqrt((n.toDouble * svv.toDouble -
      sv.toDouble * sv.toDouble) / (n.toDouble * (n - 1)))
    val row = q("q_ts_grubbs").collect().head
    assert(row.getAs[Long]("n_days") === n.toLong)
    assert(row.getAs[java.sql.Date]("peak_day").toString === peak)
    assert(row.getAs[Double]("mean_rev") ===
      round6(sv.toDouble / n / 100.0))
    assert(row.getAs[Double]("std_rev") === round6(sd / 100.0))
    assert(row.getAs[Double]("g_stat") ===
      round6(mdev.toDouble / n / sd))
  }

  test("variance ratio replays exactly for q = 2 and 5") {
    val x = dailyCents().map(v => math.log(v.toDouble))
    def stats(k: Int): (Int, Double) = {
      val r = (k until x.length).map(t =>
        math.floor((x(t) - x(t - k)) * 1e9 + 0.5).toLong)
      val n = r.length
      val sr = r.map(BigInt(_)).sum
      val srr = r.map(v => BigInt(v) * v).sum
      (n, (srr.toDouble - sr.toDouble * sr.toDouble / n) / (n - 1))
    }
    val (_, v1) = stats(1)
    val got = q("q_ts_varratio").collect()
      .map(r => r.getAs[Long]("q") ->
        (r.getAs[Long]("n_obs"), r.getAs[Double]("vr"))).toMap
    Seq(2, 5).foreach { k =>
      val (n, vk) = stats(k)
      assert(got(k.toLong)._1 === n.toLong)
      assert(got(k.toLong)._2 === round6(vk / (k * v1)), s"q=$k")
    }
  }
}

package graft

import org.apache.spark.sql.functions._

/** Scalar replays for the round-11 widening operators: each test
  * recomputes the operator's math from collected fixture rows with
  * plain Scala (BigInt-exact where the query is integer-exact, the
  * identical IEEE double sequence where it is not) and compares the
  * registered query's output row-for-row. */
class WidenSpec extends SparkSuite {

  private def snap6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Daily revenue cents ordered by day — the shared series fixture. */
  private lazy val dayCents: Seq[Long] = Tables.t(spark, sf0, "events")
    .select(to_date(col("ts")).as("day"),
      floor(col("value") * 100 + 0.5).cast("long").as("c"))
    .collect()
    .groupBy(_.getDate(0).toLocalDate)
    .view.mapValues(_.map(_.getLong(1)).sum).toSeq
    .sortBy(_._1.toEpochDay).map(_._2)

  private lazy val docRows: Seq[(Long, String, String, Long)] =
    Tables.t(spark, sf0, "documents")
      .select(col("doc_id"), col("text"), col("source"), col("n_chars"))
      .collect().toSeq
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3)))

  /** The derived link graph, replayed from doc ids. */
  private lazy val undEdges: Set[(Long, Long)] = {
    val ids = docRows.map(_._1)
    val n = ids.length.toLong
    ids.flatMap { src =>
      Seq(src / 2, (src * 31 + 17) % n, (src * src + 1) % n)
        .filter(_ != src)
        .map(dst => (math.min(src, dst), math.max(src, dst)))
    }.toSet
  }

  test("theta: forecasts replay the OLS + SES recursion bit-for-bit") {
    val days = dayCents
    val n = days.length
    val si = (1 to n).map(_.toLong).sum
    val sv = days.map(BigInt(_)).sum
    val siv = days.zipWithIndex.map { case (v, k) =>
      BigInt(k + 1) * v }.sum
    val sii = (1 to n).map(i => BigInt(i) * i).sum
    val b = (BigInt(n) * siv - BigInt(si) * sv).toDouble /
      (BigInt(n) * sii - BigInt(si) * BigInt(si)).toDouble
    val a0 = (sv.toDouble - b * si.toDouble) / n
    val z = days.zipWithIndex.map { case (v, k) =>
      (2 * v).toDouble - (a0 + b * (k + 1).toDouble) }
    var l = z.head
    z.tail.foreach(x => l = 0.5 * x + 0.5 * l)
    val got = q("q_ts_theta").collect()
      .map(r => r.getAs[Long]("h") -> r.getAs[Double]("forecast")).toMap
    assert(got.size === 7)
    (1 to 7).foreach { h =>
      val fc = ((l + (a0 + b * (n + h).toDouble)) / 2.0) / 100.0
      assert(math.abs(got(h.toLong) - snap6(fc)) < 1e-9, s"h=$h")
    }
  }

  test("spectral entropy: normalized, 3 freqs, peak = periodogram argmax") {
    val row = q("q_ts_spectral_entropy").collect().head
    assert(row.getAs[Long]("n_freq") === 3L)
    val e = row.getAs[Double]("entropy")
    assert(e >= 0.0 && e <= 1.0 + 1e-9, s"entropy out of range: $e")
    val per = q("q_ts_periodogram").collect()
      .map(r => r.getAs[Long]("period") -> r.getAs[Double]("power_frac"))
    val peak = per.maxBy { case (p, f) => (f, -p) }._1
    assert(row.getAs[Long]("peak_period") === peak)
  }

  test("cronbach: alpha replays the exact integer-moment formula") {
    val items = docRows.map { case (_, text, _, nc) =>
      val toks = text.split(" ", -1)
      (nc, toks.length.toLong, toks.distinct.length.toLong)
    }
    val n = BigInt(items.length)
    def mom(xs: Seq[Long]): (BigInt, BigInt) =
      (xs.map(BigInt(_)).sum, xs.map(x => BigInt(x) * x).sum)
    val (s1, q1) = mom(items.map(_._1))
    val (s2, q2) = mom(items.map(_._2))
    val (s3, q3) = mom(items.map(_._3))
    val (st, qt) = mom(items.map(i => i._1 + i._2 + i._3))
    val num = (n * q1 - s1 * s1).toDouble +
      (n * q2 - s2 * s2).toDouble + (n * q3 - s3 * s3).toDouble
    val den = (n * qt - st * st).toDouble
    val alpha = (3.0 / 2.0) * (1.0 - num / den)
    val row = q("q_stats_cronbach").collect().head
    assert(row.getAs[Long]("n_docs") === items.length.toLong)
    assert(row.getAs[Long]("k_items") === 3L)
    assert(math.abs(row.getAs[Double]("alpha") - snap6(alpha)) < 1e-9)
  }

  test("mcnemar: discordant cells and chi2 replay exactly") {
    val gates = docRows.map { case (_, text, _, nc) =>
      (nc >= 250, text.split(" ", -1).length >= 45) }
    val b = gates.count { case (ga, gb) => ga && !gb }.toLong
    val c = gates.count { case (ga, gb) => !ga && gb }.toLong
    val row = q("q_stats_mcnemar").collect().head
    assert(row.getAs[Long]("n") === gates.length.toLong)
    assert(row.getAs[Long]("n_both") ===
      gates.count(g => g._1 && g._2).toLong)
    assert(row.getAs[Long]("b") === b)
    assert(row.getAs[Long]("c") === c)
    val chi2 = if (b + c > 0)
      ((math.abs(b - c) - 1) * (math.abs(b - c) - 1)).toDouble / (b + c)
    else 0.0
    assert(math.abs(row.getAs[Double]("chi2") - snap6(chi2)) < 1e-9)
  }

  test("ktruss: census replays a brute-force support peel") {
    def adjacency(e: Set[(Long, Long)]): Map[Long, Set[Long]] =
      (e.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) })
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def peelOnce(e: Set[(Long, Long)]): Set[(Long, Long)] = {
      val adj = adjacency(e)
      e.filter { case (a, b) =>
        (adj(a) intersect adj(b)).nonEmpty }
    }
    var e = undEdges
    val expect = Seq.newBuilder[(Long, Long, Long)]
    def nodes(s: Set[(Long, Long)]): Long =
      s.flatMap(p => Seq(p._1, p._2)).size.toLong
    expect += ((0L, e.size.toLong, nodes(e)))
    for (r <- 1 to 3) {
      e = peelOnce(e)
      expect += ((r.toLong, e.size.toLong, nodes(e)))
    }
    val got = q("q_graph_ktruss").collect()
      .map(r => (r.getAs[Long]("round"), r.getAs[Long]("n_edges"),
        r.getAs[Long]("n_nodes"))).toSeq.sortBy(_._1)
    assert(got === expect.result())
  }

  test("scc pivot: FW-BW counts replay a 6-round BFS") {
    val ids = docRows.map(_._1)
    val n = ids.length.toLong
    val dirE = ids.flatMap { src =>
      Seq(src / 2, (src * 31 + 17) % n, (src * src + 1) % n)
        .filter(_ != src).map(dst => (src, dst))
    }.toSet
    val pivot = ids.min
    def reach(step: Map[Long, Seq[Long]]): Set[Long] = {
      var visited = Set(pivot)
      for (_ <- 1 to 6) {
        val next = visited.flatMap(v => step.getOrElse(v, Nil))
        visited = visited ++ next
      }
      visited
    }
    val fwd = reach(dirE.toSeq.groupBy(_._1)
      .view.mapValues(_.map(_._2)).toMap)
    val bwd = reach(dirE.toSeq.groupBy(_._2)
      .view.mapValues(_.map(_._1)).toMap)
    val row = q("q_graph_scc_pivot").collect().head
    assert(row.getAs[Long]("pivot") === pivot)
    assert(row.getAs[Long]("n_forward") === fwd.size.toLong)
    assert(row.getAs[Long]("n_backward") === bwd.size.toLong)
    assert(row.getAs[Long]("n_scc") === (fwd intersect bwd).size.toLong)
    // the pivot SCC is a genuine subset of both reaches
    assert(row.getAs[Long]("n_scc") <= row.getAs[Long]("n_forward"))
    assert(row.getAs[Long]("n_scc") <= row.getAs[Long]("n_backward"))
  }

  test("boilerplate: per-source ratios replay the shingle-spread rule") {
    val docShingles = docRows.map { case (id, text, src, _) =>
      val toks = text.split(" ", -1)
      val sh = if (toks.length >= 8)
        toks.sliding(8).map(_.mkString(" ")).toSet
      else Set.empty[String]
      (id, src, sh)
    }
    val spread = docShingles.flatMap { case (_, src, sh) =>
      sh.map(_ -> src) }.distinct
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
    val boiler = spread.filter(_._2 >= 3).keySet
    val expect = docShingles.groupBy(_._2).map { case (src, ds) =>
      val nsh = ds.map(_._3.size).sum.toLong
      val nb = ds.map(_._3.count(boiler)).sum.toLong
      src -> ((nsh, nb))
    }
    val got = q("q_text_boilerplate").collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_shingles"), r.getAs[Long]("n_boiler"),
          r.getAs[Double]("boiler_ratio")))).toMap
    assert(got.keySet === expect.keySet)
    expect.foreach { case (src, (nsh, nb)) =>
      val (gsh, gb, ratio) = got(src)
      assert(gsh === nsh, s"source $src shingles")
      assert(gb === nb, s"source $src boiler")
      assert(math.abs(ratio - snap6(nb.toDouble / nsh)) < 1e-9)
    }
  }

  test("croston: size/interval levels replay the demand-day fold") {
    val days = Tables.t(spark, sf0, "events")
      .select(to_date(col("ts")).as("day"),
        (col("value") > 250.0).cast("long").as("hit"))
      .collect()
      .groupBy(_.getDate(0).toLocalDate)
      .view.mapValues(_.map(_.getLong(1)).sum).toSeq
      .sortBy(_._1.toEpochDay)
    val demand = days.zipWithIndex.collect {
      case ((_, c), k) if c > 0 => ((k + 1).toLong, c) }
    var z = demand.head._2.toDouble
    var p = demand.head._1.toDouble
    var ti = demand.head._1
    demand.tail.foreach { case (i, c) =>
      z = 0.3 * c + 0.7 * z
      p = 0.3 * (i - ti).toDouble + 0.7 * p
      ti = i
    }
    val row = q("q_ts_croston").collect().head
    assert(row.getAs[Long]("n_days") === days.length.toLong)
    assert(row.getAs[Long]("n_demand_days") === demand.length.toLong)
    assert(math.abs(row.getAs[Double]("size_level") - snap6(z)) < 1e-9)
    assert(math.abs(row.getAs[Double]("interval_level") - snap6(p))
      < 1e-9)
    assert(math.abs(row.getAs[Double]("forecast_per_day")
      - snap6(z / p)) < 1e-9)
  }

  test("cohend: per-source effect sizes replay the pooled formula") {
    val bySrc = docRows.groupBy(_._3)
      .view.mapValues(_.map(_._4)).toMap
    val tn = BigInt(docRows.length)
    val ts = docRows.map(r => BigInt(r._4)).sum
    val tq = docRows.map(r => BigInt(r._4) * r._4).sum
    val got = q("q_stats_cohend").collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Double]("cohen_d")))).toMap
    assert(got.keySet === bySrc.keySet)
    bySrc.foreach { case (src, xs) =>
      val n = BigInt(xs.length)
      val sx = xs.map(BigInt(_)).sum
      val qx = xs.map(x => BigInt(x) * x).sum
      val m1 = sx.toDouble / xs.length
      val m2 = (ts - sx).toDouble / (tn - n).toLong
      val ss1 = (n * qx - sx * sx).toDouble / xs.length
      val ss2 = ((tn - n) * (tq - qx) - (ts - sx) * (ts - sx)).toDouble /
        (tn - n).toLong
      val d = (m1 - m2) / math.sqrt((ss1 + ss2) / (tn - 2).toLong)
      assert(got(src)._1 === xs.length.toLong)
      assert(math.abs(got(src)._2 - snap6(d)) < 1e-9, s"source $src")
    }
  }

  private lazy val embRows: Array[(Long, Seq[Double], Int)] =
    Tables.t(spark, sf0, "embeddings")
      .select(col("vec_id"), col("embedding"), col("label"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble),
        r.getInt(2)))

  private def d2pQ(a: Seq[Double], b: Seq[Double]): Long =
    a.zip(b).map { case (x, y) =>
      math.floor((x - y) * (x - y) * 1e12 + 0.5).toLong }.sum

  /** Brute-force replay of the shared anchor-NN stage: for each of the
    * 128 lowest vec_ids per label, the exact k smallest quantized
    * distances over the whole block. */
  private def anchorNn(k: Int): Map[Int, Seq[(Long, Seq[(Long, Long)])]] =
    embRows.groupBy(_._3).view.mapValues { vs =>
      vs.sortBy(_._1).take(128).toSeq.map { case (id, e, _) =>
        id -> vs.filter(_._1 != id)
          .map(o => (d2pQ(e, o._2), o._1)).sortBy(identity)
          .take(k).toSeq
      }
    }.toMap

  test("intrinsic dim: per-label anchor 2-NN MLE replays brute force") {
    val expect = anchorNn(2).map { case (l, anchors) =>
      val terms = anchors.flatMap { case (_, ds) =>
        val (r1, r2) = (ds(0)._1, ds(1)._1)
        if (r1 > 0 && r2 > r1)
          Some(math.floor(math.log(r2.toDouble / r1) * 1e9 + 0.5)
            .toLong)
        else None
      }
      val hsum = terms.sum
      l.toLong -> ((anchors.length.toLong, terms.length.toLong,
        2.0 * terms.length / (hsum.toDouble / 1e9)))
    }
    val got = q("q_embed_intrinsic_dim").collect()
      .map(r => r.getAs[Long]("label") ->
        ((r.getAs[Long]("n_anchors"), r.getAs[Long]("n_used"),
          r.getAs[Double]("intrinsic_dim")))).toMap
    assert(got.keySet === expect.keySet)
    expect.foreach { case (l, (nv, nu, id)) =>
      assert(got(l)._1 === nv, s"label $l n_anchors")
      assert(got(l)._2 === nu, s"label $l n_used")
      assert(math.abs(got(l)._3 - snap6(id)) < 1e-9, s"label $l dim")
    }
  }

  test("hubness: in-degree census replays the anchor 3-NN lists") {
    val expect = anchorNn(3).map { case (l, anchors) =>
      val blockIds = embRows.filter(_._3 == l).map(_._1)
      val indeg = anchors.flatMap(_._2.map(_._2))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val degs = blockIds.map(id => indeg.getOrElse(id, 0L))
      val n = degs.length.toDouble
      val (s1, s2, s3) = (degs.sum.toDouble,
        degs.map(x => x * x).sum.toDouble,
        degs.map(x => x * x * x).sum.toDouble)
      val m2 = s2 / n - (s1 / n) * (s1 / n)
      val skew =
        if (degs.length * degs.map(x => x * x).sum
            - degs.sum * degs.sum > 0)
          Some((s3 / n - 3 * (s1 / n) * (s2 / n)
            + 2 * (s1 / n) * (s1 / n) * (s1 / n))
            / (m2 * math.sqrt(m2)))
        else None
      l.toLong -> ((degs.length.toLong, degs.max,
        degs.count(_ == 0L).toLong, skew))
    }
    val got = q("q_embed_hubness").collect()
      .map(r => r.getAs[Long]("label") ->
        ((r.getAs[Long]("n_vecs"), r.getAs[Long]("max_indeg"),
          r.getAs[Long]("n_antihubs"),
          Option(r.getAs[java.lang.Double]("hub_skew"))
            .map(_.doubleValue)))).toMap
    assert(got.keySet === expect.keySet)
    expect.foreach { case (l, (nv, mx, ah, sk)) =>
      assert(got(l)._1 === nv, s"label $l n_vecs")
      assert(got(l)._2 === mx, s"label $l max_indeg")
      assert(got(l)._3 === ah, s"label $l n_antihubs")
      (got(l)._4, sk) match {
        case (Some(g), Some(e)) =>
          assert(math.abs(g - snap6(e)) < 1e-9, s"label $l skew")
        case (g, e) => assert(g.isEmpty === e.isEmpty, s"label $l skew")
      }
    }
  }

  test("embed outliers: top-3 per label replays quantized distances") {
    val vecs = Tables.t(spark, sf0, "embeddings")
      .select(col("vec_id"), col("embedding"), col("label"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble),
        r.getInt(2)))
    val cent: Map[(Int, Int), Double] = vecs
      .flatMap { case (_, e, l) => e.zipWithIndex.map { case (x, p) =>
        ((l, p), math.floor(x * 1e6 + 0.5).toLong) } }
      .groupBy(_._1).view.mapValues { xs =>
        snap6(xs.map(_._2).sum.toDouble / xs.length / 1e6) }.toMap
    val d2p = vecs.map { case (id, e, l) =>
      val s = e.zipWithIndex.map { case (x, p) =>
        val c = cent((l, p))
        math.floor((x - c) * (x - c) * 1e12 + 0.5).toLong }.sum
      (l, id, s)
    }
    val expect = d2p.groupBy(_._1).toSeq.flatMap { case (l, vs) =>
      vs.sortBy(v => (-v._3, v._2)).take(3).zipWithIndex.map {
        case ((_, id, s), i) => (l.toLong, (i + 1).toLong, id, s) }
    }.toSet
    val got = q("q_embed_outliers").collect()
      .map(r => (r.getAs[Long]("label"), r.getAs[Long]("rk"),
        r.getAs[Long]("vec_id"), r.getAs[Double]("dist_sq"))).toSeq
    assert(got.size === expect.size)
    got.foreach { case (l, rk, id, ds) =>
      val m = expect.find(e => e._1 == l && e._2 == rk)
      assert(m.isDefined && m.get._3 == id, s"label $l rank $rk")
      assert(math.abs(ds - snap6(m.get._4.toDouble / 1e12)) < 1e-9)
    }
  }

  /** Spark/DuckDB shared interpolated percentile: idx = p·(n−1). */
  private def pctile(sorted: Seq[Long], p: Double): Double = {
    val idx = p * (sorted.length - 1)
    val lo = idx.toInt
    if (lo == sorted.length - 1) sorted(lo).toDouble
    else sorted(lo) + (idx - lo) * (sorted(lo + 1) - sorted(lo))
  }

  test("bartlett: chi2 replays the quantized per-source terms") {
    val grid = docRows.groupBy(_._3).values.map { xs =>
      val n = xs.length.toLong
      val sx = xs.map(r => BigInt(r._4)).sum
      val qx = xs.map(r => BigInt(r._4) * r._4).sum
      val ssd = (BigInt(n) * qx - sx * sx).toDouble
      (n,
        math.floor(ssd / n * 1e6 + 0.5).toLong,
        (n - 1) * math.floor(
          math.log(ssd / (n * (n - 1.0))) * 1e9 + 0.5).toLong,
        math.floor(1e12 / (n - 1) + 0.5).toLong)
    }.toSeq
    val k = grid.length.toLong
    val ntot = grid.map(_._1).sum
    val (s1, s2, s3) = (grid.map(_._2).sum, grid.map(_._3).sum,
      grid.map(_._4).sum)
    val chi2 = ((ntot - k) * math.log(s1.toDouble / 1e6 / (ntot - k))
      - s2.toDouble / 1e9) /
      (1.0 + (s3.toDouble / 1e12 - 1.0 / (ntot - k)) / (3.0 * (k - 1)))
    val row = q("q_stats_bartlett").collect().head
    assert(row.getAs[Long]("k_groups") === k)
    assert(row.getAs[Long]("n_total") === ntot)
    assert(row.getAs[Long]("df") === k - 1)
    assert(math.abs(row.getAs[Double]("bartlett_chi2") - snap6(chi2))
      < 1e-9)
  }

  test("fleiss: kappa replays the three-gate vote census") {
    val rs = docRows.map { case (_, text, _, nc) =>
      val toks = text.split(" ").toSeq
      (if (nc >= 250) 1L else 0L) +
        (if (toks.length >= 45) 1L else 0L) +
        (if (toks.distinct.length >= 40) 1L else 0L)
    }
    val n = rs.length.toLong
    val sr = rs.sum
    val sq = rs.map(r => r * r + (3 - r) * (3 - r)).sum
    val pbar = (sq - 3 * n).toDouble / (6.0 * n)
    val a = sr.toDouble / (3.0 * n)
    val pe = a * a + (1.0 - a) * (1.0 - a)
    val kappa = (pbar - pe) / (1.0 - pe)
    val row = q("q_stats_fleiss").collect().head
    assert(row.getAs[Long]("n_docs") === n)
    assert(row.getAs[Long]("n_raters") === 3L)
    assert(math.abs(row.getAs[Double]("fleiss_kappa") - snap6(kappa))
      < 1e-9)
  }

  test("qq: nine fences replay mean/sd moments and decile interp") {
    val cs = docRows.map(_._4).sorted
    val n = cs.length.toLong
    val s1 = cs.map(BigInt(_)).sum
    val q1 = cs.map(c => BigInt(c) * c).sum
    val mean = s1.toDouble / n
    val sd = math.sqrt((BigInt(n) * q1 - s1 * s1).toDouble
      / (n.toDouble * (n - 1)))
    val zs = Seq(-1.2815515655446004, -0.8416212335729143,
      -0.5244005127080407, -0.2533471031357997, 0.0,
      0.2533471031357997, 0.5244005127080407, 0.8416212335729143,
      1.2815515655446004)
    val got = q("q_stats_qq").collect()
    assert(got.length === 9)
    got.foreach { r =>
      val k = r.getAs[Long]("fence").toInt
      val emp = snap6(pctile(cs, k / 10.0))
      val theo = snap6(mean + sd * zs(k - 1))
      assert(math.abs(r.getAs[Double]("emp_q") - emp) < 1e-9, s"f$k")
      assert(math.abs(r.getAs[Double]("theo_q") - theo) < 1e-9, s"f$k")
      assert(math.abs(r.getAs[Double]("gap") - snap6(emp - theo))
        < 1e-9, s"f$k")
    }
  }

  test("mcc curve: cells and mcc replay the decile fences") {
    val labeled = Tables.t(spark, sf0, "documents")
      .select(col("n_chars"), col("lang")).collect()
      .map(r => (r.getLong(0), if (r.getString(1) == "en") 1L else 0L))
    val cs = labeled.map(_._1).sorted
    val got = q("q_ml_mcc_curve").collect()
    assert(got.length === 9)
    got.foreach { r =>
      val k = r.getAs[Long]("fence").toInt
      val t = pctile(cs, k / 10.0)
      val tp = labeled.count(x => x._1 > t && x._2 == 1L).toLong
      val fp = labeled.count(x => x._1 > t && x._2 == 0L).toLong
      val tn = labeled.count(x => x._1 <= t && x._2 == 0L).toLong
      val fn = labeled.count(x => x._1 <= t && x._2 == 1L).toLong
      assert(r.getAs[Long]("tp") === tp, s"f$k tp")
      assert(r.getAs[Long]("fp") === fp, s"f$k fp")
      assert(r.getAs[Long]("tn") === tn, s"f$k tn")
      assert(r.getAs[Long]("fn") === fn, s"f$k fn")
      val mcc = (tp * tn - fp * fn).toDouble /
        math.sqrt((tp + fp).toDouble * (tp + fn) * (tn + fp)
          * (tn + fn))
      assert(math.abs(r.getAs[Double]("mcc") - snap6(mcc)) < 1e-9)
    }
  }

  test("kpss: eta replays exact partial-sum/Bartlett integer algebra") {
    val xs = dayCents.map(_ / 100).toVector
    val n = xs.length
    val s = xs.map(BigInt(_)).sum
    val ps = xs.scanLeft(BigInt(0))(_ + _).tail
    val sa2 = ps.zipWithIndex.map { case (p, i) =>
      val a = BigInt(n) * p - BigInt(i + 1) * s
      a * a
    }.sum
    val e = xs.map(x => BigInt(n) * x - s).toVector
    def b(l: Int): BigInt =
      (l until n).map(t => e(t) * e(t - l)).sum
    val d = 5 * b(0) + 2 * (4 * b(1) + 3 * b(2) + 2 * b(3) + b(4))
    val eta = 5.0 * sa2.toDouble / (n.toDouble * d.toDouble)
    val row = q("q_ts_kpss").collect().head
    assert(row.getAs[Long]("n_days") === n.toLong)
    assert(row.getAs[Long]("lags") === 4L)
    assert(math.abs(row.getAs[Double]("kpss_eta") - snap6(eta)) < 1e-9)
    assert(row.getAs[Boolean]("is_stationary") === (eta < 0.463))
  }

  test("dickey: df t-stat replays the five sufficient sums") {
    val xs = dayCents
    val pairs = xs.sliding(2).map(p => (p(0), p(1) - p(0))).toSeq
    val m = pairs.length.toLong
    val sz = pairs.map(p => BigInt(p._1)).sum
    val sy = pairs.map(p => BigInt(p._2)).sum
    val szz = pairs.map(p => BigInt(p._1) * p._1).sum
    val szy = pairs.map(p => BigInt(p._1) * p._2).sum
    val syy = pairs.map(p => BigInt(p._2) * p._2).sum
    val bzz = (m * szz - sz * sz).toDouble
    val bzy = (m * szy - sz * sy).toDouble
    val byy = (m * syy - sy * sy).toDouble
    val beta = bzy / bzz
    val tstat = beta / math.sqrt((byy - bzy * bzy / bzz)
      / ((m - 2) * bzz))
    val row = q("q_ts_dickey").collect().head
    assert(row.getAs[Long]("n_obs") === m)
    assert(math.abs(row.getAs[Double]("delta_coef") - snap6(beta))
      < 1e-9)
    assert(math.abs(row.getAs[Double]("df_t") - snap6(tstat)) < 1e-9)
    assert(row.getAs[Boolean]("is_unit_root") === (tstat > -2.86))
  }

  test("haar: level energy fractions replay dyadic block sums") {
    val xs = dayCents
    val n = xs.length
    val lev = (1 to 5).map { j =>
      val len = 1 << j
      val half = 1 << (j - 1)
      val nb = n / len
      val es = (0 until nb).map { k =>
        val d = xs.slice(k * len, k * len + half).map(BigInt(_)).sum -
          xs.slice(k * len + half, (k + 1) * len).map(BigInt(_)).sum
        d * d * BigInt(1 << (5 - j))
      }.sum
      (j.toLong, nb.toLong, es)
    }.filter(_._2 > 0)
    val etot = lev.map(_._3).sum
    val got = q("q_ts_haar").collect()
      .map(r => (r.getAs[Long]("level"), r.getAs[Long]("n_blocks"),
        r.getAs[Double]("energy_frac")))
    assert(got.map(g => (g._1, g._2)) === lev.map(l => (l._1, l._2)))
    got.zip(lev).foreach { case ((_, _, f), (_, _, es)) =>
      assert(math.abs(f - snap6(es.toDouble / etot.toDouble)) < 1e-9)
    }
  }

  test("simpson: per-source lexical concentration replays token counts") {
    val expect = docRows.groupBy(_._3).map { case (src, xs) =>
      val freq = xs.flatMap(_._2.split(" ")).groupBy(identity)
        .view.mapValues(_.size.toLong).toMap
      val nt = freq.values.sum
      val ff = freq.values.map(f => BigInt(f) * (f - 1)).sum
      src -> ((freq.size.toLong, nt,
        ff.toDouble / (nt.toDouble * (nt - 1)),
        (nt.toDouble * (nt - 1)) / ff.toDouble))
    }
    val got = q("q_text_simpson").collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_types"), r.getAs[Long]("n_tokens"),
          r.getAs[Double]("simpson"), r.getAs[Double]("eff_vocab"))))
      .toMap
    assert(got.keySet === expect.keySet)
    expect.foreach { case (s, (ty, nt, si, ev)) =>
      assert(got(s)._1 === ty); assert(got(s)._2 === nt)
      assert(math.abs(got(s)._3 - snap6(si)) < 1e-9, s"source $s")
      assert(math.abs(got(s)._4 - snap6(ev)) < 1e-9, s"source $s")
    }
  }

  test("hhi: mixture concentration replays source shares") {
    val grid = docRows.groupBy(_._3).toSeq.map { case (_, xs) =>
      (xs.length.toLong, xs.map(_._2.split(" ").length.toLong).sum)
    }
    val td = grid.map(_._1).sum
    val tt = grid.map(_._2).sum
    val sd2 = grid.map(g => BigInt(g._1) * g._1).sum
    val st2 = grid.map(g => BigInt(g._2) * g._2).sum
    val row = q("q_mix_hhi").collect().head
    assert(row.getAs[Long]("n_sources") === grid.length.toLong)
    assert(math.abs(row.getAs[Double]("hhi_docs")
      - snap6(sd2.toDouble / (td.toDouble * td.toDouble))) < 1e-9)
    assert(math.abs(row.getAs[Double]("eff_docs")
      - snap6(td.toDouble * td.toDouble / sd2.toDouble)) < 1e-9)
    assert(math.abs(row.getAs[Double]("hhi_tokens")
      - snap6(st2.toDouble / (tt.toDouble * tt.toDouble))) < 1e-9)
    assert(math.abs(row.getAs[Double]("eff_tokens")
      - snap6(tt.toDouble * tt.toDouble / st2.toDouble)) < 1e-9)
  }

  test("isotonic: max-min identity equals sequential PAV") {
    val langBy = Tables.t(spark, sf0, "documents")
      .select(col("doc_id"), col("lang")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val binned = docRows.groupBy(r => math.min(19L, r._4 / 50))
      .view.mapValues { xs =>
        (xs.length.toLong,
          xs.count(r => langBy(r._1) == "en").toLong)
      }.toSeq.sortBy(_._1)
    // sequential pool-adjacent-violators over the bin grid
    case class Blk(w: Long, s: Long)
    val pav = binned.foldLeft(List.empty[Blk]) { case (st, (_, (w, p))) =>
      var stack = Blk(w, p) :: st
      while (stack.size > 1 &&
          // head (newer) mean <= next (older) mean → violation, merge
          stack(0).s * stack(1).w <= stack(1).s * stack(0).w) {
        stack = Blk(stack(0).w + stack(1).w, stack(0).s + stack(1).s) ::
          stack.drop(2)
      }
      stack
    }.reverse
    // expand block means back over the bins each block covers
    var expanded = List.empty[Double]
    var rem = binned.map(_._2._1).toList
    pav.foreach { b =>
      var acc = 0L
      while (acc < b.w) {
        acc += rem.head; rem = rem.tail
        expanded = (b.s.toDouble / b.w) :: expanded
      }
      assert(acc == b.w, "PAV block does not align to bin boundaries")
    }
    val isoSeq = expanded.reverse
    val got = q("q_ml_isotonic").collect()
      .map(r => (r.getAs[Long]("bin"), r.getAs[Long]("n_docs"),
        r.getAs[Double]("raw_frac"), r.getAs[Double]("iso_frac")))
    assert(got.map(_._1) === binned.map(_._1))
    assert(got.map(_._2) === binned.map(_._2._1))
    got.zip(binned).zip(isoSeq).foreach {
      case (((_, _, raw, iso), (_, (w, p))), pavMean) =>
        assert(math.abs(raw - snap6(p.toDouble / w)) < 1e-9)
        assert(math.abs(iso - snap6(pavMean)) < 1e-9)
    }
    // monotone non-decreasing
    got.map(_._4).toSeq.sliding(2).foreach { p =>
      if (p.length == 2) assert(p(0) <= p(1) + 1e-9)
    }
  }

  test("odds ratio: 2x2 cells and Woolf interval replay the gates") {
    val cells = docRows.map { case (_, text, _, nc) =>
      (nc >= 250, text.split(" ").length >= 45)
    }
    val a = cells.count(x => x._1 && x._2).toLong
    val b = cells.count(x => x._1 && !x._2).toLong
    val c = cells.count(x => !x._1 && x._2).toLong
    val d = cells.count(x => !x._1 && !x._2).toLong
    val or = a.toDouble * d / (b.toDouble * c)
    val se = math.sqrt(1.0 / a + 1.0 / b + 1.0 / c + 1.0 / d)
    val row = q("q_stats_oddsratio").collect().head
    assert(row.getAs[Long]("a") === a)
    assert(row.getAs[Long]("b") === b)
    assert(row.getAs[Long]("c") === c)
    assert(row.getAs[Long]("d") === d)
    assert(math.abs(row.getAs[Double]("odds_ratio") - snap6(or)) < 1e-9)
    assert(math.abs(row.getAs[Double]("ci_lo")
      - snap6(math.exp(math.log(or) - 1.96 * se))) < 1e-9)
    assert(math.abs(row.getAs[Double]("ci_hi")
      - snap6(math.exp(math.log(or) + 1.96 * se))) < 1e-9)
  }

  test("degree gini: histogram identity equals sorted-rank formula") {
    val degs = undEdges.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).values.map(_.size.toLong).toSeq.sorted
    val n = degs.length
    val num = degs.zipWithIndex
      .map { case (x, i) => BigInt(2L * (i + 1) - n - 1) * x }.sum
    val den = BigInt(n) * degs.map(BigInt(_)).sum
    val row = q("q_graph_degree_gini").collect().head
    assert(row.getAs[Long]("n_nodes") === n.toLong)
    assert(row.getAs[Long]("max_deg") === degs.max)
    assert(math.abs(row.getAs[Double]("gini")
      - snap6(num.toDouble / den.toDouble)) < 1e-9)
  }

  test("tost: equivalence panel replays the Welch one-sided pair") {
    val bySrc = docRows.groupBy(_._3).view.mapValues(_.map(_._4)).toMap
    val tn = docRows.length.toLong
    val ts = docRows.map(r => BigInt(r._4)).sum
    val tq = docRows.map(r => BigInt(r._4) * r._4).sum
    val got = q("q_stats_tost").collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Double]("mean_diff"),
          r.getAs[Double]("t_lower"), r.getAs[Double]("t_upper"),
          r.getAs[Boolean]("is_equivalent")))).toMap
    assert(got.keySet === bySrc.keySet)
    bySrc.foreach { case (src, xs) =>
      val n = xs.length.toLong
      val sx = xs.map(BigInt(_)).sum
      val qx = xs.map(x => BigInt(x) * x).sum
      val diff = sx.toDouble / n - (ts - sx).toDouble / (tn - n)
      val se = math.sqrt(
        (BigInt(n) * qx - sx * sx).toDouble / (n.toDouble * (n - 1)) / n
          + (BigInt(tn - n) * (tq - qx) - (ts - sx) * (ts - sx)).toDouble
            / ((tn - n).toDouble * (tn - n - 1)) / (tn - n))
      val (tl, tu) = ((diff + 25.0) / se, (diff - 25.0) / se)
      assert(got(src)._1 === n, s"source $src")
      assert(math.abs(got(src)._2 - snap6(diff)) < 1e-9, s"source $src")
      assert(math.abs(got(src)._3 - snap6(tl)) < 1e-9, s"source $src")
      assert(math.abs(got(src)._4 - snap6(tu)) < 1e-9, s"source $src")
      assert(got(src)._5 === (tl > 1.645 && tu < -1.645), s"src $src")
    }
  }

  test("poisson gof: buckets replay the literal factor chain") {
    val byDay = Tables.t(spark, sf0, "events")
      .select(to_date(col("ts")).as("day"),
        (col("value") > 250.0).cast("long").as("hit"))
      .collect()
      .groupBy(_.getDate(0).toLocalDate)
      .view.mapValues(_.map(_.getLong(1)).sum).toSeq.map(_._2)
    val n = byDay.length
    val lam = byDay.sum.toDouble / n
    val fact = Seq(1.0, 1.0, 2.0, 6.0, 24.0, 120.0, 720.0, 5040.0)
    def p(k: Int): Double =
      if (k < 8) {
        val pow = (1 to k).foldLeft(1.0)((a, _) => a * lam)
        math.exp(-lam) * pow / fact(k)
      } else 1.0 - (0 to 7).map(p).sum
    val obs = byDay.map(c => math.min(c, 8L)).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val got = q("q_stats_poisson_gof").collect()
    assert(got.length === 9)
    got.foreach { r =>
      val k = r.getAs[Long]("bucket").toInt
      val o = obs.getOrElse(k.toLong, 0L)
      val e = n * p(k)
      assert(r.getAs[Long]("observed") === o, s"k$k")
      assert(math.abs(r.getAs[Double]("expected") - snap6(e)) < 1e-9)
      assert(math.abs(r.getAs[Double]("chi2_term")
        - snap6((o - e) * (o - e) / e)) < 1e-9, s"k$k")
    }
  }

  test("multimodal histogram: luma buckets replay pixel arithmetic") {
    val lums = docRows.map(_._1).flatMap { id =>
      val w = (4 + id % 3).toInt
      val h = (2 + id % 2).toInt
      for (y <- 0 until h; x <- 0 until w) yield
        ((id * 7 + x * 19 + y * 23) % 256) * 299 +
          ((id * 5 + x * 11 + y * 17) % 256) * 587 +
          ((id * 3 + x * 7 + y * 13) % 256) * 114
    }
    val hist = lums.groupBy(_ / 32000).view
      .mapValues(v => (v.size.toLong, v.map(BigInt(_)).sum)).toMap
    val tp = lums.length.toDouble
    val got = q("q_multimodal_histogram").collect()
    assert(got.map(_.getAs[Long]("bucket")).toSet ===
      hist.keySet.map(_.toLong))
    got.foreach { r =>
      val (np, sl) = hist(r.getAs[Long]("bucket"))
      assert(r.getAs[Long]("n_px") === np)
      assert(math.abs(r.getAs[Double]("share") - snap6(np / tp)) < 1e-9)
      assert(math.abs(r.getAs[Double]("mean_luma")
        - snap6(sl.toDouble / np / 1000.0)) < 1e-9)
    }
  }

  test("uniqueness ladder: three levels replay QI cell census") {
    val expect = (1 to 3).map { lvl =>
      val langBy = Tables.t(spark, sf0, "documents")
        .select(col("doc_id"), col("lang")).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      val keys = docRows.map { case (id, _, src, nc) =>
        lvl match {
          case 1 => s"$src|${langBy(id)}|$nc"
          case 2 => s"$src|${langBy(id)}|${nc / 100}"
          case _ => s"$src|${nc / 1000}"
        }
      }
      val cells = keys.groupBy(identity).values.map(_.size).toSeq
      (lvl.toLong, cells.length.toLong, cells.min.toLong,
        cells.count(_ == 1).toLong,
        cells.count(_ == 1).toDouble / keys.length)
    }
    val got = q("q_audit_uniqueness").collect()
      .map(r => (r.getAs[Long]("level"), r.getAs[Long]("n_cells"),
        r.getAs[Long]("k_floor"), r.getAs[Long]("n_singletons"),
        r.getAs[Double]("singleton_frac")))
    assert(got.length === 3)
    got.zip(expect).foreach { case (g, e) =>
      assert(g._1 === e._1); assert(g._2 === e._2)
      assert(g._3 === e._3); assert(g._4 === e._4)
      assert(math.abs(g._5 - snap6(e._5)) < 1e-9)
    }
  }
}

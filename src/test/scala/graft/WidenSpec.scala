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
}

package graft

import org.apache.spark.sql.functions._

/** Round-8 tier: robust stats, privacy audit, novelty, KMV sketches,
  * Holt smoothing, k-core peeling, curation ablation, DoReMi. */
class RefineSpec extends SparkSuite {
  import spark.implicits._

  // ---- q_agg_trimmed ----------------------------------------------------

  test("trimmed/winsorized means match a scalar replay") {
    val rows = q("q_agg_trimmed").collect()
      .map(r => r.getAs[String]("l_returnflag") -> r).toMap
    val data = Tables.t(spark, sf0, "lineitem")
      .select(col("l_returnflag"),
        floor(col("l_extendedprice") + 0.5).cast("long").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    def interp(xs: Seq[Long], p: Double): Double = {
      val rank = (xs.length - 1) * p
      val lo = rank.toInt
      val frac = rank - lo
      if (lo + 1 < xs.length) xs(lo) + frac * (xs(lo + 1) - xs(lo))
      else xs(lo).toDouble
    }
    data.foreach { case (rf, xs) =>
      val (p10, p90) = (interp(xs, 0.1), interp(xs, 0.9))
      val mid = xs.filter(x => x >= p10 && x <= p90)
      val trimmed = mid.sum.toDouble / mid.length
      val winsor = (mid.sum.toDouble + xs.count(_ < p10) * p10 +
        xs.count(_ > p90) * p90) / xs.length
      val r = rows(rf)
      assert(math.abs(r.getAs[Double]("trimmed_mean") - trimmed) < 1e-5,
        s"flag $rf trimmed")
      assert(math.abs(r.getAs[Double]("winsor_mean") - winsor) < 1e-5,
        s"flag $rf winsor")
      assert(r.getAs[Double]("p10") <= r.getAs[Double]("p90"))
    }
  }

  // ---- q_agg_spearman ---------------------------------------------------

  test("spearman: planted monotone pairs hit +1/-1, ties average") {
    val li = Seq(
      // flag M: y strictly increases with x -> rho = 1
      ("M", 1.0, 0.01), ("M", 2.0, 0.02), ("M", 3.0, 0.03),
      ("M", 4.0, 0.04),
      // flag D: y strictly decreases with x -> rho = -1
      ("D", 1.0, 0.04), ("D", 2.0, 0.03), ("D", 3.0, 0.02),
      ("D", 4.0, 0.01))
      .toDF("l_returnflag", "l_quantity", "l_discount")
      .withColumn("l_extendedprice", lit(100.0))
    val dir = fixtureDir("refine_spear")("lineitem" -> li)
    val got = q("q_agg_spearman", dir).collect()
      .map(r => r.getAs[String]("l_returnflag") ->
        r.getAs[Double]("spearman")).toMap
    assert(math.abs(got("M") - 1.0) < 1e-9, s"got $got")
    assert(math.abs(got("D") + 1.0) < 1e-9, s"got $got")
  }

  test("spearman on driver data stays in [-1, 1]") {
    q("q_agg_spearman").collect().foreach { r =>
      val v = r.getAs[Double]("spearman")
      assert(v >= -1.0 && v <= 1.0, s"rho out of range: $v")
    }
  }

  // ---- q_agg_skew_kurt --------------------------------------------------

  test("skew/kurt: symmetric two-point mass has skew 0, excess -2") {
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val ev = (0 until 40).map { i =>
      (i.toLong, ts0, i.toLong, "flat",
        if (i % 2 == 0) 10.0 else 20.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = fixtureDir("refine_sk")("events" -> ev)
    val r = q("q_agg_skew_kurt", dir).collect()
      .find(_.getAs[String]("event_type") == "flat").get
    assert(math.abs(r.getAs[Double]("skewness")) < 1e-9)
    assert(math.abs(r.getAs[Double]("kurtosis_excess") + 2.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("mean_value") - 15.0) < 1e-9)
  }

  // ---- q_audit_kanon ----------------------------------------------------

  test("k-anonymity: planted singleton class is flagged at risk") {
    val cust = Seq(
      // 6 identical-QI rows: class size 6, safe at k=5
      (1L, 0L, "SEG_A", 1500.0), (2L, 0L, "SEG_A", 1501.0),
      (3L, 0L, "SEG_A", 1502.0), (4L, 0L, "SEG_A", 1503.0),
      (5L, 0L, "SEG_A", 1504.0), (6L, 0L, "SEG_A", 1505.0),
      // singleton class: at risk
      (7L, 1L, "SEG_A", 5500.0),
      // pair class in another segment: at risk
      (8L, 2L, "SEG_B", 100.0), (9L, 2L, "SEG_B", 101.0))
      .toDF("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal")
    val dir = fixtureDir("refine_kanon")("customer" -> cust)
    val got = q("q_audit_kanon", dir).collect()
      .map(r => r.getAs[String]("c_mktsegment") -> r).toMap
    assert(got("SEG_A").getAs[Long]("n_classes") === 2L)
    assert(got("SEG_A").getAs[Long]("rows_at_risk") === 1L)
    assert(got("SEG_B").getAs[Long]("rows_at_risk") === 2L)
    assert(math.abs(got("SEG_B").getAs[Double]("risk_frac") - 1.0) < 1e-9)
  }

  // ---- q_text_novelty ---------------------------------------------------

  test("novelty: exact copies contribute zero, unique text full") {
    val docsDf = Seq(
      (0L, "alpha beta gamma delta", "en", "s0"),
      (1L, "alpha beta gamma delta", "en", "s1"), // copy -> 0 novelty
      (2L, "wholly unseen fresh phrase", "en", "s1")) // -> 1.0
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val dir = fixtureDir("refine_novel")("documents" -> docsDf)
    val got = q("q_text_novelty", dir).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(math.abs(got("s0").getAs[Double]("avg_novelty") - 1.0) < 1e-9)
    // s1: one doc at 0, one at 1 -> mean 0.5
    assert(math.abs(got("s1").getAs[Double]("avg_novelty") - 0.5) < 1e-9)
    assert(got("s1").getAs[Long]("n_novel") === 3L)
  }

  // ---- q_agg_kmv --------------------------------------------------------

  test("KMV: unsaturated sketches give exact distincts; copies share") {
    // sf0.001 sources hold < 64 distinct texts, so d_est is exact
    val est = q("q_agg_kmv").collect()
    val exact = Tables.t(spark, sf0, "documents")
      .select(col("source"),
        md5(lower(trim(col("text")))).as("h"))
      .distinct().groupBy(col("source")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    est.foreach { r =>
      val (sa, sb) = (r.getAs[String]("sa"), r.getAs[String]("sb"))
      assert(r.getAs[Double]("est_a") === exact(sa).toDouble, sa)
      assert(r.getAs[Double]("est_b") === exact(sb).toDouble, sb)
      val j = r.getAs[Double]("jaccard_est")
      assert(j >= 0.0 && j <= 1.0)
    }
  }

  test("KMV: identical sources estimate Jaccard 1, disjoint 0") {
    val texts = (0 until 30).map(i => s"text body number $i distinct")
    val rows =
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t, "en", "sA") } ++
      texts.zipWithIndex.map { case (t, i) =>
        (100L + i, t, "en", "sB") } ++ // sB = copy of sA
      (0 until 30).map(i =>
        (200L + i, s"other corpus entry $i unrelated", "en", "sC"))
    val docsDf = rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val dir = fixtureDir("refine_kmv")("documents" -> docsDf)
    val got = q("q_agg_kmv", dir).collect()
      .map(r => (r.getAs[String]("sa"), r.getAs[String]("sb")) ->
        r.getAs[Double]("jaccard_est")).toMap
    assert(got(("sA", "sB")) === 1.0)
    assert(got(("sA", "sC")) === 0.0)
    assert(got(("sB", "sC")) === 0.0)
  }

  // ---- q_ts_holt --------------------------------------------------------

  test("holt: recurrence matches a scalar replay on a planted series") {
    val ev = Seq(
      (0L, "2024-01-01 06:00:00", 10.0), (1L, "2024-01-01 18:00:00", 20.0),
      (2L, "2024-01-02 12:00:00", 30.0),
      (3L, "2024-01-03 12:00:00", 24.0),
      (4L, "2024-01-04 12:00:00", 40.0))
      .map { case (id, t, v) =>
        (id, java.sql.Timestamp.valueOf(t), id, "s", v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = fixtureDir("refine_holt")("events" -> ev)
    val got = q("q_ts_holt", dir).collect()
      .map(r => r.getAs[Long]("idx") ->
        (r.getAs[Double]("level"), r.getAs[Double]("trend"),
          r.getAs[Double]("forecast_next"))).toMap
    // daily means (cents): d1 = 1500, d2 = 3000, d3 = 2400, d4 = 4000
    val vs = Seq(1500.0, 3000.0, 2400.0, 4000.0)
    var lvl = vs(0); var trd = vs(1) - vs(0)
    val expect = scala.collection.mutable.Map(1L -> ((lvl, trd)))
    (1 until vs.length).foreach { i =>
      val nl = 0.5 * vs(i) + 0.5 * (lvl + trd)
      trd = 0.3 * (nl - lvl) + 0.7 * trd
      lvl = nl
      expect((i + 1).toLong) = (lvl, trd)
    }
    assert(got.keySet === expect.keySet)
    expect.foreach { case (i, (l, t)) =>
      assert(math.abs(got(i)._1 - l / 100) < 1e-6, s"level at $i")
      assert(math.abs(got(i)._2 - t / 100) < 1e-6, s"trend at $i")
      assert(math.abs(got(i)._3 - (l + t) / 100) < 1e-6, s"fc at $i")
    }
  }

  // ---- q_graph_kcore ----------------------------------------------------

  test("kcore: counts match a scalar peel replay; census is monotone") {
    val rows = q("q_graph_kcore").collect()
      .map(r => r.getAs[Long]("round") ->
        (r.getAs[Long]("n_alive"), r.getAs[Long]("n_edges"))).toMap
    assert(rows.keySet === Set(0L, 1L, 2L, 3L, 4L))
    // monotone non-increasing in both columns
    (1 to 4).foreach { r =>
      assert(rows(r.toLong)._1 <= rows(r - 1L)._1)
      assert(rows(r.toLong)._2 <= rows(r - 1L)._2)
    }
    // scalar replay of the same 4 peel rounds over the tiny sf0 graph
    var edges = ops.Insights.undirectedLinkEdges(spark, sf0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (1 to 4).foreach { r =>
      val deg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).view.mapValues(_.size).toMap
      val alive = deg.filter(_._2 >= 3).keySet
      edges = edges.filter(e => alive(e._1) && alive(e._2))
      assert(rows(r.toLong) === ((alive.size.toLong, edges.size.toLong)),
        s"round $r")
    }
  }

  // ---- q_curate_ablation ------------------------------------------------

  test("ablation: leave-one-out identity and curate_v2 consistency") {
    val ab = q("q_curate_ablation").collect()
      .map(r => r.getAs[String]("gate") -> r).toMap
    assert(ab.keySet === Set("exact", "semdedup", "dsir", "length"))
    val nKept = ab("exact").getAs[Long]("n_kept")
    ab.values.foreach { r =>
      // removing gate g admits exactly the docs failing ONLY g
      assert(r.getAs[Long]("n_kept_without") ===
        nKept + r.getAs[Long]("n_unique_fail"), r.getAs[String]("gate"))
      assert(r.getAs[Long]("n_unique_fail") <= r.getAs[Long]("n_fail"))
      assert(r.getAs[Long]("n_kept") === nKept)
    }
    // the funnel's final survivor count is the same program composed
    // in q_curate_v2 (cumulative flags) — cross-check totals
    val v2 = q("q_curate_v2").collect()
    assert(v2.map(_.getAs[Long]("n_kept")).sum === nKept)
    assert(v2.map(_.getAs[Long]("n_docs")).sum ===
      ab("exact").getAs[Long]("n_docs"))
  }

  // ---- q_mix_doremi -----------------------------------------------------

  test("doremi: weights normalize, excess is non-negative and " +
    "monotone into weights") {
    val rows = q("q_mix_doremi").collect()
    val wsum = rows.map(_.getAs[Double]("weight")).sum
    assert(math.abs(wsum - 1.0) < 1e-4, s"weights sum to $wsum")
    rows.foreach { r =>
      assert(r.getAs[Double]("excess_bits") >= 0.0)
      assert(r.getAs[Double]("bits_gen") > 0.0)
      assert(r.getAs[Double]("bits_own") > 0.0)
    }
    val byExcess = rows.sortBy(_.getAs[Double]("excess_bits"))
      .map(_.getAs[Double]("weight"))
    assert(byExcess.zip(byExcess.tail).forall { case (a, b) => a <= b },
      "weight must be monotone in excess loss")
  }

  // ---- q_quality_kappa --------------------------------------------------

  test("kappa: cells partition the corpus and the closed form replays") {
    val r = q("q_quality_kappa").collect().head
    val Seq(n, a, b, c, d0) = Seq("n", "both_keep", "gopher_only",
      "nb_only", "both_drop").map(r.getAs[Long](_))
    assert(a + b + c + d0 === n)
    val po = (a + d0).toDouble / n
    val pe = ((a + b).toDouble * (a + c) + (c + d0).toDouble * (b + d0)) /
      (n.toDouble * n)
    val kappa = (po - pe) / (1.0 - pe)
    assert(math.abs(r.getAs[Double]("kappa") - kappa) < 1e-5)
    assert(r.getAs[Double]("kappa") <= 1.0)
  }

  // ---- q_text_langmix ---------------------------------------------------

  test("langmix: disjoint-vocab languages are clean, a blend flags mixed") {
    // each language fills its ENTIRE top-10 profile (10 distinct
    // tokens, each count >= 3) so the blend doc's count-1 foreign
    // tokens can never leak into a profile
    val en = (0 until 3).flatMap(i => Seq(
      (i.toLong, "house tree river cloud stone brook", "en", "s0"),
      (3L + i, "stone brook field hill lake shore", "en", "s0")))
    val fr = (10 until 13).flatMap(i => Seq(
      (i.toLong, "maison arbre fleuve nuage pierre bois", "fr", "s0"),
      (3L + i, "pierre bois champ colline lac rive", "fr", "s0")))
    val blend = Seq(
      (20L, "house tree river maison arbre fleuve", "en", "s0"))
    val docsDf = (en ++ fr ++ blend)
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val dir = fixtureDir("refine_langmix")("documents" -> docsDf)
    val got = q("q_text_langmix", dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(got(0L).getAs[String]("top1") === "en")
    assert(got(0L).getAs[Long]("mixed") === 0L)
    assert(got(10L).getAs[String]("top1") === "fr")
    assert(got(10L).getAs[Long]("mixed") === 0L)
    assert(got(20L).getAs[Long]("mixed") === 1L,
      "the half-and-half doc must flag mixed")
  }

  // ---- q_stats_benford / q_graph_assortativity --------------------------

  test("benford: probabilities partition; digits exact on planted rows") {
    val li = Seq(("A", 1.0, 0.0, 9.11), ("A", 1.0, 0.0, 95.0),
      ("A", 1.0, 0.0, 0.07), ("B", 1.0, 0.0, 850000.0))
      .toDF("l_returnflag", "l_quantity", "l_discount", "l_extendedprice")
    val dir = fixtureDir("refine_benford")("lineitem" -> li)
    val got = q("q_stats_benford", dir).collect()
      .map(r => r.getAs[Long]("d") -> r.getAs[Long]("n")).toMap
    // cents: 911 -> 9, 9500 -> 9, 7 -> 7, 85000000 -> 8
    assert(got === Map(7L -> 1L, 8L -> 1L, 9L -> 2L))
    val full = q("q_stats_benford").collect()
    assert(math.abs(full.map(_.getAs[Double]("obs_p")).sum - 1.0) < 1e-4)
    assert(full.map(_.getAs[Long]("d")).toSet.subsetOf((1L to 9L).toSet))
  }

  test("assortativity: bounded; star graph is perfectly disassortative") {
    val r = q("q_graph_assortativity").collect().head
    val v = r.getAs[Double]("assortativity")
    assert(v >= -1.0 && v <= 1.0)
    // scalar replay on the real sf0 link graph
    val edges = ops.Insights.undirectedLinkEdges(spark, sf0)
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    val deg = edges.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val pts = edges.flatMap(e =>
      Seq((deg(e._1), deg(e._2)), (deg(e._2), deg(e._1))))
    val m = pts.length.toDouble
    val sx = pts.map(_._1).sum.toDouble; val sy = pts.map(_._2).sum.toDouble
    val sxx = pts.map(p => p._1 * p._1).sum.toDouble
    val syy = pts.map(p => p._2 * p._2).sum.toDouble
    val sxy = pts.map(p => p._1 * p._2).sum.toDouble
    val expect = (m * sxy - sx * sy) /
      math.sqrt((m * sxx - sx * sx) * (m * syy - sy * sy))
    assert(math.abs(v - expect) < 1e-5)
  }

  // ---- q_sample_coreset -------------------------------------------------

  test("coreset: greedy farthest-point replay matches; radius contracts") {
    val got = q("q_sample_coreset").collect()
      .sortBy(_.getAs[Long]("round"))
    val vecs = Tables.t(spark, sf0, "embeddings").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Float]]("embedding").toArray)
      .sortBy(_._1)
    def d2q(a: Array[Float], b: Array[Float]): Long = {
      def dot(x: Array[Float], y: Array[Float]): Double = {
        var acc = 0.0; var i = 0
        while (i < math.min(x.length, y.length)) {
          acc += x(i).toDouble * y(i).toDouble; i += 1 }
        acc
      }
      math.floor((dot(a, a) + dot(b, b) - 2.0 * dot(a, b)) * 1e6 + 0.5)
        .toLong
    }
    var centers = Seq(vecs.head)
    var mind = vecs.map { case (id, v) => (id, d2q(v, centers.head._2)) }
    val replay = scala.collection.mutable.ListBuffer((0L, vecs.head._1))
    (1 to 7).foreach { r =>
      val (selId, selDq) = mind.maxBy { case (id, dq) => (dq, -id) }
      replay += ((r.toLong, selId))
      val selV = vecs.find(_._1 == selId).get._2
      assert(math.abs(got(r).getAs[Double]("radius_sq") - selDq / 1e6) < 1e-5,
        s"radius at round $r")
      mind = mind.map { case (id, dq) =>
        (id, math.min(dq, d2q(vecs.find(_._1 == id).get._2, selV))) }
    }
    assert(got.map(r => (r.getAs[Long]("round"),
      r.getAs[Long]("center_id"))).toSeq === replay.toSeq)
    // coverage radius is non-increasing (greedy k-center invariant)
    val radii = got.drop(1).map(_.getAs[Double]("radius_sq")).toSeq
    radii.sliding(2).foreach {
      case Seq(a, b) => assert(a >= b, s"radius grew: $radii")
      case _ => ()
    }
  }

  // ---- q_sim_mmr --------------------------------------------------------

  test("mmr: displaces the near-duplicate of the top pick in favor " +
    "of a diverse result") {
    // all four candidates equally relevant (cos = 0.85 to the query);
    // 1..3 are exact copies, 4 mirrors across the query axis so its
    // similarity to pick 1 is only ~0.445: MMR must rank it 2nd where
    // plain relevance would tie-break to the copy
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f), 0),       // query
      (1L, Seq(0.85f, 0.527f, 0.0f), 0),
      (2L, Seq(0.85f, 0.527f, 0.0f), 0),    // exact copy of 1
      (3L, Seq(0.85f, 0.527f, 0.0f), 0),    // exact copy of 1
      (4L, Seq(0.85f, -0.527f, 0.0f), 0))   // mirrored: diverse
      .toDF("vec_id", "embedding", "label")
    val dir = fixtureDir("refine_mmr")("embeddings" -> emb)
    val got = q("q_sim_mmr", dir).collect()
      .sortBy(_.getAs[Long]("rank"))
      .map(_.getAs[Long]("pick_id"))
    assert(got.head === 1L, s"rank 1 must be the most relevant: $got")
    assert(got(1) === 4L,
      s"rank 2 must be the DIVERSE vector, not a near-dup: $got")
    // plain relevance order would have been 1,2,3,4
  }

  // ---- q_embed_norms ----------------------------------------------------

  test("embed norms: stats match a scalar replay") {
    val rows = q("q_embed_norms").collect()
      .map(r => r.getAs[Int]("label") -> r).toMap
    val vecs = Tables.t(spark, sf0, "embeddings").collect()
      .map(r => (r.getAs[Int]("label"),
        r.getAs[scala.collection.Seq[Float]]("embedding")))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    vecs.foreach { case (label, vs) =>
      val nqs = vs.map { v =>
        val ss = v.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble)
        math.floor(math.sqrt(ss) * 1e6 + 0.5).toLong
      }
      val r = rows(label)
      assert(r.getAs[Long]("n_vecs") === vs.length.toLong)
      val mean = nqs.sum.toDouble / nqs.length
      assert(math.abs(r.getAs[Double]("mean_norm") - mean / 1e6) < 1e-5)
      assert(r.getAs[Long]("n_zero") === nqs.count(_ == 0L).toLong)
      assert(r.getAs[Long]("n_outlier") ===
        nqs.count(_ > 2.0 * mean).toLong)
    }
  }

  // ---- q_split_leakage --------------------------------------------------

  test("split leakage: matrix partitions the near-pair set, " +
    "cross-split rows flagged") {
    val rows = q("q_split_leakage").collect()
    val total = rows.map(_.getAs[Long]("n_pairs")).sum
    val nPairs = q("q_dedup_near").count()
    assert(total === nPairs, "matrix must partition ALL near-dup pairs")
    val splits = Set("train", "val", "test")
    rows.foreach { r =>
      val (a, b) = (r.getAs[String]("split_a"), r.getAs[String]("split_b"))
      assert(splits(a) && splits(b))
      assert(a <= b, "upper triangle only")
      assert(r.getAs[Long]("leaky") === (if (a == b) 0L else 1L))
    }
  }

  test("doremi rounds: refit mixture contracts the excess of the " +
    "upweighted domain; every round stays normalized") {
    val rep = (0 until 8).map(i =>
      (i.toLong, "spin spin spin spin spin spin spin spin", "en", "sX"))
    val div = (0 until 8).map(i =>
      (10L + i, s"varied passage number $i with changing words ${i * 7}",
        "en", "sY"))
    val docsDf = (rep ++ div).toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val dir = fixtureDir("refine_doremi_r")("documents" -> docsDf)
    val got = q("q_mix_doremi_rounds", dir).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    val sX = got("sX")
    // round 1 upweights the underserved domain...
    assert(sX.getAs[Double]("w1") > sX.getAs[Double]("w0"))
    // ...which pulls the refit mixture toward it, shrinking its excess
    assert(sX.getAs[Double]("excess_r2") < sX.getAs[Double]("excess_r1"),
      s"refit mixture must close the gap: $sX")
    Seq("w1", "w2").foreach { c =>
      val tot = got.values.map(_.getAs[Double](c)).sum
      assert(math.abs(tot - 1.0) < 1e-3, s"$c sums to $tot")
    }
  }

  test("doremi: a domain the mixture underserves gets upweighted") {
    // sX: tight repetitive phrasing its own model nails but the
    // general model (dominated by diverse sY text) scores poorly
    val rep = (0 until 8).map(i =>
      (i.toLong, "spin spin spin spin spin spin spin spin", "en", "sX"))
    val div = (0 until 8).map(i =>
      (10L + i, s"varied passage number $i with changing words ${i * 7}",
        "en", "sY"))
    val docsDf = (rep ++ div).toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val dir = fixtureDir("refine_doremi")("documents" -> docsDf)
    val got = q("q_mix_doremi", dir).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Double]("excess_bits"), r.getAs[Double]("weight"))).toMap
    assert(got("sX")._1 > got("sY")._1,
      s"repetitive domain should carry higher excess: $got")
    assert(got("sX")._2 > got("sY")._2, s"and the higher weight: $got")
  }

  test("kmv intersect: identical sources estimate containment 1, " +
    "planted 1/3 overlap lands in the sketch error band") {
    // sa: 100 docs; sb: 50 shared with sa + 50 of its own; sc: exact
    // copy of sa under another label → the merged sketch IS sa's
    val sa = (0 until 100).map(i =>
      (i.toLong, s"alpha passage token$i", "en", "sa"))
    val sb = (0 until 100).map { i =>
      val text = if (i < 50) s"alpha passage token${50 + i}"
        else s"beta passage token$i"
      (100L + i, text, "en", "sb")
    }
    val sc = (0 until 100).map(i =>
      (200L + i, s"alpha passage token$i", "en", "sc"))
    val docsDf = (sa ++ sb ++ sc).toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val dir = fixtureDir("refine_kmvint")("documents" -> docsDf)
    val got = q("q_agg_kmv_intersect", dir).collect()
      .map(r => (r.getAs[String]("sa"), r.getAs[String]("sb")) -> r).toMap
    // sa ≡ sc: every merged hash is shared; estimates coincide exactly
    val ac = got(("sa", "sc"))
    assert(ac.getAs[Long]("n_shared") === ac.getAs[Long]("k_used"))
    assert(ac.getAs[Double]("containment_a") === 1.0)
    assert(ac.getAs[Double]("containment_b") === 1.0)
    assert(ac.getAs[Double]("inter_est") === ac.getAs[Double]("union_est"))
    // sa vs sb: true |∪| = 150, |∩| = 50 — k = 64 sketch error band
    val ab = got(("sa", "sb"))
    val u = ab.getAs[Double]("union_est")
    val i = ab.getAs[Double]("inter_est")
    assert(u > 100 && u < 230, s"union_est $u vs true 150")
    assert(i > 15 && i < 100, s"inter_est $i vs true 50")
    assert(i <= u, "intersection estimate cannot exceed the union's")
    assert(ab.getAs[Double]("containment_a") > 0.15 &&
      ab.getAs[Double]("containment_a") < 0.9)
  }
  test("richclub: profile matches a scalar replay of the link graph") {
    val got = q("q_graph_richclub").collect()
      .map(r => r.getAs[Long]("k") ->
        (r.getAs[Long]("n_nodes"), r.getAs[Long]("n_edges"),
          Option(r.get(r.fieldIndex("phi_micro")))
            .map(_.asInstanceOf[Long]))).toMap
    val edges = ops.Insights.undirectedLinkEdges(spark, sf0)
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    val deg = edges.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    Seq(1L, 2L, 4L, 8L, 16L).foreach { k =>
      val nk = deg.count(_._2 > k).toLong
      val ek = edges.count(e =>
        math.min(deg(e._1), deg(e._2)) > k).toLong
      val (gn, ge, gp) = got(k)
      assert(gn === nk, s"k=$k nodes")
      assert(ge === ek, s"k=$k edges")
      if (nk >= 2)
        assert(gp === Some(1000000L * 2 * ek / (nk * (nk - 1))),
          s"k=$k phi")
      else assert(gp.isEmpty)
    }
  }
  test("knn profile: curve matches a scalar neighbour-degree replay") {
    val got = q("q_graph_knn_profile").collect()
      .map(r => r.getAs[Long]("k") ->
        (r.getAs[Long]("n_endpoints"), r.getAs[Long]("sum_nbr_deg"),
          r.getAs[Long]("knn_micro"))).toMap
    val edges = ops.Insights.undirectedLinkEdges(spark, sf0)
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    val deg = edges.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val sym = edges.flatMap(e => Seq((e._1, e._2), (e._2, e._1)))
    val byK = sym.groupBy(e => deg(e._1))
    assert(got.keySet === byK.keySet)
    byK.foreach { case (k, es) =>
      val sumNbr = es.map(e => deg(e._2)).sum
      assert(got(k) ===
        ((es.length.toLong, sumNbr, 1000000L * sumNbr / es.length)))
    }
  }

  test("genmeans: AM >= GM >= HM and every mean replays exactly") {
    val byType = Tables.t(spark, sf0, "events")
      .select(col("event_type"),
        floor(col("value") * 100 + 0.5).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .filter(_._2 > 0).groupBy(_._1)
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = SparkEntry.queries("q_agg_genmeans")(spark, sf0)
      .collect().map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n"), r.getAs[Double]("mean_arith"),
          r.getAs[Double]("mean_geom"), r.getAs[Double]("mean_harm")))
      .toMap
    byType.foreach { case (et, rows) =>
      val cs = rows.map(_._2)
      val n = cs.length
      val sln = cs.map(c =>
        math.floor(math.log(c.toDouble) * 1e9 + 0.5).toLong).sum
      val srec = cs.map(c => math.floor(1e12 / c + 0.5).toLong).sum
      val (gn, am, gm, hm) = got(et)
      assert(gn === n.toLong)
      assert(am === r6(cs.sum.toDouble / n / 100.0))
      assert(gm === r6(math.exp(sln.toDouble / 1e9 / n) / 100.0))
      assert(hm === r6(n.toDouble * 1e12 / srec.toDouble / 100.0))
      assert(am >= gm && gm >= hm, s"mean ordering for $et")
    }
  }
}

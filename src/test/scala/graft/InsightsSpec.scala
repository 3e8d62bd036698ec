package graft

import org.apache.spark.sql.functions._

/** Value + plan tests for the Insights tier (triangle census, posting
  * lists, linear interpolation) — scalar replays of the distributed
  * results plus the plan shapes the 100 TB story depends on. */
class InsightsSpec extends SparkSuite {

  test("triangles: census matches a scalar adjacency-set replay") {
    val row = q("q_graph_triangles").collect().head
    val ids = Tables.t(spark, sf0, "documents")
      .select(col("doc_id")).collect().map(_.getLong(0))
    val n = ids.length.toLong
    val und = ids.flatMap { s =>
      Seq(s / 2, (s * 31 + 17) % n, (s * s + 1) % n)
        .filter(_ != s).map(d => (math.min(s, d), math.max(s, d)))
    }.distinct
    val adj = und.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (v, es) => v -> es.map(_._2).toSet }
    val wedges = adj.values.map(s => s.size.toLong * (s.size - 1) / 2).sum
    val tris = und.map { case (a, b) =>
      (adj(a) & adj(b)).size.toLong
    }.sum / 3 // each triangle seen from all 3 of its edges
    assert(row.getAs[Long]("n_edges") === und.length.toLong)
    assert(row.getAs[Long]("n_wedges") === wedges)
    assert(row.getAs[Long]("n_triangles") === tris)
    assert(tris > 0, "derived graph must actually contain triangles")
  }

  test("triangles: both joins stay equi — no nested-loop on edge tables") {
    import org.apache.spark.sql.execution.joins.{
      BroadcastNestedLoopJoinExec, CartesianProductExec}
    val plan = q("q_graph_triangles").queryExecution.executedPlan
    // walk the plan TREE (cached InMemoryRelation subtrees are leaves —
    // the string form would multiply-count them under every consumer)
    assert(plan.collectWithSubqueries {
      case c: CartesianProductExec => c }.isEmpty,
      "wedge/closing joins must not degrade to cartesian")
    val nlj = plan.collectWithSubqueries {
      case b: BroadcastNestedLoopJoinExec => b }
    // the only NLJs allowed are the 1-row census attaches at the top
    assert(nlj.size <= 2, s"unexpected NLJ count ${nlj.size}")
  }

  test("postings: cap, df bound, and one term's scalar replay") {
    val rows = q("q_text_postings").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val posts = r.getAs[String]("postings").split(",")
      assert(posts.length <= 16)
      assert(r.getAs[Long]("df") >= 10)
      assert(r.getAs[Long]("df") >= posts.length.toLong)
      assert(r.getAs[Long]("tf_total") >= r.getAs[Long]("df"))
    }
    // scalar replay for the lexicographically first term
    val term = rows.map(_.getAs[String]("term")).min
    val docs = Tables.t(spark, sf0, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val tfs = docs.map { case (id, t) =>
      id -> t.split(" ", -1).count(_ == term)
    }.filter(_._2 > 0).sortBy(_._1)
    val want = tfs.take(16).map { case (id, tf) => s"$id:$tf" }
      .mkString(",")
    val got = rows.find(_.getAs[String]("term") == term).get
    assert(got.getAs[Long]("df") === tfs.length.toLong)
    assert(got.getAs[Long]("tf_total") === tfs.map(_._2.toLong).sum)
    assert(got.getAs[String]("postings") === want)
  }

  test("interpolate: obs preserved, interps strictly between neighbors") {
    val rows = q("q_ts_interpolate").collect()
      .map(r => (r.getLong(0), r.getAs[java.time.LocalDateTime]("h"),
        Option(r.get(2)).map(_.asInstanceOf[Double]),
        r.getAs[String]("kind")))
    assert(rows.exists(_._4 == "interp"), "test data must have gaps")
    assert(rows.exists(_._4 == "obs"))
    rows.filter(_._4 == "edge").foreach(r => assert(r._3.isEmpty))
    // per user: every interp value lies within [prev obs, next obs]
    rows.groupBy(_._1).foreach { case (_, tape0) =>
      val tape = tape0.sortBy(_._2.toString)
      var prevObs: Option[Double] = None
      val nextObsAt = tape.indices.map { i =>
        tape.drop(i).find(_._4 == "obs").flatMap(_._3)
      }
      tape.zipWithIndex.foreach { case ((_, _, v, kind), i) =>
        kind match {
          case "obs" => prevObs = v
          case "interp" =>
            val lo = math.min(prevObs.get, nextObsAt(i).get)
            val hi = math.max(prevObs.get, nextObsAt(i).get)
            assert(v.get >= lo - 1e-9 && v.get <= hi + 1e-9,
              s"interp ${v.get} outside [$lo, $hi]")
          case "edge" => ()
        }
      }
    }
    // a 2-wide gap interpolates to exact thirds of the segment
    val grouped = rows.groupBy(_._1)
    val found = grouped.values.flatMap { tape0 =>
      val tape = tape0.sortBy(_._2.toString).toSeq
      tape.sliding(4).collect {
        case Seq((_, _, Some(a), "obs"), (_, _, Some(x), "interp"),
          (_, _, Some(y), "interp"), (_, _, Some(b), "obs")) =>
          (a, x, y, b)
      }
    }
    found.take(5).foreach { case (a, x, y, b) =>
      assert(math.abs(x - (a + (b - a) / 3.0)) < 1e-6)
      assert(math.abs(y - (a + 2.0 * (b - a) / 3.0)) < 1e-6)
    }
  }

  test("pca: unit loading vector, positive eigenvalue, and dominance") {
    val rows = q("q_embed_pca").collect()
      .map(r => (r.getAs[Long]("dim"), r.getAs[Double]("loading"),
        r.getAs[Double]("eigenvalue")))
    assert(rows.length === 64)
    val norm = math.sqrt(rows.map(r => r._2 * r._2).sum)
    assert(math.abs(norm - 1.0) < 1e-4, s"loadings not unit: $norm")
    val eig = rows.head._3
    assert(eig > 0)
    // the captured variance must dominate the per-dim average variance
    // (otherwise power iteration found nothing — v is still noise)
    val pos = Tables.t(spark, sf0, "embeddings")
      .select(posexplode(col("embedding")).as(Seq("dim", "x")))
      .groupBy(col("dim")).agg(var_pop(col("x")).as("v"))
      .collect().map(_.getAs[Double]("v"))
    val avgVar = pos.sum / pos.length
    assert(eig > avgVar,
      s"top eigenvalue $eig should exceed mean per-dim variance $avgVar")
  }

  test("pca: distributed v3 equals a scalar replay; Rayleigh ascends") {
    // the embeddings are near-isotropic (λ2/λ1 ≈ 0.93 at sf0.001), so
    // successive iterates move for many rounds — convergence SPEED is a
    // data property, not an implementation one. What the engine must
    // get exactly right: the 3-round rounded iteration itself (parity
    // with a scalar replay) and the power-iteration invariant that the
    // Rayleigh quotient never decreases round over round.
    val v3 = q("q_embed_pca").collect()
      .map(r => (r.getAs[Long]("dim"), r.getAs[Double]("loading")))
      .sortBy(_._1).map(_._2)
    val X = Tables.t(spark, sf0, "embeddings")
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val d = X.head.length
    val mu = Array.tabulate(d)(j =>
      math.rint(X.map(_(j)).sum / X.length * 1e6) / 1e6)
    // quantized covariance, exactly as the operator builds it: each
    // centered product floored to 1e-9 before the integer sum, the sum
    // normalized by n afterwards
    val C = Array.tabulate(d, d) { (i, j) =>
      X.map(row => math.floor(
        (row(i) - mu(i)) * (row(j) - mu(j)) * 1e9 + 0.5).toLong)
        .sum.toDouble / 1e9 / X.length
    }
    var v = Array.fill(d)(0.125)
    val rayleigh = scala.collection.mutable.ArrayBuffer[Double]()
    for (_ <- 0 until 3) {
      val vr = Array.tabulate(d)(i =>
        (0 until d).map(j =>
          math.floor(C(i)(j) * v(j) * 1e12 + 0.5).toLong)
          .sum.toDouble / 1e12)
      val n = math.sqrt(vr.map(x =>
        math.floor(x * x * 1e12 + 0.5).toLong).sum.toDouble / 1e12)
      v = vr.map(x => math.rint(x / n * 1e6) / 1e6)
      rayleigh += (0 until d).map(i =>
        (0 until d).map(j => C(i)(j) * v(j)).sum * v(i)).sum
    }
    val cos = v3.zip(v).map { case (a, b) => a * b }.sum
    assert(math.abs(cos) > 1.0 - 1e-5,
      s"distributed v3 vs scalar replay cosine $cos — implementations drifted")
    rayleigh.toList.sliding(2).foreach {
      case List(a, b) =>
        assert(b >= a - 1e-9, s"Rayleigh quotient fell: $a -> $b")
      case _ => ()
    }
  }

  test("collocations: pmi matches a scalar count replay") {
    val rows = q("q_text_collocations").collect()
    assert(rows.length === 30)
    val texts = Tables.t(spark, sf0, "documents")
      .select(col("text")).collect().map(_.getString(0).split(" ", -1))
    val uni = scala.collection.mutable.Map[String, Long]()
    val big = scala.collection.mutable.Map[(String, String), Long]()
    texts.foreach { ts =>
      ts.foreach(w => uni(w) = uni.getOrElse(w, 0L) + 1)
      ts.sliding(2).foreach {
        case Array(a, b) =>
          big((a, b)) = big.getOrElse((a, b), 0L) + 1
        case _ => ()
      }
    }
    val nUni = uni.values.sum.toDouble
    val kept = big.filter(_._2 >= 5)
    val nBig = kept.values.sum.toDouble
    rows.foreach { r =>
      val (w1, w2) = (r.getAs[String]("w1"), r.getAs[String]("w2"))
      val c12 = kept((w1, w2))
      assert(r.getAs[Long]("c12") === c12)
      val pmi = math.log((c12 / nBig) /
        ((uni(w1) / nUni) * (uni(w2) / nUni))) / math.log(2.0)
      assert(math.abs(r.getAs[Double]("pmi") - pmi) < 1e-5)
    }
    // top-30 is really the top: every kept bigram NOT in the output has
    // pmi <= the smallest emitted pmi (modulo the rounded tie cut)
    val minOut = rows.map(_.getAs[Double]("pmi")).min
    val outSet = rows.map(r =>
      (r.getAs[String]("w1"), r.getAs[String]("w2"))).toSet
    kept.keys.filterNot(outSet).foreach { case (a, b) =>
      val pmi = math.log((kept((a, b)) / nBig) /
        ((uni(a) / nUni) * (uni(b) / nUni))) / math.log(2.0)
      assert(pmi <= minOut + 1e-6)
    }
  }

  test("corr matrix: 2080 cells, unit diagonal, bounded, replay-checked") {
    val rows = q("q_corr_matrix").collect()
      .map(r => ((r.getAs[Long]("i"), r.getAs[Long]("j")),
        r.getAs[Double]("corr"))).toMap
    assert(rows.size === 64 * 65 / 2)
    rows.foreach { case ((i, j), c) =>
      assert(i <= j)
      assert(c >= -1.0 - 1e-6 && c <= 1.0 + 1e-6, s"corr($i,$j)=$c")
    }
    (0L until 64L).foreach { i =>
      assert(math.abs(rows((i, i)) - 1.0) < 1e-4,
        s"diagonal corr($i,$i)=${rows((i, i))}")
    }
    // scalar replay of three off-diagonal cells
    val X = Tables.t(spark, sf0, "embeddings")
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val n = X.length
    def cell(i: Int, j: Int): Double = {
      val (xi, xj) = (X.map(_(i)), X.map(_(j)))
      val (mi, mj) = (xi.sum / n, xj.sum / n)
      val sxy = xi.zip(xj).map { case (a, b) => a * b }.sum / n - mi * mj
      val si = math.sqrt(xi.map(a => a * a).sum / n - mi * mi)
      val sj = math.sqrt(xj.map(a => a * a).sum / n - mj * mj)
      sxy / (si * sj)
    }
    Seq((0, 1), (5, 40), (12, 63)).foreach { case (i, j) =>
      assert(math.abs(rows((i.toLong, j.toLong)) - cell(i, j)) < 1e-3,
        s"cell($i,$j) drifted from replay")
    }
  }

  test("interval join: bucketed equi-join equals a direct theta replay") {
    import org.apache.spark.sql.execution.joins.{
      BroadcastNestedLoopJoinExec, CartesianProductExec}
    val plan = q("q_join_interval").queryExecution.executedPlan
    assert(plan.collectWithSubqueries {
      case c: CartesianProductExec => c }.isEmpty)
    assert(plan.collectWithSubqueries {
      case b: BroadcastNestedLoopJoinExec => b }.isEmpty,
      "the bucketed overlap join must stay a compound-key equi-join")
    val got = q("q_join_interval").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    // direct theta replay over the collected tape
    val usDay = 86400000000L
    val evs = Tables.t(spark, sf0, "events")
      .selectExpr("user_id", "event_id",
        "unix_micros(CAST(ts AS TIMESTAMP)) AS us", "value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val act = evs.groupBy(e => (e._1, e._3 / usDay)).map {
      case ((u, day), es) => (u, day, es.map(_._3).min, es.map(_._3).max)
    }
    val inc = evs.filter(_._4 > 99).map(e =>
      (e._1, e._2, e._3 - 7200000000L, e._3 + 7200000000L))
    val want = (for {
      (u, day, s0, s1) <- act
      (iu, id, i0, i1) <- inc
      if u == iu && s0 <= i1 && i0 <= s1
    } yield (u, day, id) -> (math.min(s1, i1) - math.max(s0, i0))).toMap
    assert(got === want)
    assert(got.nonEmpty)
    assert(got.values.forall(_ >= 0), "overlap durations are non-negative")
  }

  test("degree dist: accounts for every edge endpoint exactly twice") {
    val rows = q("q_graph_degree_dist").collect()
      .map(r => r.getAs[Long]("deg") -> r.getAs[Long]("n_nodes"))
    val census = q("q_graph_triangles").collect().head
    assert(rows.map { case (d, n) => d * n }.sum ===
      2 * census.getAs[Long]("n_edges"),
      "sum of degrees must equal twice the edge count")
    assert(rows.forall(_._1 >= 1))
    // wedge cross-check against the census row
    assert(rows.map { case (d, n) => n * d * (d - 1) / 2 }.sum ===
      census.getAs[Long]("n_wedges"))
  }

  test("bfs: per-level census matches a scalar adjacency BFS replay") {
    val got = q("q_graph_bfs").collect()
      .map(r => r.getAs[Long]("dist") -> r.getAs[Long]("n_nodes")).toMap
    // scalar replay: rebuild the deterministic link graph and BFS it
    val n = Tables.t(spark, sf0, "documents").count()
    val adj = scala.collection.mutable.Map[Long, Set[Long]]()
      .withDefaultValue(Set.empty)
    (0L until n).foreach { src =>
      Seq(src / 2, (src * 31 + 17) % n, (src * src + 1) % n)
        .filter(_ != src).foreach { dst =>
          adj(src) = adj(src) + dst; adj(dst) = adj(dst) + src
        }
    }
    val dist = scala.collection.mutable.Map(0L -> 0L)
    var frontier = Set(0L)
    var lvl = 0L
    while (frontier.nonEmpty) {
      lvl += 1
      frontier = frontier.flatMap(adj)
        .filterNot(dist.contains)
      frontier.foreach(v => dist(v) = lvl)
    }
    val expect = dist.values.groupBy(identity)
      .map { case (k, v) => k -> v.size.toLong }
    assert(got === expect)
  }

  test("linreg recovers planted coefficients with r2 = 1") {
    import spark.implicits._
    // exact linear data in raw units: price = 1000 + 300*qty - 40000*disc;
    // the operator scales (qty/100, price/1e5), so the fitted scaled
    // coefficients are b0 = 0.01, b1 = 0.3, b2 = -0.4
    val rows = (1 to 200).map { i =>
      val qty = (i % 50).toDouble
      val disc = (i % 7) * 0.01
      (qty, disc, 1000.0 + 300.0 * qty - 40000.0 * disc)
    }
    val li = rows.toDF("l_quantity", "l_discount", "l_extendedprice")
    val dir = fixtureDir("linreg")("lineitem" -> li)
    val r = q("q_ml_linreg", dir).collect()(0)
    assert(r.getAs[Long]("n") === 200L)
    assert(math.abs(r.getAs[Double]("b0") - 0.01) < 1e-3)
    assert(math.abs(r.getAs[Double]("b1") - 0.3) < 1e-3)
    assert(math.abs(r.getAs[Double]("b2") + 0.4) < 1e-3)
    // the 4dp stat snap costs ~3e-5 of r2 on a 200-row fixture
    assert(r.getAs[Double]("r2") > 0.9999)
  }

  test("t-test: planted mean shift is detected with the right sign") {
    import spark.implicits._
    import java.sql.Timestamp
    // group "hot" ~ mean 60, everything else ~ mean 50, same spread
    val rows = (1 to 300).map { i =>
      val g = if (i % 3 == 0) "hot" else if (i % 3 == 1) "a" else "b"
      val base = if (g == "hot") 60.0 else 50.0
      (i.toLong, Timestamp.valueOf("2024-01-01 00:00:00"), i.toLong % 7,
        g, base + (i % 11) - 5.0, "{}")
    }
    val ev = rows.toDF("event_id", "ts", "user_id", "event_type",
      "value", "props")
    val dir = fixtureDir("stats_t")("events" -> ev)
    val got = q("q_stats_ttest", dir).collect()
      .map(r => r.getAs[String]("event_type") ->
        r.getAs[Double]("t_stat")).toMap
    assert(got("hot") > 10.0, s"shifted group must test high: $got")
    assert(got("a") < 0.0 && got("b") < 0.0,
      "unshifted groups sit below the pooled rest (which includes hot)")
  }

  test("chi-squared: independent grid tests ~0, dependent grid high") {
    import spark.implicits._
    def docs(dep: Boolean) = (0 until 400).map { i =>
      val lang = s"l${i % 4}"
      val source = if (dep) s"s${i % 4}" else s"s${(i / 4) % 5}"
      (i.toLong, s"text $i", lang, source, 6L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val indep = q("q_stats_chisq",
      fixtureDir("chisq_ind")("documents" -> docs(false))).collect()(0)
    assert(indep.getAs[Double]("chi2") < 1e-6,
      s"balanced grid must test independent: $indep")
    assert(indep.getAs[Long]("df") === 12L) // (4-1)*(5-1)
    val dep = q("q_stats_chisq",
      fixtureDir("chisq_dep")("documents" -> docs(true))).collect()(0)
    // lang fully determines source → chi2 = n*(min(R,C)-1) = 1200
    assert(math.abs(dep.getAs[Double]("chi2") - 1200.0) < 1e-6, s"$dep")
  }

  test("heaps: cumulative curves are monotone and end at corpus totals") {
    val rows = q("q_text_heaps").collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("tokens_cum"),
        r.getAs[Long]("vocab_cum"))).sortBy(_._1)
    assert(rows.length === 20)
    rows.sliding(2).foreach {
      case Array((_, t0, v0), (_, t1, v1)) =>
        assert(t1 >= t0); assert(v1 >= v0)
      case _ => ()
    }
    val texts = Tables.t(spark, sf0, "documents")
      .select(col("text")).collect().map(_.getString(0))
    val allToks = texts.flatMap(_.split(" ", -1))
    assert(rows.last._2 === allToks.length.toLong)
    assert(rows.last._3 === allToks.distinct.length.toLong)
  }

  test("anomaly: flags match a scalar rolling-window replay") {
    val flagged = q("q_ts_anomaly").collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Double]("z")).toMap
    val evs = Tables.t(spark, sf0, "events")
      .selectExpr("event_id", "user_id",
        "unix_micros(CAST(ts AS TIMESTAMP)) AS us", "value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val replay = scala.collection.mutable.Map[Long, Double]()
    evs.groupBy(_._2).foreach { case (_, tape0) =>
      val tape = tape0.sortBy(t => (t._3, t._1))
      tape.indices.foreach { i =>
        val frame = tape.slice(math.max(0, i - 100), i).map(_._4)
        if (frame.length >= 20) {
          val mu = math.rint(frame.sum / frame.length * 1e6) / 1e6
          val mean = frame.sum / frame.length
          val sd = math.rint(math.sqrt(
            frame.map(x => (x - mean) * (x - mean)).sum /
              (frame.length - 1)) * 1e6) / 1e6
          if (sd > 0) {
            val z = math.rint((tape(i)._4 - mu) / sd * 100) / 100
            if (math.abs(z) > 3.0) replay(tape(i)._1) = z
          }
        }
      }
    }
    assert(flagged.keySet === replay.keySet)
    flagged.foreach { case (id, z) =>
      assert(math.abs(z - replay(id)) < 1e-9) }
    assert(flagged.nonEmpty, "tape should contain at least one outlier")
  }

  test("KS statistic matches an exact driver-side recomputation") {
    val r = q("q_stats_ks").collect()(0)
    val rows = Tables.t(spark, sf0, "events")
      .filter(col("event_type").isin("click", "error"))
      .select(col("event_type"), col("value")).collect()
      .map(x => (x.getString(0), math.floor(x.getDouble(1) * 100 + 0.5).toLong))
    val a = rows.filter(_._1 == "click").map(_._2).sorted
    val b = rows.filter(_._1 == "error").map(_._2).sorted
    val (n1, n2) = (a.length.toLong, b.length.toLong)
    val thresholds = (a ++ b).distinct.sorted
    var best = 0L
    thresholds.foreach { v =>
      val ca = a.count(_ <= v).toLong
      val cb = b.count(_ <= v).toLong
      val diff = math.abs(ca * n2 - cb * n1)
      if (diff > best) best = diff
    }
    assert(r.getAs[Long]("n1") === n1)
    assert(r.getAs[Long]("n2") === n2)
    val want = BigDecimal(best.toDouble / (n1 * n2))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("d_stat") === want)
  }

  test("Mann-Whitney U matches an exact driver-side recomputation") {
    val r = q("q_stats_mannwhitney").collect()(0)
    val rows = Tables.t(spark, sf0, "events")
      .filter(col("event_type").isin("purchase", "error"))
      .select(col("event_type"), col("value")).collect()
      .map(x => (x.getString(0),
        math.floor(x.getDouble(1) * 100 + 0.5).toLong))
    val all = rows.map(_._2).sorted
    // average rank per value over the pooled sample (1-based)
    val rankOf = all.zipWithIndex.groupBy(_._1)
      .map { case (v, xs) =>
        v -> xs.map(_._2 + 1).sum.toDouble / xs.length }
    val g1 = rows.filter(_._1 == "purchase").map(_._2)
    val n1 = g1.length.toLong
    val n2 = rows.length - n1
    val r1 = g1.map(rankOf).sum
    val u1 = r1 - n1 * (n1 + 1) / 2.0
    assert(r.getAs[Long]("n1") === n1)
    assert(r.getAs[Long]("n2") === n2)
    assert(r.getAs[Double]("u1") === u1)
    // z located in the two-sided normal range for same-generator draws
    val z = r.getAs[Double]("z")
    assert(math.abs(z) < 6.0, s"implausible z $z")
  }

  test("label propagation census conserves node count") {
    val rows = q("q_graph_labelprop").collect()
    val nodes = rows.map(r => r.getAs[Long]("community_size") *
      r.getAs[Long]("n_communities")).sum
    assert(nodes === Tables.t(spark, sf0, "documents").count())
    // propagation must have merged communities: fewer than n singletons
    val nComms = rows.map(_.getAs[Long]("n_communities")).sum
    assert(nComms < nodes)
  }

  test("Jaccard similarities are valid ratios and sorted descending") {
    val rows = q("q_graph_jaccard").collect()
    assert(rows.length === 20)
    val js = rows.map(_.getAs[Double]("jaccard"))
    assert(js.forall(j => j > 0.0 && j <= 1.0))
    assert(js.sliding(2).forall { case Array(x, y) => x >= y })
    rows.foreach { r =>
      assert(r.getAs[Long]("a") < r.getAs[Long]("b"))
      assert(r.getAs[Long]("common") >= 1L)
    }
  }

  test("conductance: per-community cut ratios match a scalar replay") {
    val got = SparkEntry.queries("q_graph_conductance")(spark, sf0)
      .collect()
      .map(r => r.getAs[Long]("lbl") ->
        (r.getAs[Long]("n_nodes"), r.getAs[Long]("vol"),
          r.getAs[Long]("cut"), r.getAs[Double]("conductance")))
      .toMap
    val lbl = ops.Insights.labelPropLabels(spark, sf0).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("lbl")).toMap
    val und = ops.Insights.undirectedLinkEdges(spark, sf0).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")))
    val volTotal = 2L * und.length
    val deg = scala.collection.mutable.Map[Long, Long]()
      .withDefaultValue(0L)
    und.foreach { case (a, b) => deg(a) += 1; deg(b) += 1 }
    val vol = deg.toSeq.groupBy(x => lbl(x._1)).view
      .mapValues(_.map(_._2).sum).toMap
    val nNodes = lbl.toSeq.groupBy(_._2).view
      .mapValues(_.size.toLong).toMap
    val cut = scala.collection.mutable.Map[Long, Long]()
      .withDefaultValue(0L)
    und.foreach { case (a, b) =>
      if (lbl(a) != lbl(b)) { cut(lbl(a)) += 1; cut(lbl(b)) += 1 }
    }
    got.foreach { case (c, (gn, gv, gc, gphi)) =>
      assert(gn === nNodes(c))
      assert(gv === vol(c))
      assert(gc === cut(c))
      val mn = math.min(vol(c), volTotal - vol(c))
      if (mn > 0)
        assert(math.abs(gphi - (1000000L * cut(c) / mn) / 1e6) < 1e-9)
    }
    // top-10 by size really are the largest communities
    val minN = got.values.map(_._1).min
    assert(nNodes.values.count(_ > minN) <= 10)
  }

  test("ml_ridge: shrunk slopes match a scalar Cramer replay") {
    val row = SparkEntry.queries("q_ml_ridge")(spark, sf0)
      .collect().head
    val rows = Tables.t(spark, sf0, "lineitem")
      .select((col("l_quantity") / 100.0), col("l_discount"),
        (col("l_extendedprice") / 100000.0))
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))
    def snap4(x: Double): Double = math.floor(x * 1e4 + 0.5) / 1e4
    val n = rows.length.toDouble
    val sx1 = snap4(rows.map(_._1).sum); val sx2 = snap4(rows.map(_._2).sum)
    val sy = snap4(rows.map(_._3).sum)
    val sx1x1 = snap4(rows.map(r => r._1 * r._1).sum)
    val sx1x2 = snap4(rows.map(r => r._1 * r._2).sum)
    val sx2x2 = snap4(rows.map(r => r._2 * r._2).sum)
    val sx1y = snap4(rows.map(r => r._1 * r._3).sum)
    val sx2y = snap4(rows.map(r => r._2 * r._3).sum)
    val la = sx1x1 + 0.1; val lb = sx2x2 + 0.1
    val det = n * (la * lb - sx1x2 * sx1x2) -
      sx1 * (sx1 * lb - sx1x2 * sx2) + sx2 * (sx1 * sx1x2 - la * sx2)
    val b1 = (n * (sx1y * lb - sx2y * sx1x2) -
      sy * (sx1 * lb - sx1x2 * sx2) +
      sx2 * (sx1 * sx2y - sx1y * sx2)) / det
    val odet = n * (sx1x1 * sx2x2 - sx1x2 * sx1x2) -
      sx1 * (sx1 * sx2x2 - sx1x2 * sx2) +
      sx2 * (sx1 * sx1x2 - sx1x1 * sx2)
    val ob1 = (n * (sx1y * sx2x2 - sx2y * sx1x2) -
      sy * (sx1 * sx2x2 - sx1x2 * sx2) +
      sx2 * (sx1 * sx2y - sx1y * sx2)) / odet
    assert(math.abs(row.getAs[Double]("b1") - b1) < 1e-4)
    assert(math.abs(row.getAs[Double]("ols_b1") - ob1) < 1e-4)
    // ridge shrinks the slope magnitude relative to OLS
    assert(math.abs(b1) <= math.abs(ob1) + 1e-9)
  }

  test("core_members: peel-depth census matches a scalar peel replay") {
    val got = SparkEntry.queries("q_graph_core_members")(spark, sf0)
      .collect()
      .map(r => r.getAs[Long]("peel_depth") -> r.getAs[Long]("n_nodes"))
      .toMap
    val n = Tables.t(spark, sf0, "documents").count()
    var edges = (0L until n).flatMap { src =>
      Seq(src / 2, (src * 31 + 17) % n, (src * src + 1) % n)
        .filter(_ != src).map(dst => (math.min(src, dst),
          math.max(src, dst)))
    }.distinct
    val depth = scala.collection.mutable.Map[Long, Long]()
    edges.flatMap(e => Seq(e._1, e._2)).distinct
      .foreach(v => depth(v) = 0L)
    for (r <- 1 to 4) {
      val deg = scala.collection.mutable.Map[Long, Long]()
        .withDefaultValue(0L)
      edges.foreach { case (a, b) => deg(a) += 1; deg(b) += 1 }
      val alive = deg.filter(_._2 >= 5).keySet
      alive.foreach(v => depth(v) = r.toLong)
      edges = edges.filter(e => alive(e._1) && alive(e._2))
    }
    val want = depth.values.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    assert(got === want)
  }

  /** Scalar adjacency of the derived link graph at sf0.001. */
  private def linkAdj(): Map[Long, Set[Long]] = {
    val n = Tables.t(spark, sf0, "documents").count()
    val edges = (0L until n).flatMap { src =>
      Seq(src / 2, (src * 31 + 17) % n, (src * src + 1) % n)
        .filter(_ != src).map(dst => (math.min(src, dst),
          math.max(src, dst)))
    }.distinct
    edges.flatMap(e => Seq(e._1 -> e._2, e._2 -> e._1))
      .groupBy(_._1).map { case (v, ns) => v -> ns.map(_._2).toSet }
  }

  test("clustcoef: degree-bucketed mean cc matches a scalar replay") {
    val adj = linkAdj()
    val perDeg = adj.toSeq
      .filter(_._2.size >= 2)
      .map { case (v, ns) =>
        val deg = ns.size.toLong
        val tri = ns.toSeq.flatMap(a =>
          ns.toSeq.filter(b => a < b && adj(a)(b))).size.toLong
        (deg, tri, 2000000L * tri / (deg * (deg - 1)))
      }
      .groupBy(_._1)
    val got = q("q_graph_clustcoef").collect()
    assert(got.map(_.getAs[Long]("deg")).toSet === perDeg.keySet)
    got.foreach { r =>
      val rows = perDeg(r.getAs[Long]("deg"))
      assert(r.getAs[Long]("n_nodes") === rows.size.toLong)
      assert(r.getAs[Long]("n_triangles") === rows.map(_._2).sum)
      val want = BigDecimal(rows.map(_._3).sum.toDouble / rows.size / 1e6)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getAs[Double]("mean_cc") === want,
        s"deg=${r.getAs[Long]("deg")}")
    }
  }

  test("adamic_adar: pairs are unlinked and the top score replays") {
    val adj = linkAdj()
    val got = q("q_graph_adamic_adar").collect()
    assert(got.length === 20)
    def w(c: Long): Long =
      math.floor(1e6 / math.log(adj(c).size.toDouble) + 0.5).toLong
    got.foreach { r =>
      val (a, b) = (r.getAs[Long]("a"), r.getAs[Long]("b"))
      assert(a < b && !adj(a)(b), s"($a,$b) must be a non-edge")
      val commons = adj(a).intersect(adj(b))
        .filter(c => adj(c).size >= 2 && adj(c).size <= 64)
      assert(r.getAs[Long]("common") === commons.size.toLong)
      assert(r.getAs[Long]("aa_micro") === commons.toSeq.map(w).sum)
    }
    // descending by score with (a, b) tie-break
    val keys = got.map(r => (-r.getAs[Long]("aa_micro"),
      r.getAs[Long]("a"), r.getAs[Long]("b"))).toSeq
    assert(keys === keys.sorted)
  }

  test("reciprocity: directed closure replays against the generator") {
    val n = Tables.t(spark, sf0, "documents").count()
    val directed = (0L until n).flatMap { src =>
      Seq(src / 2, (src * 31 + 17) % n, (src * src + 1) % n)
        .filter(_ != src).map(dst => (src, dst))
    }.distinct
    val dset = directed.toSet
    val nrec = directed.count { case (a, b) => dset((b, a)) }
    val row = q("q_graph_reciprocity").collect().head
    assert(row.getAs[Long]("n_directed") === directed.length.toLong)
    assert(row.getAs[Long]("n_reciprocal") === nrec.toLong)
    val want = BigDecimal(nrec.toDouble / directed.length)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(row.getAs[Double]("reciprocity") === want)
  }

  test("nmi: community/source mutual information replays exactly") {
    val labels = ops.Insights.labelPropLabels(spark, sf0).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("lbl")).toMap
    val srcs = Tables.t(spark, sf0, "documents")
      .select(col("doc_id"), col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val cells = srcs.toSeq.map { case (id, src) => (labels(id), src) }
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
    val nn = cells.map(_._2).sum
    val ai = cells.groupBy(_._1._1).view.mapValues(_.map(_._2).sum)
    val bj = cells.groupBy(_._1._2).view.mapValues(_.map(_._2).sum)
    def q9(x: Double) = math.floor(x * 1e9 + 0.5).toLong
    val mi = cells.map { case ((l, sCat), n) =>
      q9(n.toDouble / nn * math.log(n.toDouble * nn /
        (ai(l).toDouble * bj(sCat))))
    }.sum
    val hx = ai.values.map(a =>
      q9(-(a.toDouble / nn) * math.log(a.toDouble / nn))).sum
    val hy = bj.values.map(b =>
      q9(-(b.toDouble / nn) * math.log(b.toDouble / nn))).sum
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val row = q("q_graph_nmi").collect().head
    assert(row.getAs[Long]("n_comm") === ai.size.toLong)
    assert(row.getAs[Long]("n_src") === bj.size.toLong)
    assert(row.getAs[Double]("mi_nats") === r6(mi.toDouble / 1e9))
    assert(row.getAs[Double]("h_comm") === r6(hx.toDouble / 1e9))
    assert(row.getAs[Double]("h_src") === r6(hy.toDouble / 1e9))
    val nmi = row.getAs[Double]("nmi")
    assert(nmi === r6(2.0 * mi / (hx.toDouble + hy)))
    assert(nmi >= -1e-6 && nmi <= 1.0 + 1e-6)
  }
}

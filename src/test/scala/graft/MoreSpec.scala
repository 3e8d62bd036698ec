package graft

import org.apache.spark.sql.functions._

/** Invariants for the completion-sweep operators (ops/More.scala) and
  * the dedup drop-list action. */
class MoreSpec extends SparkSuite {

  test("pivot row sums equal per-user event counts") {
    val pivoted = q("q_pivot").collect()
    val totals = Tables.t(spark, sf0, "events")
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("n"))
      .toMap
    pivoted.foreach { r =>
      val sum = Seq("click", "error", "purchase", "signup", "view")
        .map(c => r.getAs[Long](c)).sum
      assert(sum === totals(r.getAs[Long]("user_id")))
    }
  }

  test("unpivot emits exactly 3 stats per user, min <= avg <= max") {
    val rows = q("q_unpivot").collect()
      .groupBy(_.getAs[Long]("user_id"))
    rows.foreach { case (_, rs) =>
      val m = rs.map(r => r.getAs[String]("stat") -> r.getAs[Double]("v"))
        .toMap
      assert(m.size === 3)
      assert(m("min") <= m("avg") + 1e-9 && m("avg") <= m("max") + 1e-9)
    }
  }

  test("full outer join covers every user exactly once") {
    val rows = q("q_join_full").collect()
    val users = rows.map(_.getAs[Long]("user_id"))
    assert(users.distinct.length === users.length)
    val clickUsers = Tables.t(spark, sf0, "events")
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id")).distinct().count()
    assert(rows.length.toLong === clickUsers)
  }

  test("cross join cardinality is |region| x |event types|") {
    assert(q("q_join_cross").count() === 5L * 5L)
  }

  test("quartiles partition each priority class near-evenly") {
    val byClass = q("q_win_ntile").collect()
      .groupBy(_.getAs[String]("o_orderpriority"))
    byClass.foreach { case (_, rs) =>
      val sizes = rs.groupBy(_.getAs[Long]("quartile")).values.map(_.size)
      assert(sizes.max - sizes.min <= 1)
    }
  }

  test("logprob scores are negative and bounded by vocabulary size") {
    val rows = q("q_text_logprob").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val mean = r.getAs[Double]("mean_logp")
      assert(mean < 0.0)
      assert(mean > -15.0) // ln(1/vocab-total) floor for this corpus
    }
  }

  test("frame sampling keeps only even frames with halved widths") {
    val rows = q("q_multimodal_frames").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("frame_idx") % 2 === 0L)
      assert(r.getAs[Long]("frame_idx") < r.getAs[Long]("n_frames"))
      val w = r.getAs[Long]("resized_w")
      assert(w >= 8L && w <= 72L)
    }
  }

  test("dedup drop-list is a strict subset and keeps at least one per pair") {
    // fixture with a planted near-duplicate (reuse DedupSpec's corpus shape)
    import spark.implicits._
    def mkText(seed: Int): String =
      (0 until 40).map(j => s"d${seed}w$j").mkString(" ")
    val docs = ((0 until 4).map(i => (i.toLong, mkText(i), "en", "s0")) ++
      Seq((100L, mkText(0), "en", "s0")))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val dir = fixtureDir("drop")("documents" -> docs)
    val dropped = q("q_dedup_drop", dir).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(dropped === Set(100L)) // the copy goes, the original stays
  }

  test("repetition signals: a looping doc scores high top-bigram fraction") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b a b", "en", "s0"),              // loop: "a b" 3 of 5
      (2L, "one two three four five six", "en", "s0")) // all distinct
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val dir = fixtureDir("rep")("documents" -> docs)
    val rep = q("q_text_repetition", dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("distinct_ratio"),
          r.getAs[Double]("top_bigram_frac"))).toMap
    assert(rep(1L)._2 === 0.6)      // 3 "a b" of 5 bigrams
    assert(rep(1L)._1 === 0.333333) // 2 distinct of 6 tokens
    assert(rep(2L)._1 === 1.0 && rep(2L)._2 === 0.2)
  }

  test("rep scrub: scalar keep-first trigram replay reproduces the counts") {
    // fixture with a known repeat + a short doc that can't form trigrams
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c a b c a b c", "en", "s0"), // "a b c" x3 (+ wraps)
      (2L, "x y", "en", "s0"),               // < 3 tokens: no trigrams
      (3L, "p q r s", "en", "s1"))           // all distinct
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val dir = fixtureDir("repscrub")("documents" -> docs)
    def replay(rows: Seq[(Long, String, String)]) =
      rows.groupBy(_._3).map { case (src, ds) =>
        val per = ds.map { case (_, text, _) =>
          val t = text.split(" ")
          val tris = (0 to t.length - 3)
            .map(i => t.slice(i, i + 3).mkString(" "))
          val cnts = tris.groupBy(identity).map(_._2.size)
          (t.length.toLong, tris.length.toLong,
            cnts.map(_ - 1).sum.toLong, cnts.exists(_ >= 2))
        }
        src -> (per.size.toLong, per.map(_._1).sum, per.map(_._2).sum,
          per.map(_._3).sum, per.count(_._4).toLong)
      }
    def check(dir: String, rows: Seq[(Long, String, String)]): Unit = {
      val exp = replay(rows)
      val got = q("q_text_rep_scrub", dir).collect().map(r =>
        r.getAs[String]("source") ->
          (r.getAs[Long]("n_docs"), r.getAs[Long]("tokens_before"),
            r.getAs[Long]("trigram_starts"),
            r.getAs[Long]("tokens_removed"),
            r.getAs[Long]("docs_affected"))).toMap
      assert(got === exp, s"scrub mismatch at $dir")
    }
    check(dir, docs.collect().toSeq.map(r =>
      (r.getLong(0), r.getString(1), r.getString(3))))
    check(sf0, Tables.t(spark, sf0, "documents")
      .select(col("doc_id"), col("text"), col("source")).collect().toSeq
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))))
  }

  test("sequence packing conserves tokens and respects contiguity") {
    val bins = q("q_text_pack").collect()
    val packed = bins.map(_.getAs[Long]("n_tokens")).sum
    val total = Tables.t(spark, sf0, "documents")
      .select(size(split(col("text"), " ")).cast("long").as("n"))
      .agg(sum(col("n"))).collect()(0).getLong(0)
    assert(packed === total) // every token lands in exactly one bin
    // bins are contiguous per lang: ids 0..max with no gaps
    bins.groupBy(_.getAs[String]("lang")).foreach { case (_, rows) =>
      val ids = rows.map(_.getAs[Long]("bin")).sorted
      assert(ids.toSeq === (0L until ids.length).toSeq)
    }
  }

  test("stratified sample keeps per-class rates, deterministically") {
    val sampled = q("q_sample_stratified").collect()
      .map(r => r.getAs[String]("event_type") ->
        r.getAs[Long]("n_sampled")).toMap
    val totals = Tables.t(spark, sf0, "events")
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getAs[String]("event_type") ->
        r.getAs[Long]("n")).toMap
    // md5-bucket rates: purchase 50%, click 10%, rest 5% (±6pp at sf0.001)
    def rate(t: String): Double = sampled(t).toDouble / totals(t)
    assert(math.abs(rate("purchase") - 0.50) < 0.06, rate("purchase"))
    assert(math.abs(rate("click") - 0.10) < 0.06, rate("click"))
    assert(math.abs(rate("view") - 0.05) < 0.06, rate("view"))
    // row-local hash ⇒ rerun is identical
    val again = q("q_sample_stratified").collect()
      .map(r => r.getAs[String]("event_type") ->
        r.getAs[Long]("n_sampled")).toMap
    assert(again === sampled)
  }

  test("Neyman allocation: both apportionments exhaust the 1000 budget") {
    val rows = q("q_sample_neyman").collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("n_neyman")).sum === 1000L)
    assert(rows.map(_.getAs[Long]("n_prop")).sum === 1000L)
    rows.foreach { r =>
      assert(r.getAs[Double]("sigma") > 0.0)
      // no stratum can be allocated more than the whole budget, and
      // the optimal allocation tracks N_h*sigma_h ordering
      assert(r.getAs[Long]("n_neyman") <= 1000L)
    }
    // strata ordered by N*sigma must receive non-decreasing n_neyman
    val byWeight = rows.sortBy(r =>
      r.getAs[Long]("n_rows") * r.getAs[Double]("sigma"))
    val allocs = byWeight.map(_.getAs[Long]("n_neyman")).toSeq
    assert(allocs === allocs.sorted, s"allocation not monotone: $allocs")
  }

  test("weighted sample: 10 per source, biased toward long docs, " +
    "deterministic") {
    val rows = q("q_sample_weighted").collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("sample_rank"),
        r.getAs[Long]("doc_id"), r.getAs[Long]("n_chars")))
    val inventory = Tables.t(spark, sf0, "documents")
      .groupBy(col("source")).agg(count(lit(1)).as("n"),
        avg(col("n_chars")).as("avg_chars"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2))).toMap
    rows.groupBy(_._1).foreach { case (src, picks) =>
      assert(picks.length === math.min(10L, inventory(src)._1),
        s"$src sample size")
      assert(picks.map(_._2).sorted.toSeq ===
        (1L to picks.length).toSeq, s"$src ranks dense")
    }
    // A-ES with w = n_chars: the sample must skew toward longer docs
    val sampledAvg = rows.map(_._4).sum.toDouble / rows.length
    val corpusAvg = Tables.t(spark, sf0, "documents")
      .agg(avg(col("n_chars"))).collect().head.getDouble(0)
    assert(sampledAvg > corpusAvg,
      s"weighted sample should favor long docs: $sampledAvg vs $corpusAvg")
    // deterministic (hash draw, no RNG): full tuples, not just counts
    val again = q("q_sample_weighted").collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("sample_rank"),
        r.getAs[Long]("doc_id"), r.getAs[Long]("n_chars")))
    assert(again.toSeq === rows.toSeq)
  }

  test("funnel: stages only shrink, and match a scalar event replay") {
    val stages = q("q_funnel").collect()
      .map(r => r.getAs[String]("stage") -> r.getAs[Long]("n_users"))
      .toMap
    assert(stages("1_view") >= stages("2_click"))
    assert(stages("2_click") >= stages("3_purchase"))
    // scalar replay of the strict view < click < purchase ordering
    val evs = Tables.t(spark, sf0, "events")
      .selectExpr("user_id", "event_type",
        "unix_micros(CAST(ts AS TIMESTAMP)) AS us")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = evs.groupBy(_._1)
    def firstAfter(u: Long, t: String, after: Long): Option[Long] =
      byUser.getOrElse(u, Array.empty).collect {
        case (_, `t`, us) if us > after => us
      }.sorted.headOption
    var nV, nC, nP = 0L
    byUser.keys.foreach { u =>
      firstAfter(u, "view", Long.MinValue).foreach { vTs =>
        nV += 1
        firstAfter(u, "click", vTs).foreach { cTs =>
          nC += 1
          firstAfter(u, "purchase", cTs).foreach(_ => nP += 1)
        }
      }
    }
    assert(stages === Map("1_view" -> nV, "2_click" -> nC,
      "3_purchase" -> nP))
  }

  test("retention: offset-0 cell equals cohort size; cells never exceed it") {
    val cells = q("q_retention").collect()
      .map(r => (r.getAs[Long]("cohort_week"), r.getAs[Long]("week_offset"),
        r.getAs[Long]("n_users")))
    assert(cells.nonEmpty)
    assert(cells.forall(_._2 >= 0), "offsets are never negative")
    val cohortSize = cells.filter(_._2 == 0L)
      .map(c => c._1 -> c._3).toMap
    cells.foreach { case (cw, _, n) =>
      assert(n <= cohortSize(cw),
        s"cohort $cw cell $n exceeds cohort size ${cohortSize(cw)}")
    }
    // every user appears in exactly one cohort: offset-0 cells sum to
    // the distinct-user population
    val users = Tables.t(spark, sf0, "events")
      .select(col("user_id")).distinct().count()
    assert(cohortSize.values.sum === users)
  }

  test("tpch q1 plan: partial agg collapses before one tiny exchange") {
    val p = q("q_tpch_q1").queryExecution.executedPlan.toString
    assert(p.contains("partial_sum"), "map-side combine must fire")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges === 1, s"Q1 is one shuffle, got $exchanges")
  }

  test("tpch q18 plan: having-set joins back as broadcast, one fact shuffle") {
    val p = q("q_tpch_q18").queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      "qualifying orders must broadcast")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("schema evolution: pre-schema rows surface as NULL-typed group") {
    val rows = q("q_scan_evolution").collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("n")).toMap
    val ev = Tables.t(spark, sf0, "events")
    assert(rows("__pre_schema__") ===
      ev.filter(col("event_id") % 2 === 0).count())
    assert(rows.values.sum === ev.count())
  }

  test("corrupt records quarantine instead of failing the scan") {
    val rows = q("q_scan_corrupt").collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n"), r.getAs[Long]("n_corrupt"))).toMap
    val ev = Tables.t(spark, sf0, "events")
    val expectedBad = ev.filter(col("event_id") % 7 === 3).count()
    assert(rows("__quarantine__") === ((expectedBad, expectedBad)))
    rows.filterKeys(_ != "__quarantine__").foreach { case (k, (_, nc)) =>
      assert(nc === 0L, s"clean group $k must have no corrupt rows")
    }
    assert(rows.values.map(_._1).sum === ev.count())
  }

  test("tpch q21 equals the per-order-aggregate reformulation") {
    // independent recomputation: a late line survives iff its order has
    // >1 distinct suppliers and exactly 1 distinct LATE supplier
    val li = Tables.t(spark, sf0, "lineitem")
    val perOrder = li.groupBy(col("l_orderkey").as("k"))
      .agg(countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(when(col("l_returnflag") === "R", col("l_suppkey")))
          .as("n_late"))
    val nations = Set("NATION_1", "NATION_3", "NATION_5", "NATION_7")
    val expected = li.filter(col("l_returnflag") === "R")
      .join(Tables.t(spark, sf0, "orders")
          .filter(col("o_orderstatus") === "F").select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_semi")
      .join(perOrder, col("l_orderkey") === col("k"))
      .filter(col("n_supp") > 1 && col("n_late") === 1)
      .join(Tables.t(spark, sf0, "supplier"),
        col("l_suppkey") === col("s_suppkey"))
      .join(Tables.t(spark, sf0, "nation"),
        col("s_nationkey") === col("n_nationkey"))
      .filter(col("n_name").isin(nations.toSeq: _*))
      .groupBy(col("s_name")).agg(count(lit(1)).as("numwait"))
      .collect().map(r => r.getAs[String]("s_name") ->
        r.getAs[Long]("numwait")).toMap
    val got = q("q_tpch_q21").collect()
      .map(r => r.getAs[String]("s_name") -> r.getAs[Long]("numwait"))
      .toMap
    assert(got === expected)
  }

  test("sample_balanced: exactly 300 per class, lowest hash priorities") {
    val got = q("q_sample_balanced", "/root/testdata/sf0.01").collect()
    got.foreach(r => assert(r.getAs[Long]("n_kept") === 300L))
    // replay one class: the kept cents must equal the 300 smallest
    // md5 priorities of that class
    val rows = Tables.t(spark, "/root/testdata/sf0.01", "events")
      .filter(col("event_type") === "purchase")
      .select(col("event_id"),
        floor(col("value") * 100 + 0.5).cast("long")).collect()
      .map { r =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest(r.getLong(0).toString.getBytes("UTF-8"))
          .map(b => f"$b%02x").mkString
        (java.lang.Long.parseLong(hex.substring(0, 8), 16),
          r.getLong(0), r.getLong(1))
      }
    val keep = rows.sortBy(x => (x._1, x._2)).take(300)
    val p = got.find(_.getAs[String]("event_type") == "purchase").get
    assert(p.getAs[Long]("cents") === keep.map(_._3).sum)
    assert(p.getAs[Long]("min_pri") === keep.map(_._1).min)
  }

  test("text_burstiness: VMR matches a scalar sufficient-stats replay") {
    val got = SparkEntry.queries("q_text_burstiness")(spark, sf0)
      .collect()
    val docs = Tables.t(spark, sf0, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val nDocs = docs.length.toDouble
    val counts = scala.collection.mutable
      .Map[(String, Long), Long]().withDefaultValue(0L)
    docs.foreach { case (id, t) =>
      t.split(" ").foreach(w => counts((w, id)) += 1)
    }
    val perTerm = counts.toSeq.groupBy(_._1._1).map { case (term, g) =>
      val xs = g.map(_._2)
      (term, xs.sum, xs.map(x => x.toDouble * x).sum, xs.length.toLong)
    }
    got.foreach { r =>
      val term = r.getAs[String]("term")
      val (_, sx, sx2, df) = perTerm.find(_._1 == term).get
      assert(r.getAs[Long]("tf") === sx)
      assert(r.getAs[Long]("df") === df)
      val mean = sx / nDocs
      val vmr = (sx2 - sx.toDouble * sx / nDocs) / nDocs / mean
      assert(math.abs(r.getAs[Double]("vmr") - vmr) < 1e-4,
        s"$term got ${r.getAs[Double]("vmr")} want $vmr")
    }
    // the top-30 really are the highest-frequency terms
    val minTf = got.map(_.getAs[Long]("tf")).min
    val better = perTerm.count(_._2 > minTf)
    assert(better <= 30)
  }
  test("keyphrase: RAKE scores match a hand-computed two-doc corpus") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox", "en", "s0"),
      (2L, "quick brown the fox jumps", "en", "s0"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val dir = fixtureDir("more_rake")("documents" -> docs)
    val got = q("q_text_keyphrase", dir).collect()
      .map(r => r.getAs[String]("phrase") ->
        (r.getAs[Long]("n_words"), r.getAs[Long]("n_occ"),
          r.getAs[Long]("score_micro"))).toMap
    // phrases: "quick brown fox" (doc1), "quick brown" + "fox jumps"
    // (doc2). deg/freq: quick 5/2, brown 5/2, fox 5/2, jumps 2/1.
    assert(got("quick brown fox") === ((3L, 1L, 7500000L)))
    assert(got("quick brown") === ((2L, 1L, 5000000L)))
    assert(got("fox jumps") === ((2L, 1L, 4500000L)))
    assert(got.size === 3)
  }

  test("compact plan: greedy cumulative cut matches the hand binning") {
    import spark.implicits._
    // three files 40000/30000/20000 chars: cumulative cut at 65536
    // puts the first two in bin 0 (cum-before 0 and 40000), the third
    // in bin 1 (cum-before 70000)
    def doc(id: Long, src: String, n: Int) =
      (id, "x" * n, "en", src)
    val docs = Seq(doc(1L, "sa", 40000), doc(2L, "sb", 30000),
      doc(3L, "sc", 20000))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val dir = fixtureDir("more_compact")("documents" -> docs)
    val got = q("q_compact_plan", dir).collect()
      .map(r => r.getAs[Long]("bin") ->
        (r.getAs[Long]("n_files"), r.getAs[Long]("total_chars"),
          r.getAs[String]("first_file"), r.getAs[String]("last_file")))
      .toMap
    assert(got(0L) === ((2L, 70000L, "sa:en", "sb:en")))
    assert(got(1L) === ((1L, 20000L, "sc:en", "sc:en")))
    // conservation: every char lands in exactly one bin
    assert(got.values.map(_._2).sum === 90000L)
  }

  test("zip: the JDK ZipInputStream parses the fixture; walk replays") {
    val got = q("q_multimodal_zip").collect()
    val byId = got.map(r => r.getAs[Long]("doc_id") -> r).toMap
    (0L until 16L).foreach { id =>
      val zin = new java.util.zip.ZipInputStream(
        new java.io.ByteArrayInputStream(ops.Multimodal.zipBytes(id)))
      var names = List.empty[String]
      var total = 0L
      var e = zin.getNextEntry
      while (e != null) {
        val buf = new Array[Byte](64)
        var read = zin.read(buf)
        while (read > 0) { total += read; read = zin.read(buf) }
        names ::= e.getName
        e = zin.getNextEntry // throws on a CRC mismatch — real ZIP
      }
      val r = byId(id)
      assert(r.getAs[Long]("n_entries") === names.length.toLong)
      assert(r.getAs[Long]("total_bytes") === total, s"doc $id bytes")
      assert(names.reverse ===
        (0 until names.length).map(j => s"f$j.txt"))
    }
    got.foreach { r =>
      val n = r.getAs[Long]("n_entries")
      assert(r.getAs[Boolean]("eocd_ok"))
      assert(r.getAs[Long]("cd_size") === 52 * n)
      assert(r.getAs[Long]("n_sig_ok") === n)
      assert(r.getAs[Long]("n_checksum_ok") === n)
      assert(r.getAs[Long]("n_name_ok") === n)
    }
  }
}

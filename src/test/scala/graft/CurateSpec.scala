package graft

import org.apache.spark.sql.functions._

class CurateSpec extends SparkSuite {

  test("pack bins: scalar greedy replay reproduces the histogram") {
    val docs = Tables.t(spark, sf0, "documents")
      .select(col("doc_id"),
        least(size(split(col("text"), " ")).cast("bigint"), lit(256L))
          .as("tok"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    // greedy first-fit per 64-doc shard, replayed imperatively
    val bins = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    docs.groupBy(_._1 / 64).toSeq.sortBy(_._1).foreach { case (_, xs) =>
      var fill = 0L; var nd = 0L
      xs.sortBy(_._1).foreach { case (_, tok) =>
        if (nd == 0 || fill + tok > 256) {
          if (nd > 0) bins += ((nd, fill))
          fill = tok; nd = 1
        } else { fill += tok; nd += 1 }
      }
      if (nd > 0) bins += ((nd, fill))
    }
    val expected = bins.groupBy(_._1).map { case (d, bs) =>
      (d, bs.size.toLong, bs.map(_._2).sum) }.toSet
    val got = q("q_pack_bins").collect().map(r =>
      (r.getAs[Long]("docs_per_bin"), r.getAs[Long]("n_bins"),
        r.getAs[Long]("total_tokens"))).toSet
    assert(got === expected)
    // conservation: every doc lands in exactly one bin
    assert(got.toSeq.map(t => t._1 * t._2).sum === docs.length.toLong)
    assert(got.toSeq.map(_._3).sum === docs.map(_._2).sum)
  }

  test("shuffle audit: scalar adjacency replay, lift consistent") {
    val docs = Tables.t(spark, sf0, "documents")
      .select(col("doc_id"), col("source"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val withH = docs.map { case (id, src) =>
      (id * 2654435761L % 1048576L, id, src) }
    var nPairs = 0L; var nSame = 0L
    withH.groupBy(_._1 / 65536L).values.foreach { blk =>
      blk.sortBy(t => (t._1, t._2)).sliding(2).foreach {
        case Array(a, b) =>
          nPairs += 1; if (a._3 == b._3) nSame += 1
        case _ => ()
      }
    }
    val r = q("q_shuffle_audit").collect().head
    assert(r.getAs[Long]("n_docs") === docs.length.toLong)
    assert(r.getAs[Long]("n_pairs") === nPairs)
    assert(r.getAs[Long]("n_same") === nSame)
    // lift ties the two rates together (up to the emit rounding)
    val lift = r.getAs[Double]("lift")
    val ratio =
      r.getAs[Double]("same_rate") / r.getAs[Double]("expected_rate")
    assert(math.abs(lift - ratio) < 1e-4, s"lift $lift vs ratio $ratio")
  }

  test("mix sample: rates are valid, capped sources keep everything") {
    val rows = q("q_mix_sample").collect()
    assert(rows.nonEmpty)
    val inventory = Tables.t(spark, sf0, "documents")
      .groupBy(col("source")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val rate = r.getAs[Double]("rate")
      assert(rate > 0.0 && rate <= 1.0)
      assert(r.getAs[Long]("kept_docs") <= inventory(r.getAs[String]("source")))
      assert(r.getAs[Double]("target_frac") > 0.0)
    }
    // deterministic: a second run returns byte-identical rows (hash
    // gate, no RNG)
    assert(q("q_mix_sample").collect().toSeq === rows.toSeq)
  }

  test("mix sample: down-sampling pulls the achieved mix toward targets") {
    val rows = q("q_mix_sample").collect()
    val keptTotal = rows.map(_.getAs[Long]("kept_toks")).sum.toDouble
    // sources sampled at rate < 1 should land near their target share
    // of the kept corpus (hash gate is uniform-ish; generous 2× band)
    rows.filter(_.getAs[Double]("rate") < 1.0).foreach { r =>
      val achieved = r.getAs[Long]("kept_toks") / keptTotal
      val target = r.getAs[Double]("target_frac")
      assert(achieved < target * 2.5 && achieved > target / 2.5,
        s"${r.getAs[String]("source")}: achieved $achieved vs target $target")
    }
  }

  test("doc chunks: windows overlap by 10 tokens and cover every token") {
    val rows = q("q_doc_chunks").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_idx"),
        r.getAs[Long]("chunk_toks")))
    val byDoc = rows.groupBy(_._1)
    val nTok = Tables.t(spark, sf0, "documents")
      .selectExpr("doc_id", "CAST(size(split(text, ' ')) AS BIGINT) AS n")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    byDoc.foreach { case (doc, chunks) =>
      val sorted = chunks.sortBy(_._2)
      // stride 30 + window 40 ⇒ all but the last chunk hold 40 tokens,
      // and coverage = 30·(k−1) + last_chunk_toks = n_tok
      sorted.init.foreach { case (_, _, toks) => assert(toks === 40L) }
      val covered = 30L * (sorted.length - 1) + sorted.last._3
      assert(covered === nTok(doc),
        s"doc $doc covers $covered of ${nTok(doc)} tokens")
    }
  }

  test("text drift: KL is non-negative, zero for identical distributions") {
    import spark.implicits._
    q("q_text_drift").collect().foreach { r =>
      assert(r.getAs[Double]("kl") >= 0.0,
        s"${r.getAs[String]("source")}: negative KL")
    }
    // two sources with the SAME text ⇒ both match the corpus exactly
    val docs = Seq(
      (0L, "a b b c", "en", "s0"), (1L, "a b b c", "en", "s1"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val d2 = fixtureDir("drift")("documents" -> docs)
    q("q_text_drift", d2).collect().foreach { r =>
      assert(r.getAs[Double]("kl") === 0.0)
      assert(r.getAs[Long]("n_tokens") === 4L)
    }
  }

  test("pii redact: planted identifiers are all counted and scrubbed") {
    val rows = q("q_pii_redact").collect()
    assert(rows.length === 500) // sf0.001 documents
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("n_emails") === 1L)
      assert(r.getAs[Long]("n_phones") === 1L)
      assert(r.getAs[Long]("n_cards") === (if (id % 3 == 0) 1L else 0L))
      assert(r.getAs[String]("redacted_md5").length === 32)
    }
    // scrub check on one doc end to end: no raw PII survives
    val planted = Tables.t(spark, sf0, "documents")
      .filter(col("doc_id") === 0L)
      .selectExpr("""concat(text, ' contact user', doc_id,
        '@mail.example.com cc ', doc_id % 10, '111111111111111',
        ' tel +1-555-', lpad(CAST(doc_id % 10000 AS STRING), 4, '0'))""")
      .collect().head.getString(0)
    val scrubbed = planted
      .replaceAll("[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}", "<EMAIL>")
      .replaceAll("[0-9]{16}", "<CARD>")
      .replaceAll("\\+?[0-9]{1,2}-555-[0-9]{4}", "<PHONE>")
    assert(!scrubbed.contains("@") && !scrubbed.contains("555-"))
    assert(scrubbed.contains("<EMAIL>") && scrubbed.contains("<PHONE>") &&
      scrubbed.contains("<CARD>"))
  }

  test("curation funnel v2: stages are monotone and cross-check the ops") {
    val rows = q("q_curate_v2").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, e, sm, ds, k) = (r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_after_exact"), r.getAs[Long]("n_after_sem"),
        r.getAs[Long]("n_after_dsir"), r.getAs[Long]("n_kept"))
      assert(n >= e && e >= sm && sm >= ds && ds >= k,
        s"non-monotone funnel for ${r.getAs[String]("source")}")
    }
    // cross-check the semantic stage against the drop list it reuses:
    // total sem-stage drops == drop-list entries among exact keepers
    val semDrops = q("q_dedup_semantic").collect()
      .map(_.getAs[Long]("vec_id")).toSet
    val keepers = q("q_dedup_exact").collect()
      .map(_.getAs[Long]("keep_id")).toSet
    val expected = (semDrops & keepers).size
    val got = rows.map(r => r.getAs[Long]("n_after_exact") -
      r.getAs[Long]("n_after_sem")).sum
    assert(got === expected.toLong, "semantic-stage drop accounting")
  }
  test("mask plan: counts partition, fraction near 15%, hash replay") {
    val rows = q("q_text_mask_plan").collect()
    var selTot = 0L; var tokTot = 0L
    rows.foreach { r =>
      val (nt, ns) =
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_selected"))
      assert(ns === r.getAs[Long]("n_mask") + r.getAs[Long]("n_random") +
        r.getAs[Long]("n_keep"), "80/10/10 must partition the selection")
      assert(r.getAs[Long]("mask_frac_micro") === 1000000L * ns / nt)
      selTot += ns; tokTot += nt
    }
    val frac = selTot.toDouble / tokTot
    assert(frac > 0.10 && frac < 0.20, s"corpus mask fraction $frac")
    // scalar md5 replay of one document's gate
    val md = java.security.MessageDigest.getInstance("MD5")
    def u32(s: String): Long = {
      val hex = md.digest(s.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16)
    }
    val doc = Tables.t(spark, sf0, "documents")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
      .collect().head
    val n = doc.getString(1).split(" ").length
    val expSel = (0 until n).count(p =>
      u32(s"${doc.getLong(0)}:$p") < 644245094L).toLong
    val got = rows.find(_.getAs[Long]("doc_id") == doc.getLong(0)).get
    assert(got.getAs[Long]("n_selected") === expSel)
  }
}

package graft

import org.apache.spark.sql.functions._

/** Drift tier — PSI non-negativity/mass conservation, dup-ratio
  * recompute, and fuzzy-match recall on a planted typo fixture. */
class DriftSpec extends SparkSuite {

  test("PSI terms are non-negative and bins conserve the event count") {
    val rows = q("q_stats_psi").collect()
    assert(rows.length === 10)
    rows.foreach { r =>
      assert(r.getAs[Double]("psi_term") >= 0.0,
        s"PSI term negative at bin ${r.getAs[Long]("bin")}")
    }
    val total = rows.map(r => r.getAs[Long]("na") + r.getAs[Long]("nb")).sum
    assert(total === Tables.t(spark, sf0, "events").count())
  }

  test("dup ratio matches a per-source recompute") {
    val got = q("q_text_dup_ratio").collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_dup"))).toMap
    val docs = Tables.t(spark, sf0, "documents")
      .select(col("source"),
        expr("concat_ws(' ', slice(split(text, ' '), 1, 8))").as("pfx"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val df = docs.groupBy(_._2).map { case (k, v) => k -> v.length }
    docs.groupBy(_._1).foreach { case (src, rs) =>
      val nDup = rs.count(t => df(t._2) > 1)
      assert(got(src) === (rs.length.toLong, nDup.toLong), src)
    }
  }

  test("fuzzy match finds planted typos within the block") {
    import spark.implicits._
    val dir = fixtureDir("fuzzy")(
      "documents" -> Seq(
        "the quick brown fox", "the quikc brown fox",
        "teh quick brown fax", "box fox quick").toDF("text"))
    val pairs = q("q_text_fuzzy_match", dir).collect()
      .map(r => (r.getAs[String]("a"), r.getAs[String]("b"))).toSet
    // same-first-char lev<=2 pairs must surface (incl. transposition)
    assert(pairs.contains(("fax", "fox")))
    assert(pairs.contains(("quick", "quikc")))
    assert(pairs.contains(("teh", "the")))
    // different first char is traded away by the blocking
    assert(!pairs.contains(("box", "fox")))
  }
}

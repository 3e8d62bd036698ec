package graft

import org.apache.spark.sql.functions._

/** Audit tier — bucket-mass balance of the equi-depth histogram, regex
  * extraction coverage, and canonical-selection policy order. */
class AuditSpec extends SparkSuite {

  test("equi-depth buckets partition all rows and stay ordered") {
    val rows = q("q_agg_equidepth").collect()
    assert(rows.length === 8)
    val total = rows.map(_.getAs[Long]("n")).sum
    assert(total === Tables.t(spark, sf0, "lineitem").count())
    // boundaries are monotone: each bucket's hi <= next bucket's lo
    val sorted = rows.sortBy(_.getAs[Long]("bucket"))
    sorted.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Double]("hi") <= b.getAs[Double]("lo"))
    }
    // equi-depth: largest bucket is within 2x of the smallest
    val ns = rows.map(_.getAs[Long]("n"))
    assert(ns.max <= ns.min * 2)
  }

  test("regex audit: every props row matches the k pattern") {
    val rows = q("q_fn_regex").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_matched") === r.getAs[Long]("n_rows"))
      assert(r.getAs[Long]("min_k") >= 0L)
    }
  }

  test("canonical survivor obeys the priority policy inside its group") {
    val survivors = q("q_dedup_canonical").collect()
      .map(r => r.getAs[Long]("doc_id")).toSet
    assert(survivors.nonEmpty)
    val docs = Tables.t(spark, sf0, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"),
        expr("concat_ws(' ', slice(split(text, ' '), 1, 8))").as("pfx"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getString(3)))
    docs.groupBy(_._4).filter(_._2.length > 1).foreach { case (_, grp) =>
      val want = grp.minBy(t =>
        (t._2.stripPrefix("src").toLong, -t._3, t._1))
      assert(survivors.contains(want._1),
        s"expected ${want._1} to survive its group")
      grp.filterNot(_ == want).foreach(t =>
        assert(!survivors.contains(t._1) || t._1 == want._1))
    }
  }
  test("expectations: planted violations are counted rule-by-rule") {
    import spark.implicits._
    val d0 = java.sql.Date.valueOf("2024-01-05")
    val orders = Seq(
      (1L, 100.0, "O"), (2L, 250.0, "F"),
      (2L, 300.0, "O"),          // duplicate key
      (3L, -5.0, "X"))           // negative price + bad status
      .toDF("o_orderkey", "o_totalprice", "o_orderstatus")
    val lineitem = Seq(
      (1L, 5.0, 0.05, 0.04, d0),
      (2L, 99.0, 0.05, 0.04, d0),   // qty out of range
      (9L, 5.0, 0.20, 0.04, d0))    // orphan FK + discount range
      .toDF("l_orderkey", "l_quantity", "l_discount", "l_tax",
        "l_shipdate")
    val dir = fixtureDir("audit_expect")(
      "orders" -> orders, "lineitem" -> lineitem)
    val got = q("q_audit_expectations", dir).collect()
      .map(r => r.getAs[String]("rule") ->
        (r.getAs[Long]("n_checked"), r.getAs[Long]("n_violations"),
          r.getAs[Boolean]("pass"))).toMap
    assert(got("orders_pk_unique") === ((4L, 1L, false)))
    assert(got("orders_price_positive") === ((4L, 1L, false)))
    assert(got("orders_status_domain") === ((4L, 1L, false)))
    assert(got("lineitem_qty_range") === ((3L, 1L, false)))
    assert(got("lineitem_discount_range") === ((3L, 1L, false)))
    assert(got("lineitem_fk_orders") === ((3L, 1L, false)))
    assert(got("lineitem_shipdate_not_null") === ((3L, 0L, true)))
    assert(got("lineitem_tax_range") === ((3L, 0L, true)))
  }
}

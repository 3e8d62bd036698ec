package graft

import org.apache.spark.sql.functions._

/** Biz tier — overlap symmetry/bounds, RFM scoring invariants, and
  * basket-lift recompute at sf0.001. */
class BizSpec extends SparkSuite {

  test("source overlap is a full upper-triangular matrix of ratios") {
    val rows = q("q_source_overlap").collect()
    val sources = Tables.t(spark, sf0, "documents")
      .select(col("source")).distinct().count().toInt
    assert(rows.length === sources * (sources - 1) / 2)
    rows.foreach { r =>
      val j = r.getAs[Double]("jaccard")
      assert(j >= 0.0 && j <= 1.0)
      assert(r.getAs[String]("sa") < r.getAs[String]("sb"))
    }
  }

  test("RFM quintiles are balanced and segments echo the scores") {
    val rows = q("q_events_rfm").collect()
    assert(rows.nonEmpty)
    Seq("r_score", "f_score", "m_score").foreach { c =>
      val counts = rows.groupBy(_.getAs[Long](c)).view.mapValues(_.length)
      assert(counts.keys.forall(k => k >= 1L && k <= 5L))
      // ntile balance: bucket sizes differ by at most 1
      assert(counts.values.max - counts.values.min <= 1)
    }
    rows.foreach { r =>
      assert(r.getAs[String]("segment") ===
        s"${r.getAs[Long]("r_score")}${r.getAs[Long]("f_score")}" +
          s"${r.getAs[Long]("m_score")}")
      assert(r.getAs[Long]("recency_days") >= 0L)
    }
  }

  test("basket lift matches a driver-side recompute for the top pair") {
    val top = q("q_basket_lift").collect().head
    val (ba, bb) = (top.getAs[String]("ba"), top.getAs[String]("bb"))
    val lines = Tables.t(spark, sf0, "lineitem")
      .join(Tables.t(spark, sf0, "part"),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("p_brand")).distinct()
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val byOrder = lines.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val nBoth = byOrder.values.count(s => s.contains(ba) && s.contains(bb))
    val na = lines.count(_._2 == ba)
    val nb = lines.count(_._2 == bb)
    val nOrders = Tables.t(spark, sf0, "orders").count()
    assert(top.getAs[Long]("n_both") === nBoth.toLong)
    val want = BigDecimal(nBoth.toDouble * nOrders / (na.toLong * nb))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(top.getAs[Double]("lift") === want)
  }
}

package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Composite analytics in the classic TPC-H shapes, adapted to the
  * driver's star schema — full multi-join + aggregate + order + limit
  * programs, the queries a reference user would actually run over the
  * archive. All joins follow the broadcast-dims / shuffle-facts split;
  * AQE reorders and sizes the rest. */
object Analytics {

  private def t(n: String)(implicit s: SparkSession, d: String) =
    Tables.t(s, d, n)

  /** Q3 shape — unshipped-order revenue by order for one segment. */
  val qTpchQ3 = Q(
    "q_tpch_q3",
    (sp, dir) => {
      implicit val s: SparkSession = sp
      implicit val d: String = dir
      t("customer").filter(col("c_mktsegment") === "BUILDING")
        .join(t("orders"),
          col("c_custkey") === col("o_custkey") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp_ntz"))
        .join(t("lineitem"),
          col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > lit("1998-01-01").cast("timestamp_ntz"))
        .groupBy(col("o_orderkey"), col("o_orderdate"))
        .agg(round(sum(col("l_extendedprice") *
          (lit(1.0) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    },
    Some("""SELECT o_orderkey, o_orderdate,
              round(sum(l_extendedprice * (1.0 - l_discount)), 2)
                AS revenue
            FROM customer
              JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON o_orderkey = l_orderkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1998-01-01'
              AND l_shipdate > TIMESTAMP '1998-01-01'
            GROUP BY o_orderkey, o_orderdate
            ORDER BY revenue DESC NULLS LAST, o_orderkey NULLS FIRST
            LIMIT 10"""))

  /** Q5 shape — local-supplier revenue per nation inside one region. */
  val qTpchQ5 = Q(
    "q_tpch_q5",
    (sp, dir) => {
      implicit val s: SparkSession = sp
      implicit val d: String = dir
      t("customer")
        .join(t("orders"), col("c_custkey") === col("o_custkey"))
        .join(t("lineitem"), col("o_orderkey") === col("l_orderkey"))
        .join(t("supplier"),
          col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(t("nation")),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t("region")),
          col("n_regionkey") === col("r_regionkey") &&
          col("r_name") === "ASIA")
        .groupBy(col("n_name"))
        .agg(round(sum(col("l_extendedprice") *
          (lit(1.0) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },
    Some("""SELECT n_name,
              round(sum(l_extendedprice * (1.0 - l_discount)), 2)
                AS revenue
            FROM customer
              JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON o_orderkey = l_orderkey
              JOIN supplier ON l_suppkey = s_suppkey
                           AND c_nationkey = s_nationkey
              JOIN nation ON s_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
            GROUP BY n_name
            ORDER BY revenue DESC NULLS LAST, n_name NULLS FIRST"""))

  /** Q10 shape — returned-item revenue attribution per customer. */
  val qTpchQ10 = Q(
    "q_tpch_q10",
    (sp, dir) => {
      implicit val s: SparkSession = sp
      implicit val d: String = dir
      t("customer")
        .join(t("orders"), col("c_custkey") === col("o_custkey"))
        .join(t("lineitem"),
          col("o_orderkey") === col("l_orderkey") &&
          col("l_returnflag") === "R")
        .join(broadcast(t("nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"),
          col("c_acctbal"))
        .agg(round(sum(col("l_extendedprice") *
          (lit(1.0) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },
    Some("""SELECT c_custkey, c_name, n_name, c_acctbal,
              round(sum(l_extendedprice * (1.0 - l_discount)), 2)
                AS revenue
            FROM customer
              JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON o_orderkey = l_orderkey
              JOIN nation ON c_nationkey = n_nationkey
            WHERE l_returnflag = 'R'
            GROUP BY c_custkey, c_name, n_name, c_acctbal
            ORDER BY revenue DESC NULLS LAST, c_custkey NULLS FIRST
            LIMIT 20"""))

  val all: Seq[Q] = Seq(qTpchQ3, qTpchQ5, qTpchQ10)
}

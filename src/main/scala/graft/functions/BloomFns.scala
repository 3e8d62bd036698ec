package graft.functions

import org.apache.spark.sql.SparkSession

/** Session registration for Spark's internal bloom-filter expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain`) — the same
  * machinery Catalyst's runtime-filter rule injects for selective joins,
  * exposed as SQL functions so a pipeline can build and apply the
  * sketch explicitly (pre-filtering a probe side BEFORE its shuffle).
  * The analyzer wraps the raw aggregate in an AggregateExpression, as it
  * does for built-ins. */
object BloomFns {
  def register(spark: SparkSession): Unit = {
    val fr = spark.sessionState.functionRegistry
    fr.createOrReplaceTempFunction(
      "bloom_filter_agg",
      exprs => new org.apache.spark.sql.catalyst.expressions.aggregate
        .BloomFilterAggregate(exprs(0), exprs(1), exprs(2)),
      "scala_udf")
    fr.createOrReplaceTempFunction(
      "might_contain",
      exprs => org.apache.spark.sql.catalyst.expressions
        .BloomFilterMightContain(exprs(0), exprs(1)),
      "scala_udf")
  }
}

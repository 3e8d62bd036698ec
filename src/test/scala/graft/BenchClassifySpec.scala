package graft

/** Pins the bench's prepared-frame honesty guard (Bench.classifyBuilds):
  * a builder that launches NO Spark job is a pure plan and may be
  * memoized across timing passes; a builder that runs ANY job did real
  * per-execution data work and must rebuild every pass — memoizing it
  * would serve pass 2 a precomputed result. A regression here silently
  * corrupts the official bench record, so the classification itself is
  * under test, not just eyeballed in the bench log. */
class BenchClassifySpec extends SparkSuite {
  import org.apache.spark.sql.DataFrame

  test("pure-plan builders are memoized; job-running builders are not") {
    var pureCalls = 0
    var eagerCalls = 0
    val entries = Seq[(String, () => DataFrame)](
      "pure" -> (() => { pureCalls += 1; spark.range(10).toDF("id") }),
      "eager" -> (() => {
        eagerCalls += 1
        // an action inside the build — the doremi/sink pattern
        val n = spark.range(1000).selectExpr("sum(id)").collect()(0)
        spark.range(10).filter(s"id < $n").toDF()
      }),
      "throws" -> (() => sys.error("broken builder")))
    val (memo, dirty) = Bench.classifyBuilds(spark, entries)
    assert(memo.keySet === Set("pure"),
      s"only the job-free builder may be memoized, got ${memo.keySet}")
    assert(dirty === Set("eager"),
      s"the action-running builder must rebuild per pass, got $dirty")
    assert(pureCalls === 1 && eagerCalls === 1)
    assert(memo("pure").count() === 10L)
  }

  test("a builder whose jobs run on a side thread is still caught") {
    // broadcast/AQE materialization runs on threads spawned under the
    // build — SparkContext.localProperties is an InheritableThreadLocal
    // (and Spark's exec pools re-capture it explicitly), so a child
    // thread's jobs carry the build attribution without any plumbing
    val entries = Seq[(String, () => org.apache.spark.sql.DataFrame)](
      "sidethread" -> (() => {
        val t = new Thread(() =>
          spark.range(500).selectExpr("max(id)").collect())
        t.start(); t.join()
        spark.range(3).toDF("id")
      }))
    val (memo, dirty) = Bench.classifyBuilds(spark, entries)
    assert(dirty === Set("sidethread") && memo.isEmpty)
  }
}

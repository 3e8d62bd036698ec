package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Dev-only profiler for the stream drain's fixed cost: drains one
  * trivial pipeline N times and prints wall time alongside the
  * micro-batch durationMs breakdown from StreamingQueryProgress, so the
  * non-batch overhead (query start/stop, checkpoint setup, listing) is
  * separable from batch execution. Usage:
  *   sbt "Test/runMain graft.StreamProfile [n]" */
object StreamProfile {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(5)
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_STREAM_WIDTH", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // A/B any streaming conf without a rebuild:
    //   SPARK_GRAFT_STREAM_CONF="k=v;k2=v2" sbt "Test/runMain graft.StreamProfile"
    sys.env.get("SPARK_GRAFT_STREAM_CONF").foreach(_.split(";")
      .filter(_.contains("=")).foreach { kv =>
        val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v)
      })
    val schema = spark.read.parquet(s"$d/events.parquet").schema
    spark.range(1000000L).selectExpr("sum(id)").collect()
    // batch equivalent for comparison
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      spark.read.schema(schema).format("parquet")
        .option("pathGlobFilter", "events.parquet").load(d)
        .groupBy(col("event_type")).agg(count(lit(1)).as("cnt")).collect()
      println(f"[prof] batch-equiv run $i: ${(System.nanoTime() - t0) / 1e6}%.0f ms")
    }
    // stateless drain (pure projection, append): separates state-store
    // cost from the micro-batch execution path itself
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val src = spark.readStream.schema(schema).format("parquet")
        .option("pathGlobFilter", "events.parquet").load(d)
        .select(col("event_type")).filter(col("event_type") =!= "zz")
      val q = src.writeStream.outputMode("append").format("memory")
        .queryName(s"prof_sl_$i").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val wall = (System.nanoTime() - t0) / 1e6
      val dm = q.recentProgress.lastOption.map(_.durationMs)
      println(f"[prof] stateless run $i wall=$wall%.0f ms $dm")
    }
    (1 to n).foreach { i =>
      val t0 = System.nanoTime()
      val src = spark.readStream.schema(schema).format("parquet")
        .option("pathGlobFilter", "events.parquet").load(d)
        .groupBy(col("event_type")).agg(count(lit(1)).as("cnt"))
      val w = src.writeStream.outputMode("complete").format("memory")
        .queryName(s"prof_$i").trigger(Trigger.AvailableNow())
      val q = (if (sys.env.contains("SPARK_GRAFT_SHM"))
        w.option("checkpointLocation", s"/dev/shm/graft-prof/ck_$i")
      else w).start()
      q.awaitTermination()
      val wall = (System.nanoTime() - t0) / 1e6
      val prog = q.recentProgress
      println(f"[prof] run $i wall=$wall%.0f ms batches=${prog.length}")
      prog.foreach { p =>
        val dm = p.durationMs
        println(s"  batch ${p.batchId}: " +
          dm.entrySet.toArray.mkString(", ") +
          s" rows=${p.numInputRows}")
        p.stateOperators.foreach { so =>
          println(s"    state[${so.operatorName}]: commitMs=" +
            s"${so.commitTimeMs} rows=${so.numRowsTotal} " +
            s"mem=${so.memoryUsedBytes}")
        }
      }
    }
    spark.stop()
  }
}

package graft
import org.apache.spark.sql.SparkSession

// throwaway probe: phash_pairs output cardinality at 1x vs 10x
object XProbe3 {
  def main(args: Array[String]): Unit = {
    val d10 = sys.props("java.io.tmpdir") + "/graft_scale10"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n1 = SparkEntry.queries("q_multimodal_phash_pairs")(
      spark, "/root/testdata/sf0.01").count()
    println(s"pairs 1x: $n1")
    val n10 = SparkEntry.queries("q_multimodal_phash_pairs")(
      spark, d10).count()
    println(s"pairs 10x: $n10")
    spark.stop()
  }
}

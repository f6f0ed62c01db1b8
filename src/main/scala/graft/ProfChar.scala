package graft
import org.apache.spark.sql.SparkSession
/** Scratch profiler for neardup_pairs_char (not graded, not shipped). */
object ProfChar {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[prof] $name%-28s ${(System.nanoTime()-t0)/1e9}%8.2f s  (n=$n)")
    }
    Tables(spark, dir, "documents").count()
    graft.sources.ResultCache.clear()
    operators.Similarity.neardupPairsChar(spark, "/root/testdata/sf0.001").count() // JIT warm
    (1 to 3).foreach { i =>
      t(s"full uncached pairs #$i") {
        graft.sources.ResultCache.clear()
        operators.Similarity.neardupPairsChar(spark, dir).count()
      }
    }
    spark.stop()
  }
}

package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Scratch profiler (not graded, not shipped). */
object ProfChar {
  def main(args: Array[String]): Unit = {
    ToolLogging.init()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[prof] $name%-30s ${(System.nanoTime()-t0)/1e9}%8.2f s  (n=$n)")
    }
    def force(df: org.apache.spark.sql.DataFrame): Long = {
      df.select(xxhash64(df.columns.toIndexedSeq.map(col): _*).as("h"))
        .agg(expr("bit_xor(h)")).collect(); df.count()
    }
    operators.Aggregates.pricingSummary(spark, "/root/testdata/sf0.001").count() // JIT
    (1 to 2).foreach { i =>
      t(s"pricing_summary as-is #$i") { force(operators.Aggregates.pricingSummary(spark, dir)) }
      t(s"pricing fanned #$i") {
        val li = Tables.fanOut(spark, Tables(spark, dir, "lineitem"), key = "l_orderkey")
        li.createOrReplaceTempView("li_fan")
        // same shape: shipdate filter + grouped decimal agg
        force(li.filter(col("l_shipdate") <= lit("1998-09-02"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("sum_qty"),
               sum(col("l_extendedprice").cast("decimal(18,2)")).as("sum_base"),
               count(lit(1)).as("n")))
      }
    }
    spark.stop()
  }
}

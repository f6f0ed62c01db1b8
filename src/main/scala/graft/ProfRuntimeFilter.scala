package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Plan probe (kept with the other Prof* mains): prints the formatted
  * plan of the runtime-bloom-filter join shape so the conf gate in
  * [[graft.operators.Joins.lineitemBloomJoin]] can be re-derived —
  * InjectRuntimeFilter needs broadcast off plus the application-side
  * scan-size threshold below the probe scan's size. */
object ProfRuntimeFilter {
  def main(args: Array[String]): Unit = {
    ToolLogging.init()
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val ss = spark.newSession()
    ss.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    ss.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    ss.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    ss.conf.set("spark.sql.optimizer.runtimeFilter.number.threshold", "10")
    val li = Tables(ss, dir, "lineitem")
    val ord = Tables(ss, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
    val q = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("qty"))
    q.explain("formatted")
    println("=== contains might_contain: " +
      q.queryExecution.optimizedPlan.toString.contains("might_contain"))
    spark.stop()
  }
}

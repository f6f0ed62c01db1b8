import org.apache.spark.sql.SparkSession
object PlanProbe extends App {
  val spark = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions","4")
    .config("spark.sql.session.timeZone","UTC").config("spark.ui.enabled","false").getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")
  val dir = "/root/testdata/sf0.01"
  println("=== segment_preview (expect: broadcast nation, pushed filters) ===")
  graft.SparkEntry.queries("segment_preview")(spark, dir).explain("formatted")
  println("=== pricing_summary (expect: PushedFilters shipdate, pruned ReadSchema) ===")
  graft.SparkEntry.queries("pricing_summary")(spark, dir).explain("formatted")
  println("=== revenue_by_nation (expect: SMJ/shuffle on custkey + BHJ nation) ===")
  graft.SparkEntry.queries("revenue_by_nation")(spark, dir).explain("formatted")
  spark.stop()
}

package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Round-13 optimization evidence: dump `.explain("formatted")` for the
  * queries touched this round to `plans/r13/<query>_<suffix>.txt`
  * (suffix = args(0), e.g. "before"/"after"; query names = args(1..)
  * or SPARK_GRAFT_ONLY). Uses the bench's own session shape (local[32],
  * 32 shuffle partitions) so Exchange counts match what the bench runs.
  * Run: `sbt "runMain graft.PlanDumpR13 before fuzzy_join_qgram ..."` */
object PlanDumpR13 {
  def main(args: Array[String]): Unit = {
    ToolLogging.init()
    val suffix = args.headOption.getOrElse("before")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else sys.env.getOrElse("SPARK_GRAFT_ONLY", "")
        .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get("plans/r13"))
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      // resolve AQE to the final plan so Exchange/join strategy claims
      // reflect what actually ran, then dump the formatted INITIAL
      // explain too (it carries PushedFilters/ReadSchema detail).
      df.collect()
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val finalPlan = df.queryExecution.executedPlan.toString
      Files.writeString(Paths.get(s"plans/r13/${name}_$suffix.txt"),
        s"== explain(formatted), $dir ==\n" + formatted +
          "\n== AQE-final executed plan ==\n" + finalPlan)
      println(s"wrote plans/r13/${name}_$suffix.txt")
    }
    spark.stop()
  }
}

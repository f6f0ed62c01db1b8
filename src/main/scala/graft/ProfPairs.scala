package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic main: stage-level breakdown of the word-LSH pair build
  * (the residual majority of `neardup_clusters`' cold cost — r4
  * verdict #2). Run: `sbt "runMain graft.ProfPairs"`. */
object ProfPairs {
  def main(args: Array[String]): Unit = {
    ToolLogging.init()
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warm-up at the tiny SF (codegen/JIT), like Bench
    graft.operators.Similarity.profilePairStages(spark, "/root/testdata/sf0.001")
    println("[prof] ---- timed pass (sf0.1) ----")
    graft.operators.Similarity.profilePairStages(spark, "/root/testdata/sf0.1")
    // the REAL cached paths, cold, three times in one JVM (variance probe)
    for (i <- 1 to 3) {
      graft.sources.ResultCache.clear()
      val t0 = System.nanoTime()
      graft.operators.Similarity.neardupPairs(spark, "/root/testdata/sf0.1").count()
      println(f"[prof] neardupPairs cold #$i   ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      val t1 = System.nanoTime()
      graft.operators.Similarity.neardupPairsChar(spark, "/root/testdata/sf0.1").count()
      println(f"[prof] neardupPairsChar cold #$i ${(System.nanoTime() - t1) / 1e9}%6.2f s")
    }
    spark.stop()
  }
}

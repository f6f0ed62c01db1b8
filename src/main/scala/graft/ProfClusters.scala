package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic main: where does `neardup_clusters` spend its time?
  * Splits the cold build into (LSH pair build) + (component loop), and
  * reports the loop's round count — the harness that exposed the two
  * round-3 performance fixes (driver plan-bloat on cached-frame
  * consumers; corpus-sized shuffle partitioning inside the loop).
  * Run: `sbt "runMain graft.ProfClusters"` (expects /root/testdata). */
object ProfClusters {
  def main(args: Array[String]): Unit = {
    ToolLogging.init()
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    // untimed warm-up at the tiny SF (codegen/JIT), like Bench
    graft.operators.Similarity
      .queries("neardup_clusters")(spark, "/root/testdata/sf0.001").count()
    graft.sources.ResultCache.clear()
    val p = timed("pair build") {
      val df = graft.operators.Similarity.neardupPairs(spark, dir)
      df.count(); df
    }
    timed("clusters after pairs") {
      graft.operators.Similarity.neardupClusters(spark, dir).count()
    }
    graft.sources.ResultCache.clear()
    timed("clusters cold") {
      graft.operators.Similarity.neardupClusters(spark, dir).count()
    }
    for (i <- 1 to 3) {
      graft.sources.ResultCache.clear()
      val t0 = System.nanoTime()
      graft.operators.Similarity.neardupClusters(spark, dir).count()
      println(f"[prof] clusters cold #$i       ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    val pf = p.filter(col("jaccard") >= 0.5)
    val edges = pf.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pf.select(col("doc_b").as("src"), col("doc_a").as("dst")))
    val (lbl, rounds) = timed("component loop only") {
      val r = graft.operators.Similarity.connectedComponents(edges)
      r._1.count(); r
    }
    println(s"[prof] rounds=$rounds endpoints=${lbl.count()}")
    lbl.unpersist()
    spark.stop()
  }
}

package graft

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Diagnostic main (r12 optimization round): per-query breakdown of
  * WHERE the bench seconds go — jobs launched, stages, tasks, summed
  * executor task time, GC time, shuffle bytes — so driver-side cost
  * (planning, job scheduling, AQE re-optimization) is separable from
  * executor compute. Run:
  *   SPARK_GRAFT_ONLY=q1,q2 sbt "runMain graft.ProfBoard"
  * Mirrors Bench's methodology exactly (same force(), same warm-up at
  * sf0.001, same 32-partition local session) but is NEVER run by the
  * driver — measurement tooling only. */
object ProfBoard {
  private final class Acc extends SparkListener {
    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val taskTimeMs = new AtomicLong
    val gcMs = new AtomicLong
    val shufReadB = new AtomicLong
    val shufWriteB = new AtomicLong
    override def onJobStart(j: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = { stages.incrementAndGet(); () }
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      tasks.incrementAndGet()
      val m = t.taskMetrics
      if (m != null) {
        taskTimeMs.addAndGet(m.executorRunTime)
        gcMs.addAndGet(m.jvmGCTime)
        shufReadB.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        shufWriteB.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
      ()
    }
    def snap(): (Int, Int, Int, Long, Long, Long, Long) =
      (jobs.get, stages.get, tasks.get, taskTimeMs.get, gcMs.get,
        shufReadB.get, shufWriteB.get)
  }

  private def force(spark: SparkSession,
      fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
      dir: String): Unit = {
    val df = fn(spark, dir)
    import org.apache.spark.sql.functions.{col, expr, xxhash64}
    df.select(xxhash64(df.columns.toIndexedSeq.map(col): _*).as("h"))
      .agg(expr("bit_xor(h)")).collect()
    ()
  }

  def main(args: Array[String]): Unit = {
    ToolLogging.init()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARMUP_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val reps = sys.env.get("SPARK_GRAFT_BENCH_REPS")
      .flatMap(s => scala.util.Try(s.toInt).toOption).filter(_ > 0).getOrElse(1)
    val sorted = SparkEntry.queries.toSeq
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .sortBy(_._1)
    // warm-up (untimed)
    sorted.foreach { case (_, fn) =>
      try force(spark, fn, warmDir) catch { case _: Throwable => () }
    }
    val acc = new Acc
    spark.sparkContext.addSparkListener(acc)
    println(f"${"query"}%-36s ${"sec"}%7s ${"jobs"}%5s ${"stg"}%5s ${"task"}%6s ${"tTime"}%8s ${"gc"}%6s ${"shR MB"}%7s ${"shW MB"}%7s")
    sorted.foreach { case (name, fn) =>
      (1 to reps).foreach { r =>
        System.gc()
        val before = acc.snap()
        val t0 = System.nanoTime()
        val ok = try { force(spark, fn, sfDir); true }
          catch { case e: Throwable =>
            System.err.println(s"[prof] $name failed: ${e.getMessage}"); false }
        val sec = (System.nanoTime() - t0) / 1e9
        // listener events are async; give the bus a moment to drain
        Thread.sleep(150)
        val after = acc.snap()
        val tag = if (reps > 1) s"$name#$r" else name
        if (ok) println(f"$tag%-36s $sec%7.2f ${after._1 - before._1}%5d ${after._2 - before._2}%5d ${after._3 - before._3}%6d ${(after._4 - before._4) / 1000.0}%8.1f ${(after._5 - before._5) / 1000.0}%6.1f ${(after._6 - before._6) / 1e6}%7.1f ${(after._7 - before._7) / 1e6}%7.1f")
      }
    }
    try spark.stop() catch { case _: Throwable => () }
  }
}

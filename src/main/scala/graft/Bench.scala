package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // same tz as Verify/the oracle: a non-UTC machine would otherwise
      // benchmark DIFFERENT result sets than the ones graded
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM/session once (codegen compiler, parquet footer reads,
    // shuffle machinery) so per-query timings measure the query, not
    // first-use initialization.
    spark.range(1000).selectExpr("sum(id)").collect()
    // A failed query records -1 (never a normal-looking elapsed time)
    // and is counted in "failures" — a broken run must not be
    // indistinguishable from a passing one.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try {
        // Hash every output column and sum — count() alone would let
        // ColumnPruning strip the projection expressions, benchmarking
        // projection-heavy queries as near no-ops.
        val df = fn(spark, sfDir)
        import org.apache.spark.sql.functions.{col, expr, xxhash64}
        df.select(xxhash64(df.columns.map(col): _*).as("h"))
          .agg(expr("bit_xor(h)")).collect() // xor: no ANSI long overflow
        true
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          false
      }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failures = results.values.count(_ < 0)
    val total = results.values.filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failures":$failures,"sf":"$sfDir"}""")
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.operators.Compaction

/** Compaction layout invariants on sf0.001: file-count collapse,
  * content preservation, per-file disjoint key ranges (the zone-map
  * property), and in-file sort order. The multi-file path is driven
  * with a small explicit target so range layout is observable at
  * bench scale. */
class CompactionSpec extends SparkSpec {

  private def files(dir: String): Array[String] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.toString)
  }

  test("fragmented copy is genuinely shattered; default compaction collapses it") {
    val frag = Compaction.fragmentedOrdersDir(spark, sf0001)
    assert(files(frag).length == Compaction.FragmentFiles)
    val comp = Compaction.compactedOrdersDir(spark, sf0001)
    val n = files(comp).length
    assert(n < Compaction.FragmentFiles / 4, s"still $n files")
    // pure layout change: exact multiset of keys preserved
    val a = spark.read.parquet(frag).groupBy().agg(
      count(lit(1)), sum(col("o_orderkey"))).collect().head
    val b = spark.read.parquet(comp).groupBy().agg(
      count(lit(1)), sum(col("o_orderkey"))).collect().head
    assert(a == b)
  }

  test("small-target compaction yields disjoint, sorted key ranges per file") {
    val out = Tables.scratchDir("graft_compact_small_").getAbsolutePath
    val frag = Compaction.fragmentedOrdersDir(spark, sf0001)
    val totalBytes = files(frag).map { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .getFileStatus(p).getLen
    }.sum
    val n = Compaction.compact(spark, frag, out, "o_orderkey",
      targetBytes = totalBytes / 4)
    assert(n >= 4 && files(out).length == n)
    // zone maps: each file owns a disjoint o_orderkey interval
    val ranges = spark.read.parquet(out)
      .groupBy(input_file_name().as("f"))
      .agg(min("o_orderkey").as("lo"), max("o_orderkey").as("hi"),
        count(lit(1)).as("cnt"))
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(ranges.length == n)
    ranges.sliding(2).foreach {
      case Array((_, hi1, _), (lo2, _, _)) => assert(hi1 < lo2, "overlap")
      case _ =>
    }
    // a point lookup's key interval covers exactly ONE file
    val probe = ranges(1)._1
    assert(ranges.count { case (lo, hi, _) => lo <= probe && probe <= hi } == 1)
    // rows within each file are sorted on the key
    val perFileSorted = spark.read.parquet(out)
      .withColumn("f", input_file_name())
      .withColumn("prev",
        lag("o_orderkey", 1).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("f").orderBy(monotonically_increasing_id())))
      .filter(col("prev").isNotNull && col("prev") > col("o_orderkey"))
    assert(perFileSorted.count() == 0)
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.operators.{BloomIndex, Compaction}

/** Bloom file-index invariants on sf0.001: probe addressing matches
  * the sketch's own update path, the candidate set truly skips files
  * AND never skips a file containing the key (the no-false-negative
  * guarantee the graded hash relies on), and the served lookup equals
  * the unindexed scan. */
class BloomIndexSpec extends SparkSpec {

  test("probe positions equal the sketch's update addressing") {
    // recompute independently with nibble arithmetic over the hex md5
    val md = java.security.MessageDigest.getInstance("MD5")
    BloomIndex.probePositions("1").zipWithIndex.foreach { case (pos, i) =>
      md.reset()
      val hex = md.digest(s"$i:1".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      val expect = Integer.parseInt(hex.take(4), 16)
      assert(pos == expect, s"hash $i")
    }
  }

  test("candidates skip most files but include every file holding the key") {
    val frag = Compaction.fragmentedOrdersDir(spark, sf0001)
    val total = Compaction.FragmentFiles
    val cand = BloomIndex.candidateFiles(spark, sf0001).toSet
    assert(cand.nonEmpty && cand.size < total,
      s"${cand.size} of $total files — nothing skipped")
    val truth = spark.read.parquet(frag)
      .filter(col("o_custkey") === 1L)
      .select(input_file_name().as("f")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(truth.subsetOf(cand),
      s"FALSE NEGATIVE: ${truth.diff(cand)}")
  }

  test("indexed lookup ≡ full-scan lookup") {
    val frag = Compaction.fragmentedOrdersDir(spark, sf0001)
    val full = spark.read.parquet(frag)
      .filter(col("o_custkey") === 1L)
      .select("o_orderkey").orderBy("o_orderkey")
      .collect().map(_.getLong(0)).toSeq
    val indexed = BloomIndex.orderLookupBloom(spark, sf0001)
      .collect().map(_.getLong(0)).toSeq
    assert(full == indexed && full.nonEmpty)
  }

  test("the lookup's scan node reads exactly the bloom-claimed files") {
    // r6 verdict #4: the prune lives in the scan (ManifestFileIndex),
    // so the executed plan's numFiles metric — not a helper's return —
    // carries the skip
    val cand = BloomIndex.candidateFiles(spark, sf0001)
    val df = BloomIndex.orderLookupBloom(spark, sf0001)
    df.collect()
    val scanned = fileScans(df.queryExecution.executedPlan)
      .map(_.metrics("numFiles").value).sum
    assert(scanned == cand.length, s"scan read $scanned files, " +
      s"manifest claimed ${cand.length}")
  }
}

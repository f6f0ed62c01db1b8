package graft

import org.apache.spark.sql.functions._
import graft.operators.{JoinIvm, MergeOnRead}

/** Join-view IVM: the maintenance plan never rescans the base fact,
  * and the maintained store equals the from-scratch join exactly. */
class JoinIvmSpec extends SparkSpec {

  test("maintenance plan reads the stored view + log window + dim — " +
      "never the base orders parquet") {
    val frame = JoinIvm.maintainedFrame(spark, sf0001)
    frame.collect() // execute so AQE finalizes the scans
    val roots = fileScans(frame.queryExecution.executedPlan)
      .flatMap(_.relation.location.rootPaths.map(_.toString))
    assert(roots.nonEmpty)
    assert(!roots.exists(_.contains("orders.parquet")),
      s"maintenance rescanned the base fact: $roots")
    assert(roots.exists(_.contains("graft_joinivm_v0_")),
      "maintenance did not read the stored view")
    assert(roots.exists(_.contains("graft_mor_log_")),
      "maintenance did not read the delta log")
    assert(roots.exists(_.contains("customer.parquet")),
      "fact delta must join the dim")
  }

  test("maintained store ≡ from-scratch join of the resolved fact " +
      "and the patched dim, row for row") {
    val store = spark.read.parquet(JoinIvm.maintainedDir(spark, sf0001))
    val dim = graft.Tables(spark, sf0001, "customer")
      .select(col("c_custkey"),
        when(substring(md5(col("c_custkey").cast("string")), 1, 1)
            === JoinIvm.DimHex, "RESEGMENTED")
          .otherwise(col("c_mktsegment")).as("c_mktsegment"))
    val scratch = MergeOnRead.snapshot(spark, sf0001)
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"))
      .join(broadcast(dim), col("o_custkey") === col("c_custkey"))
      .drop("c_custkey")
    assert(store.count() == scratch.count())
    assert(store.exceptAll(scratch).isEmpty && scratch.exceptAll(store).isEmpty)
  }

  test("dim patch: exactly the hex-'b' customers' rows carry the new " +
      "segment; everyone else keeps the original") {
    val store = spark.read.parquet(JoinIvm.maintainedDir(spark, sf0001))
    val hit = substring(md5(col("o_custkey").cast("string")), 1, 1)
      .===(JoinIvm.DimHex)
    assert(store.filter(hit && col("c_mktsegment") =!= "RESEGMENTED")
      .count() == 0)
    assert(store.filter(!hit && col("c_mktsegment") === "RESEGMENTED")
      .count() == 0)
    assert(store.filter(col("c_mktsegment") === "RESEGMENTED").count() > 0,
      "vacuous dim delta")
  }

  test("chop-invariance: the stream-maintained store equals the " +
      "batch-maintained store row-for-row, across > 1 micro-batch") {
    val root = JoinIvm.streamedViewDir(spark, sf0001)
    // the feed's 3 files at 2 per trigger must give 2 micro-batches —
    // a single batch would make the chop vacuous
    val versions = new java.io.File(s"$root/view").listFiles
      .map(_.getName).count(_.matches("v\\d+"))
    assert(versions >= 2, s"chop vacuous: $versions micro-batch(es)")
    val streamed = spark.read.parquet(s"$root/final")
    val batch = spark.read.parquet(JoinIvm.maintainedDir(spark, sf0001))
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).isEmpty &&
      batch.exceptAll(streamed).isEmpty)
  }
}

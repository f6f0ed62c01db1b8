package graft

import org.apache.spark.sql.functions._
import graft.operators.Wap

/** Write-audit-publish: only the zero-violation candidate goes live,
  * the failing candidate is rolled back invisibly, and the audit log
  * carries the verdicts. */
class WapSpec extends SparkSpec {

  test("the clean candidate publishes, the dirty one rolls back, and " +
      "no poisoned byte is ever visible") {
    val st = Wap.state(spark, sf0001)
    assert(st.stagingGone, "dirty staging dir survived its rollback")
    val pub = spark.read.parquet(st.publishedDir)
    // content parity with the source table
    assert(pub.count() == Tables(spark, sf0001, "orders").count())
    // the poison never reached the published table
    assert(pub.filter(col("o_orderpriority") === "0-POISON").count() == 0)
    assert(pub.filter(col("o_orderkey").isNull).count() == 0)
    // no duplicate keys either
    assert(pub.groupBy(col("o_orderkey")).count()
      .filter(col("count") > 1).count() == 0)
  }

  test("audit log: clean all-zero and published; dirty fires every " +
      "constraint class exactly once and is not published") {
    val log = Wap.ordersWapAuditLog(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getBoolean(3)))
    assert(log.length == 8)
    val clean = log.filter(_._1 == "clean")
    assert(clean.forall(r => r._3 == 0L && r._4),
      s"clean candidate dirty: ${clean.toSeq}")
    val dirty = log.filter(_._1 == "dirty")
    assert(dirty.forall(r => r._3 == 1L && !r._4),
      s"dirty counts off: ${dirty.toSeq}")
    assert(dirty.map(_._2).sorted.toSeq == Seq("date_in_range",
      "key_not_null", "key_unique", "price_positive"))
  }
}

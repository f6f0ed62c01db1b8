package graft

import java.sql.Date
import org.apache.spark.sql.functions._
import graft.operators.Scd

/** SCD2 merge invariants on sf0.001 — the version algebra is asserted
  * structurally (interval partition, single-current, no-op rows), not
  * by re-running the merge's own joins. */
class ScdSpec extends SparkSpec {

  private lazy val dim = Scd.scd2Dim(spark, sf0001).collect()
  private val eff = Date.valueOf("1998-06-01")
  private val openEnd = Date.valueOf("9999-12-31")
  private val base = Date.valueOf("1992-01-01")

  private def key(r: org.apache.spark.sql.Row) = r.getLong(0)
  private def vFrom(r: org.apache.spark.sql.Row) = r.getDate(5)
  private def vTo(r: org.apache.spark.sql.Row) = r.getDate(6)
  private def cur(r: org.apache.spark.sql.Row) = r.getBoolean(7)

  test("every key has exactly one current version; at most two versions") {
    val byKey = dim.groupBy(key)
    assert(byKey.nonEmpty)
    byKey.foreach { case (k, vs) =>
      assert(vs.count(cur) == 1, s"key $k current-count")
      assert(vs.length <= 2, s"key $k version-count")
    }
  }

  test("two-version keys partition time: closed ends where the new opens") {
    val twoV = dim.groupBy(key).filter(_._2.length == 2)
    assert(twoV.nonEmpty)
    twoV.foreach { case (k, vs) =>
      val closed = vs.find(!cur(_)).get
      val open = vs.find(cur).get
      assert(vFrom(closed) == base && vTo(closed) == eff, s"key $k closed")
      assert(vFrom(open) == eff && vTo(open) == openEnd, s"key $k open")
    }
  }

  test("no-op batch rows (odd, non-mod-3 keys in the batch class) stay single-version") {
    val noop = dim.map(key).distinct
      .filter(k => k < 10000000L && k % 10 < 4 && k % 3 != 0 && k % 2 != 0)
    assert(noop.nonEmpty)
    noop.foreach { k =>
      val vs = dim.filter(r => key(r) == k)
      assert(vs.length == 1 && vFrom(vs.head) == base, s"key $k rewritten")
    }
  }

  test("inserted keys exist only as post-effective versions") {
    val inserted = dim.filter(r => key(r) >= 10000000L)
    assert(inserted.nonEmpty)
    inserted.foreach { r =>
      assert(cur(r) && vFrom(r) == eff, s"key ${key(r)}")
    }
  }

  test("merge is idempotent under re-derivation and as-of reads bracket it") {
    val again = Scd.scd2Dim(spark, sf0001).collect()
    assert(again.map(_.toString).sorted.sameElements(dim.map(_.toString).sorted))
    val asof = Scd.scd2AsofCounts(spark, sf0001).collect()
    val nBase = Tables(spark, sf0001, "customer").count()
    // pre-merge read = exactly the base dimension; post-merge read =
    // base + inserts (one current row per key either way)
    val nIns = dim.count(r => key(r) >= 10000000L)
    assert(asof.find(_.getDate(0) == Date.valueOf("1995-06-01")).get.getLong(1) == nBase)
    assert(asof.find(_.getDate(0) == Date.valueOf("1999-01-01")).get.getLong(1) == nBase + nIns)
  }

  test("PIT join: every order hits exactly one version; the leaky " +
      "current-slice join provably differs") {
    import org.apache.spark.sql.functions._
    val pit = Scd.pitRevenueBySegment(spark, sf0001).collect()
    val nOrders = Tables(spark, sf0001, "orders").count()
    assert(pit.map(_.getLong(2)).sum == nOrders,
      "validity intervals must partition time per key")
    // temporal correctness: MIGRATED existed only from the merge date
    pit.filter(_.getString(0) == "MIGRATED")
      .foreach(r => assert(r.getBoolean(1), s"pre-merge MIGRATED leak: $r"))
    assert(pit.exists(r => r.getString(0) == "MIGRATED" && r.getBoolean(1)),
      "post-merge MIGRATED rows must exist or the PIT grade is vacuous")
    // the LEAKY form: join facts to the CURRENT slice instead — it
    // backdates migrated segments onto pre-merge orders
    val cur = Scd.scd2Dim(spark, sf0001).filter(col("is_current"))
    val o = Tables(spark, sf0001, "orders")
    val leaky = o.join(cur, o("o_custkey") === cur("c_custkey"))
      .filter(col("c_mktsegment") === "MIGRATED" &&
        to_date(col("o_orderdate")) < to_date(lit("1998-06-01")))
      .count()
    assert(leaky > 0, "leak scenario vacuous at this SF")
  }

  test("bitemporal read: tx 1 knows nothing of the merge; tx 2 ≡ the PIT join") {
    val bi = Scd.bitemporalRevenue(spark, sf0001).collect()
    val tx1 = bi.filter(_.getLong(0) == 1L)
    val tx2 = bi.filter(_.getLong(0) == 2L)
    // the earlier transaction must not believe in post-merge segments
    assert(tx1.nonEmpty)
    assert(!tx1.exists(r => Set("MIGRATED", "NEWSEG")(r.getString(1))),
      "tx-1 snapshot leaked merge-written segments")
    // both snapshots cover every order exactly once
    val nOrders = Tables(spark, sf0001, "orders").count()
    assert(tx1.map(_.getLong(3)).sum == nOrders)
    assert(tx2.map(_.getLong(3)).sum == nOrders)
    // as-of the merge transaction, bitemporal ≡ the valid-time PIT join
    val pit = Scd.pitRevenueBySegment(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getBoolean(1), r.getLong(2), r.getDouble(3)))
    val tx2t = tx2.map(r =>
      (r.getString(1), r.getBoolean(2), r.getLong(3), r.getDouble(4)))
    assert(tx2t.sorted.toSeq == pit.sorted.toSeq)
  }
}

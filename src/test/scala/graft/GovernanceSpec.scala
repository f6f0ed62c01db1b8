package graft

import org.apache.spark.sql.functions._
import graft.operators.Governance

/** Access governance (operators/Governance): the RLS view must be a
  * zero-cost fence — the tenant filter AND the reader's own predicate
  * both reach the scan as pushed filters — and masking must be a pure
  * projection that still lets column pruning through. */
class GovernanceSpec extends SparkSpec {

  test("RLS: tenant filter and reader predicate BOTH push into the scan") {
    val df = Governance.rlsTenantRevenue(spark, sf0001)
    df.collect() // resolve AQE final plan
    val scans = fileScans(df.queryExecution.executedPlan)
    val custScan = scans.find(_.metadata.get("Location")
      .exists(_.contains("customer"))).getOrElse(
      fail("no customer scan found"))
    val pushed = custScan.metadata.getOrElse("PushedFilters", "")
    assert(pushed.contains("c_nationkey"),
      s"tenant fence not pushed: $pushed")
    assert(pushed.contains("c_acctbal"),
      s"reader predicate not pushed through the view: $pushed")
  }

  test("RLS: the view never leaks another tenant's rows") {
    val secured = Governance.tenantCustomerView(spark, sf0001, 7)
    assert(secured.filter(col("c_nationkey") =!= 7).count() == 0)
    assert(secured.count() > 0, "tenant 7 empty — fence untestable")
  }

  test("masking: a projection only — column pruning reaches the scan") {
    val df = Governance.maskedCustomerPreview(spark, sf0001)
    df.collect()
    val scans = fileScans(df.queryExecution.executedPlan)
    assert(scans.nonEmpty)
    val read = scans.head.metadata.getOrElse("ReadSchema", "")
    // masks are derived from exactly these columns; nothing else read
    Seq("c_custkey", "c_name", "c_acctbal", "c_mktsegment").foreach(c =>
      assert(read.contains(c), s"$c missing from ReadSchema: $read"))
    assert(!read.contains("c_nationkey"),
      s"pruning failed — unmasked column read: $read")
  }

  test("masks are deterministic and non-invertible-by-prefix") {
    val rows = Governance.maskedCustomerPreview(spark, sf0001).collect()
    rows.foreach { r =>
      val m = r.getString(1)
      assert(m.matches(".*#[0-9a-f]{6}$"), s"mask shape broken: $m")
      assert(r.getLong(2) % 100 == 0, "balance bucket not coarsened")
    }
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.operators.Subqueries

/** r9 TPC-H shapes: Q19's per-side OR-of-ANDs pushdown, Q18's
  * group-having semi decorrelation, Q15's kept-ties max-over-view. */
class TpchShapesSpec extends SparkSpec {

  private def residualSubqueries(df: org.apache.spark.sql.DataFrame): Int = {
    var n = 0
    df.queryExecution.optimizedPlan.foreach { node =>
      node.expressions.foreach(_.foreach {
        case _: org.apache.spark.sql.catalyst.expressions.SubqueryExpression =>
          n += 1
        case _ => ()
      })
    }
    n
  }

  test("Q19 shape: the common-factor disjunctions push BELOW the join " +
      "into both scans") {
    val df = Subqueries.bandedBrandRevenue(spark, sf0001)
    df.collect()
    val scans = fileScans(df.queryExecution.executedPlan)
      .map(s => s.relation.location.rootPaths.mkString(",") ->
        s.metadata.getOrElse("PushedFilters", ""))
    val li = scans.collectFirst {
      case (p, f) if p.contains("lineitem.parquet") => f }.get
    val pt = scans.collectFirst {
      case (p, f) if p.contains("part.parquet") => f }.get
    // the lineitem side carries the OR of the three quantity bands —
    // evaluated at the scan, not above the join
    assert(li.contains("Or(") && li.contains("l_quantity"),
      s"quantity disjunction not pushed to the fact scan: $li")
    // the part side carries the brand/size disjunction
    assert(pt.contains("Or(") && pt.contains("p_brand"),
      s"brand disjunction not pushed to the dim scan: $pt")
  }

  test("Q18 shape: the group-having IN decorrelates to a semi join; " +
      "every kept order really exceeds the threshold") {
    val df = Subqueries.largeVolumeCustomers(spark, sf0001)
    assert(residualSubqueries(df) == 0,
      "the grouped-having IN must become aggregate -> semi join")
    val rows = df.collect()
    assert(rows.nonEmpty, "threshold selects nothing — vacuous")
    assert(rows.forall(_.getLong(3) > 30000L))
    // completeness: brute recount of qualifying orders
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val expect = li.groupBy(col("l_orderkey"))
      .agg(sum((col("l_quantity").cast("decimal(18,2)") * 100)
        .cast("bigint")).as("q"))
      .filter(col("q") > 30000L).count()
    assert(rows.length.toLong == expect)
  }

  test("Q15 shape: the max-over-view keeps ALL tied suppliers; the " +
      "scalar max stays UNCORRELATED (executes once, not per row)") {
    val df = Subqueries.topSupplierRevenue(spark, sf0001)
    // an uncorrelated scalar subquery is the RIGHT plan — one
    // execution, result broadcast as a literal; what must not exist
    // is a correlated one (per-row re-execution)
    var correlated = 0
    df.queryExecution.optimizedPlan.foreach { node =>
      node.expressions.foreach(_.foreach {
        case s: org.apache.spark.sql.catalyst.expressions.SubqueryExpression
            if s.getOuterAttrs.nonEmpty => correlated += 1
        case _ => ()
      })
    }
    assert(correlated == 0)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // every returned supplier attains the view's global max (brute)
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .filter(col("l_shipdate").cast("date") >= lit("1996-01-01") &&
        col("l_shipdate").cast("date") < lit("1996-04-01"))
      .groupBy(col("l_suppkey"))
      .agg(sum((col("l_extendedprice").cast("decimal(18,2)") * 100)
          .cast("bigint")
        * (lit(100) - (col("l_discount").cast("decimal(4,2)") * 100)
          .cast("bigint"))).as("r"))
    val mx = li.agg(max(col("r"))).head().getLong(0)
    val tied = li.filter(col("r") === mx).count()
    assert(rows.length.toLong == tied)
    assert(rows.forall(_.getLong(2) == mx))
    // ordering contract: ascending supplier key
    val keys = rows.map(_.getLong(0))
    assert(keys.sameElements(keys.sorted))
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.operators.{Subqueries, TpchShapes}

/** r9 TPC-H shapes: Q19's per-side OR-of-ANDs pushdown, Q18's
  * group-having semi decorrelation, Q15's kept-ties max-over-view —
  * plus the matrix-closing rest (Q3/Q4/Q6/Q8/Q9/Q10/Q11/Q12/Q13/Q14/
  * Q16/Q20 in operators/TpchShapes): each test pins the shape's
  * plan-defining behavior, not just its rows. */
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

  test("Q4 shape: the late-lineitem EXISTS decorrelates to one semi " +
      "join; counts match a brute recount") {
    val df = TpchShapes.priorityOrderCheck(spark, sf0001)
    assert(residualSubqueries(df) == 0,
      "EXISTS over the fact must become a semi join")
    val rows = df.collect()
    assert(rows.nonEmpty, "window + lateness select nothing — vacuous")
    val o = spark.read.parquet(s"$sf0001/orders.parquet")
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val late = li.join(o, li("l_orderkey") === o("o_orderkey"))
      .filter(unix_micros(col("l_shipdate").cast("timestamp")) -
        unix_micros(col("o_orderdate").cast("timestamp")) > 5184000000000L)
      .select(col("l_orderkey")).distinct()
    val expect = o.filter(col("o_orderdate").cast("date") >= lit("1997-01-01")
        && col("o_orderdate").cast("date") < lit("1997-07-01"))
      .join(late, o("o_orderkey") === late("l_orderkey"), "left_semi")
      .count()
    assert(rows.map(_.getLong(1)).sum == expect)
  }

  test("Q6 shape: ALL predicates reach the parquet scan as " +
      "PushedFilters — no cast wrapper forfeits a scan filter") {
    val df = TpchShapes.forecastRevenue(spark, sf0001)
    df.collect()
    val scans = fileScans(df.queryExecution.executedPlan)
    assert(scans.size == 1, "Q6 is a single-scan query")
    val pushed = scans.head.metadata.getOrElse("PushedFilters", "")
    for (c <- Seq("l_shipdate", "l_discount", "l_quantity"))
      assert(pushed.contains(c), s"$c predicate not pushed: $pushed")
    // and it selected a non-trivial, non-empty slice
    val n = df.collect().head.getLong(1)
    assert(n > 0)
  }

  test("Q16 shape: the NOT IN plans as ONE anti join and the " +
      "exclusion is non-vacuous") {
    val df = TpchShapes.supplierCensus(spark, sf0001)
    assert(residualSubqueries(df) == 0, "NOT IN must become an anti join")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("anti"),
      "expected an anti join in the physical plan")
    val excluded = spark.read.parquet(s"$sf0001/supplier.parquet")
      .filter(col("s_acctbal") < 2000).count()
    assert(excluded > 0, "exclusion class empty — the anti join is vacuous")
    assert(df.collect().nonEmpty)
  }

  test("Q20 shape: the IN over the two aggregate views decorrelates; " +
      "every kept supplier really grew 2x on some promo part") {
    val df = TpchShapes.growthSuppliers(spark, sf0001)
    assert(residualSubqueries(df) == 0)
    val rows = df.collect()
    assert(rows.nonEmpty, "growth threshold selects nobody — vacuous")
    // brute: per (supp, part) promo cents-qty by year window
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val promo = spark.read.parquet(s"$sf0001/part.parquet")
      .filter(col("p_type") === "PROMO").select(col("p_partkey"))
    def shipped(y0: String, y1: String) =
      li.join(promo, li("l_partkey") === promo("p_partkey"))
        .filter(col("l_shipdate").cast("date") >= lit(y0) &&
          col("l_shipdate").cast("date") < lit(y1))
        .groupBy(col("l_suppkey"), col("l_partkey"))
        .agg(sum((col("l_quantity").cast("decimal(18,2)") * 100)
          .cast("bigint")).as("q"))
    val grown = shipped("1997-01-01", "1998-01-01").as("a")
      .join(shipped("1996-01-01", "1997-01-01").as("b"),
        Seq("l_suppkey", "l_partkey"))
      .filter(col("a.q") > lit(2) * col("b.q"))
      .select(col("l_suppkey")).distinct().count()
    assert(rows.length.toLong == grown)
  }

  test("Q8/Q14 shares: exact-ppm invariants hold (0 <= share <= 1e6, " +
      "west/promo mass never exceeds the total)") {
    val q8 = TpchShapes.marketShare(spark, sf0001).collect()
    assert(q8.nonEmpty)
    q8.foreach { r =>
      assert(r.getLong(1) >= 0 && r.getLong(1) <= r.getLong(2))
      assert(r.getLong(3) >= 0 && r.getLong(3) <= 1000000L)
    }
    val q14 = TpchShapes.promoShare(spark, sf0001).collect()
    assert(q14.length == 1)
    assert(q14.head.getLong(0) <= q14.head.getLong(1))
    assert(q14.head.getLong(2) >= 0 && q14.head.getLong(2) <= 1000000L)
  }

  test("Q11 shape: the global scalar stays UNCORRELATED, each arm " +
      "scans the fact exactly once, and the HAVING matches a brute " +
      "recount") {
    import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
    import org.apache.spark.sql.execution.datasources.{
      HadoopFsRelation, LogicalRelation}
    def liScans(p: LogicalPlan): Int = {
      var n = 0
      p.foreach {
        case lr: LogicalRelation => lr.relation match {
          case fs: HadoopFsRelation if fs.location.rootPaths
            .exists(_.toString.contains("lineitem")) => n += 1
          case _ => ()
        }
        case _ => ()
      }
      n
    }
    val df = TpchShapes.importantParts(spark, sf0001)
    var correlated = 0
    var subPlans = List.empty[LogicalPlan]
    df.queryExecution.optimizedPlan.foreach { node =>
      node.expressions.foreach(_.foreach {
        case s: org.apache.spark.sql.catalyst.expressions.SubqueryExpression =>
          if (s.getOuterAttrs.nonEmpty) correlated += 1
          subPlans ::= s.plan
        case _ => ()
      })
    }
    assert(correlated == 0,
      "the HAVING threshold must not re-execute per group")
    assert(subPlans.length == 1,
      s"expected ONE global scalar subquery, got ${subPlans.length}")
    assert(liScans(df.queryExecution.optimizedPlan) == 1 &&
      liScans(subPlans.head) == 1,
      "each arm must aggregate the fact exactly once")
    // brute recount of the cross-multiplied HAVING
    val value = spark.read.parquet(s"$sf0001/lineitem.parquet").as("l")
      .join(spark.read.parquet(s"$sf0001/supplier.parquet")
        .filter(col("s_nationkey") < 12).as("s"),
        col("l.l_suppkey") === col("s.s_suppkey"))
      .groupBy(col("l_partkey"))
      .agg(sum((col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("bigint")).as("v"))
    val total = value.agg(sum(col("v"))).head().getLong(0)
    val expect = value.filter(col("v") * 10000 > total * 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expect)
  }

  test("Q3 shape: the segment filter reaches the customer scan and " +
      "the LIMIT plans as a top-k (TakeOrderedAndProject), never a " +
      "global sort") {
    val df = TpchShapes.shippingPriority(spark, sf0001)
    assert(df.collect().length == 10)
    val plan = df.queryExecution.executedPlan
    assert(plan.toString.contains("TakeOrderedAndProject"),
      "ORDER BY + LIMIT 10 must plan as a streaming top-k")
    val cust = fileScans(plan).collectFirst {
      case s if s.relation.location.rootPaths.mkString(",")
        .contains("customer.parquet") =>
        s.metadata.getOrElse("PushedFilters", "")
    }.get
    assert(cust.contains("c_mktsegment"),
      s"segment equality not pushed to the dim scan: $cust")
  }

  test("Q13 shape: the distribution's total mass is the customer " +
      "count (preserved rows land in a bucket, never drop)") {
    val rows = TpchShapes.orderCountDistribution(spark, sf0001).collect()
    val custs = spark.read.parquet(s"$sf0001/customer.parquet").count()
    assert(rows.map(_.getLong(1)).sum == custs)
    // at least two distinct order-count buckets, or the shape is
    // degenerate on this corpus
    assert(rows.length >= 2)
  }
}

package graft

import org.apache.spark.sql.catalyst.expressions.SubqueryExpression
import graft.operators.Subqueries

/** Correlated subqueries (operators/Subqueries): the contract under
  * test is DECORRELATION — the optimized plan must carry no residual
  * subquery expression (each would re-execute per outer row at scale),
  * and the decorrelated plans must compute the stated semantics. */
class SubqueriesSpec extends SparkSpec {

  private def residualSubqueries(
      df: org.apache.spark.sql.DataFrame): Int = {
    var n = 0
    df.queryExecution.optimizedPlan.foreach { node =>
      node.expressions.foreach(_.foreach {
        case _: SubqueryExpression => n += 1
        case _ => ()
      })
    }
    n
  }

  test("Q17 shape: scalar-subquery pair decorrelates to one aggregate join") {
    val df = Subqueries.smallQtyRevenue(spark, sf0001)
    assert(residualSubqueries(df) == 0,
      "correlated scalar subqueries must decorrelate")
    // the below-20%-of-average screen keeps a strict subset
    val kept = df.selectExpr("sum(n_items)").head().getLong(0)
    val total = spark.read.parquet(s"$sf0001/lineitem.parquet").count()
    assert(kept > 0 && kept < total)
  }

  test("Q2 shape: correlated min decorrelates; rows are exactly the per-part argmins") {
    val df = Subqueries.minPricePerPart(spark, sf0001)
    assert(residualSubqueries(df) == 0)
    val rows = df.collect()
    // one result group per distinct part, each row carrying its
    // part's global minimum (re-derived independently via a window)
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .withColumn("price_cents",
        (col("l_extendedprice").cast("decimal(18,2)") * 100)
          .cast("bigint"))
    val expected = li
      .withColumn("mn",
        min(col("price_cents")).over(
          Window.partitionBy(col("l_partkey"))))
      .filter(col("price_cents") === col("mn"))
      .count()
    assert(rows.length.toLong == expected)
    assert(rows.map(_.getLong(0)).distinct.length ==
      li.select("l_partkey").distinct().count().toInt)
  }

  test("Q21 shape: EXISTS/NOT-EXISTS with outer-date correlation decorrelates") {
    val df = Subqueries.waitingSuppliers(spark, sf0001)
    assert(residualSubqueries(df) == 0,
      "EXISTS/NOT EXISTS must become semi/anti joins")
    val rows = df.collect()
    assert(rows.nonEmpty)
    // numwait is a positive count and the ordering contract holds
    assert(rows.forall(_.getLong(1) > 0))
    val waits = rows.map(_.getLong(1))
    assert(waits.zip(waits.tail).forall { case (a, b) => a >= b })
  }

  test("Q22 shape: scalar-average filter + NOT EXISTS decorrelates; " +
    "census matches a brute recount") {
    val df = Subqueries.dormantRichCustomers(spark, sf0001)
    assert(residualSubqueries(df) == 0,
      "the scalar aggregate and NOT EXISTS must both decorrelate")
    val rows = df.collect().map(r =>
      (r.getAs[Number](0).longValue, r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty, "dormancy window selects nobody — vacuous")
    // brute recount
    import org.apache.spark.sql.functions._
    val cust = Tables(spark, sf0001, "customer")
      .select(col("c_custkey"), col("c_nationkey"),
        (col("c_acctbal").cast("decimal(18,2)") * 100).cast("long"))
      .collect().map(r => (r.getLong(0),
        r.getAs[Number](1).longValue, r.getLong(2)))
    val recent = Tables(spark, sf0001, "orders")
      .filter(to_date(col("o_orderdate")) >= lit("2001-05-01").cast("date"))
      .select("o_custkey").distinct().collect().map(_.getLong(0)).toSet
    val pos = cust.filter(_._3 > 0)
    val (s, n) = (pos.map(_._3).sum, pos.length.toLong)
    val expect = cust
      .filter(c => c._3 * n > s && !recent(c._1))
      .groupBy(_._2).map { case (nat, cs) =>
        (nat, cs.length.toLong, cs.map(_._3).sum)
      }.toSet
    assert(rows.toSet == expect, "Q22 census drifted from brute recount")
  }

  test("Q7 shape: both trade directions present every year, revenue " +
    "mass matches the direction-blind cross-border total") {
    import org.apache.spark.sql.functions._
    val rows = Subqueries.volumeShipping(spark, sf0001).collect()
      .map(r => ((r.getString(0), r.getString(1), r.getInt(2)),
        r.getLong(3)))
    assert(rows.nonEmpty)
    // exactly the two cross-block directions appear
    assert(rows.map(x => (x._1._1, x._1._2)).distinct.toSet ==
      Set(("EAST", "WEST"), ("WEST", "EAST")))
    // direction-blind recount of the cross-border revenue mass
    val total = Tables(spark, sf0001, "lineitem").as("l")
      .join(Tables(spark, sf0001, "orders").as("o"),
        col("o.o_orderkey") === col("l.l_orderkey"))
      .join(Tables(spark, sf0001, "customer").as("c"),
        col("c.c_custkey") === col("o.o_custkey"))
      .join(Tables(spark, sf0001, "supplier").as("s"),
        col("s.s_suppkey") === col("l.l_suppkey"))
      .filter((col("s.s_nationkey") < 12) =!= (col("c.c_nationkey") < 12))
      .agg(sum((col("l.l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long"))).first().getLong(0)
    assert(rows.map(_._2).sum == total, "cross-border mass leaked")
  }
}

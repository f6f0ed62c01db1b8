package graft

import org.apache.spark.sql.functions._
import graft.operators.Paging

/** Keyset pagination: page 3 equals rows 41–60 of the total order,
  * the tie-break key is non-vacuous (duplicate dates straddle pages),
  * and the page plans as filter + top-k, not a global sort. */
class PagingSpec extends SparkSpec {

  private def epochMicros(v: Any): Long = v match {
    case t: java.sql.Timestamp => t.getTime * 1000L
    case d: java.time.LocalDateTime =>
      d.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + d.getNano / 1000L
    case i: java.time.Instant =>
      i.getEpochSecond * 1000000L + i.getNano / 1000L
  }

  test("keyset page 3 equals rows 41-60 of the totally ordered frame") {
    val all = Tables(spark, sf0001, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      .collect()
      .sortBy(r => (epochMicros(r.get(2)), r.getLong(0)))
    val want = all.slice(40, 60).map(_.toString).toSeq
    val got = Paging.ordersPageKeyset(spark, sf0001)
      .collect().map(_.toString).toSeq
    assert(got == want)
  }

  test("the tie-break key is load-bearing: duplicate dates exist, and one " +
      "straddles a page boundary in this order") {
    val all = Tables(spark, sf0001, "orders")
      .select(col("o_orderdate"), col("o_orderkey")).collect()
      .sortBy(r => (epochMicros(r.get(0)), r.getLong(1)))
    val dates = all.map(r => epochMicros(r.get(0)))
    assert(dates.distinct.length < dates.length,
      "no duplicate order dates — the tie-break pin is vacuous")
    // date-only sort would leave SOME page boundary ambiguous: a date
    // appears on both sides of a 20-row boundary somewhere
    val boundaries = (20 to all.length - 1 by 20)
    assert(boundaries.exists(b => dates(b - 1) == dates(b)),
      "no duplicate date straddles any page boundary — pin vacuous")
  }

  test("the page plans as TakeOrderedAndProject over a filtered scan — " +
      "no global sort of the fact") {
    val plan = Paging.ordersPageKeyset(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected a top-k plan, got:\n$plan")
    assert(!plan.contains("ExternalSort") && !plan.contains("GlobalSort"),
      "the page fell back to a global sort")
  }
}

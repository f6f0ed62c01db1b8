package graft

import java.time.LocalDate
import graft.operators.Sweepline

/** Sweep-line interval concurrency: both graded queries checked
  * against a brute-force day-by-day count over the collected
  * intervals (too simple to be wrong), including the carry-in months
  * and the half-open [orderdate, maxship) convention. */
class SweeplineSpec extends SparkSpec {

  private lazy val intervals: Seq[(LocalDate, LocalDate)] = {
    import org.apache.spark.sql.functions._
    val o = Tables(spark, sf0001, "orders")
      .select(col("o_orderkey"), to_date(col("o_orderdate")).as("s"))
    val e = Tables(spark, sf0001, "lineitem")
      .groupBy(col("l_orderkey")).agg(max(to_date(col("l_shipdate"))).as("e"))
    o.join(e, o("o_orderkey") === e("l_orderkey"))
      .filter(col("e") > col("s")) // well-formed only (operator contract)
      .select("s", "e").collect()
      .map(r => (r.getDate(0).toLocalDate, r.getDate(1).toLocalDate)).toSeq
  }

  /** level(day) = |{intervals with s ≤ day < e}| (half-open). */
  private def level(day: LocalDate): Long =
    intervals.count(iv => !iv._1.isAfter(day) && iv._2.isAfter(day)).toLong

  private def eventDays: Seq[LocalDate] =
    intervals.flatMap(iv => Seq(iv._1, iv._2)).distinct.sorted

  test("monthly peak ≡ brute-force max over all days (carry-in included)") {
    val got = Sweepline.openOrdersPeak(spark, sf0001).collect()
      .map(r => r.getDate(0).toLocalDate -> r.getLong(1)).toMap
    assert(got.nonEmpty)
    // brute force: max level over every spine day of each month —
    // level(day) counts intervals covering the day, so carried-in
    // plateaus are observed on the days they cover
    val lo = eventDays.head
    val hi = eventDays.last
    val months = Iterator.iterate(lo.withDayOfMonth(1))(_.plusMonths(1))
      .takeWhile(!_.isAfter(hi)).toSeq
    assert(got.keySet == months.toSet)
    months.foreach { m =>
      val days = (0 until m.lengthOfMonth).map(i => m.plusDays(i))
        .filter(d => !d.isBefore(lo) && !d.isAfter(hi))
      val brute = days.map(level).max
      assert(got(m) == brute, s"month $m: got ${got(m)} brute $brute")
    }
  }

  test("monthly time-weighted average ≡ brute-force integer day sum") {
    val got = Sweepline.openOrdersTwa(spark, sf0001).collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty)
    val lo = eventDays.head
    val hi = eventDays.last
    got.foreach { case (m, nDays, ppm) =>
      val days = (0 until m.lengthOfMonth).map(i => m.plusDays(i))
        .filter(d => !d.isBefore(lo) && !d.isAfter(hi))
      assert(nDays == days.size, s"month $m n_days")
      val brute = days.map(level).sum
      assert(ppm == 1000000L * brute / days.size, s"month $m ppm")
    }
  }

  test("half-open convention: a same-day order contributes zero") {
    // pure formula check on the month-peak expression inputs: a date
    // with one start and one end nets max(L, L - e + s) = L either way
    // when L is the carried level — covered implicitly by the brute
    // force above; here assert the sweep frame has no negative levels
    import org.apache.spark.sql.functions._
    val anyNeg = Sweepline.openOrdersTwa(spark, sf0001)
      .filter(col("avg_open_ppm") < 0).count()
    assert(anyNeg == 0)
  }
}

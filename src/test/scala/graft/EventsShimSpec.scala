package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Regression guard for the events ingest shim: the driver has shipped
  * `ts` as both TIMESTAMP(NANOS) (rounds 1–5) and TIMESTAMP(MICROS,
  * isAdjustedToUTC=false) (round 6+), and Spark's schema converter
  * prefers TIMESTAMP_NTZ for unadjusted µs columns — the shim must
  * normalize every generation to the µs TIMESTAMP (LTZ) the graded
  * queries and oracles were built against, in a FRESH JVM with no
  * session conf already set (exactly how a suite JVM starts). */
class EventsShimSpec extends SparkSpec {

  test("events reads as µs TIMESTAMP regardless of source generation") {
    val ev = Tables(spark, sf0001, "events")
    assert(ev.schema("ts").dataType == TimestampType,
      s"ts is ${ev.schema("ts").dataType}")
    assert(ev.count() > 0)
    // a unit misread shows up as a wildly-shifted epoch (ns taken as µs
    // → 1970s; µs taken as ns → year 56k); any sane corpus date passes
    val (lo, hi) = {
      val r = ev.agg(min(col("ts")).cast("date").cast("string"),
        max(col("ts")).cast("date").cast("string")).head()
      (r.getString(0), r.getString(1))
    }
    assert(lo >= "2000-01-01" && hi <= "2100-01-01", s"[$lo, $hi]")
  }
}

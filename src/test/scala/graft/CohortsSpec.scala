package graft

import org.apache.spark.sql.functions._
import graft.operators.{Cohorts, EventOps, Pii}

/** Cohort retention, k-anonymity audit, and the seasonal volume
  * anomaly: accounting identities plus independent recomputes. */
class CohortsSpec extends SparkSpec {

  private lazy val matrix = Cohorts.cohortRetention(spark, sf0001).collect()

  test("offset-0 diagonal is the cohort size, at 100% retention") {
    assert(matrix.nonEmpty)
    matrix.filter(_.getLong(1) == 0L).foreach { r =>
      assert(r.getLong(2) == r.getLong(3), s"diagonal mismatch: $r")
      assert(r.getDouble(4) == 100.0)
    }
  }

  test("cohort sizes partition the customer base with orders") {
    val sizes = matrix.filter(_.getLong(1) == 0L).map(_.getLong(3)).sum
    val buyers = Tables(spark, sf0001, "orders")
      .select("o_custkey").distinct().count()
    assert(sizes == buyers, s"$sizes cohort members vs $buyers buyers")
  }

  test("every cell is bounded by its cohort size and pct consistent") {
    matrix.foreach { r =>
      assert(r.getLong(2) <= r.getLong(3), s"active > cohort: $r")
      val pct = math.floor(
        r.getLong(2) * 100.0 / r.getLong(3) * 100 + 0.5) / 100
      assert(r.getDouble(4) == pct, s"pct mismatch: $r")
    }
  }

  test("k-anonymity: class sizes account for every customer, " +
      "risk set consistent with an independent recompute") {
    val audit = Pii.kAnonymityAudit(spark, sf0001).collect()
    val cust = Tables(spark, sf0001, "customer")
      .select(col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / lit(1000.0)).cast("long").as("b"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    val classes = cust.groupBy(identity).toSeq.map { case (k, v) =>
      (k._1, v.length) }
    val byNation = classes.groupBy(_._1)
    audit.foreach { r =>
      val n = r.getInt(0)
      val cs = byNation(n).map(_._2)
      assert(r.getLong(1) == cs.length, s"n_classes nation $n")
      assert(r.getLong(2) == cs.count(_ < 5), s"n_small nation $n")
      assert(r.getLong(3) == cs.filter(_ < 5).sum, s"at_risk nation $n")
      assert(r.getLong(4) == cs.sum, s"n_rows nation $n")
      assert(r.getLong(5) == cs.min, s"min_class nation $n")
    }
    assert(audit.map(_.getLong(4)).sum == cust.length)
  }

  test("survival risk table: telescoping risk sets, censoring real, " +
      "hazard exact") {
    val t = graft.operators.Cohorts.survivalRiskTable(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val buyers = Tables(spark, sf0001, "orders")
      .select("o_custkey").distinct().count()
    assert(t.head._2 == buyers, "first risk set must be everyone")
    t.sliding(2).foreach {
      case Array((_, n1, d1, c1, _), (_, n2, _, _, _)) =>
        assert(n2 == n1 - d1 - c1, "risk sets must telescope")
      case _ =>
    }
    assert(t.map(x => x._3 + x._4).sum == buyers,
      "every subject leaves exactly once")
    assert(t.map(_._3).sum > 0, "no churn events observed")
    assert(t.map(_._4).sum > 0, "no censoring — the estimator is vacuous")
    t.foreach { case (_, n, d, _, h) =>
      assert(h == 1000000L * d / n, "hazard ppm mismatch") }
  }

  test("volume anomaly: flagged ≡ exact rational z² > (3/2)² " +
      "recomputed with BigInt") {
    val flagged = EventOps.hourlyVolumeAnomaly(spark, sf0001).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1))).toSet
    val cells = Tables(spark, sf0001, "events")
      .groupBy(to_date(col("ts")).as("day"),
        hour(col("ts")).cast("long").as("hr"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("wd", weekday(col("day")))
      .collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        r.getInt(3)))
    val base = cells.groupBy(c => (c._4, c._2)).map { case (k, v) =>
      k -> (BigInt(v.length), v.map(c => BigInt(c._3)).sum,
        v.map(c => BigInt(c._3) * BigInt(c._3)).sum)
    }
    val expect = cells.filter { case (_, hr, cnt, wd) =>
      val (n, s, ss) = base((wd, hr))
      val dd = BigInt(cnt) * n - s
      n >= 3 && 4 * dd * dd > 9 * (n * ss - s * s)
    }.map(c => (c._1, c._2)).toSet
    assert(flagged == expect)
    assert(flagged.nonEmpty, "vacuous anomaly query at sf0.001")
  }

  test("global-window frames stay catalog-sized (r7 ADVICE lint: the " +
      "single-partition windows are safe only while their inputs are " +
      "lifetime-/bucket-granularity — pin the bound so growth is loud)") {
    // survival: the cumulative + total windows run over the
    // lifetime-granularity rollup — bounded by the corpus's day span,
    // never by subject count
    val lifetimes = graft.operators.Cohorts
      .survivalRiskTable(spark, sf0001).count()
    assert(lifetimes <= 5000,
      s"survival window frame grew to $lifetimes rows — repartition it")
    // concentration: the bucket-offset window sees one row per bucket
    val deciles = graft.operators.Concentration
      .spendDeciles(spark, sf0001).count()
    assert(deciles <= 10)
  }
}

package graft

import graft.operators.Stats

/** Deterministic second-moment statistics (Stats). */
class StatsSpec extends SparkSpec {

  test("corr_stats: one row per returnflag, corr in [-1,1], stddevs positive") {
    val rows = Stats.corrStats(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val corr = r.getDouble(2)
      assert(corr >= -1.0 && corr <= 1.0, s"corr $corr")
      assert(r.getDouble(4) > 0.0 && r.getDouble(5) > 0.0)
    }
  }

  test("corr_stats: agrees with Spark's built-in corr to float tolerance") {
    import org.apache.spark.sql.functions._
    val ours = Stats.corrStats(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    val builtin = Tables(spark, sf0001, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(corr(col("l_extendedprice"), col("l_quantity")).as("c"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    ours.foreach { case (k, v) =>
      assert(math.abs(v - builtin(k)) < 1e-6, s"$k: $v vs ${builtin(k)}")
    }
  }

  test("chi2: cells partition the corpus, expected margins match observed") {
    import org.apache.spark.sql.functions._
    val cells = Stats.chi2Cells(spark, sf0001).collect()
    val total = Tables(spark, sf0001, "documents").count()
    assert(cells.map(_.getAs[Long]("n_obs")).sum == total)
    // per-row: E > 0 and contribution consistent with (O-E)^2/E
    cells.foreach { r =>
      val o = r.getAs[Long]("n_obs").toDouble
      val e = r.getAs[Double]("n_exp")
      val c = r.getAs[Double]("contrib")
      assert(e > 0.0)
      assert(math.abs(c - (o - e) * (o - e) / e) < 0.01, s"$r")
    }
    val stat = Stats.chi2Stat(spark, sf0001).collect()(0)
    assert(stat.getAs[Long]("n_cells") == cells.length)
    assert(stat.getAs[Double]("chi2") >= 0.0)
    val dof = stat.getAs[Long]("dof")
    val ns = cells.map(_.getString(0)).distinct.length
    val nl = cells.map(_.getString(1)).distinct.length
    assert(dof == (ns - 1).toLong * (nl - 1))
  }

  test("corr_stats: deterministic across shuffle-partition settings") {
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    val a = Stats.corrStats(spark, sf0001).collect().map(_.toString).toSeq
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val b = Stats.corrStats(spark, sf0001).collect().map(_.toString).toSeq
      assert(a == b)
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }

  test("value_trend_ols: agrees with a driver-side least-squares " +
    "recompute; partition-invariant") {
    import org.apache.spark.sql.functions._
    val rows = Stats.valueTrendOls(spark, sf0001).collect()
    assert(rows.nonEmpty)
    // driver-side recompute from raw (x, y) pairs per type
    val raw = Tables(spark, sf0001, "events")
      .select(col("event_type"),
        expr("(unix_micros(ts) - 1704067200000000) div 86400000000")
          .cast("double").as("x"),
        col("value").as("y"))
      .collect()
      .groupBy(_.getString(0))
    rows.foreach { r =>
      val pts = raw(r.getString(0)).map(p => (p.getDouble(1), p.getDouble(2)))
      val n = pts.length.toDouble
      val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
      val sxy = pts.map(p => p._1 * p._2).sum
      val sxx = pts.map(p => p._1 * p._1).sum
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      assert(math.abs(r.getAs[Double]("slope_per_day") - slope) < 1e-4,
        s"${r.getString(0)}: ${r.getAs[Double]("slope_per_day")} vs $slope")
      val r2 = r.getAs[Double]("r2")
      assert(r2 >= 0.0 && r2 <= 1.0, s"r2 $r2")
      assert(r.getAs[Long]("n_events") == pts.length.toLong)
    }
    // exact-decimal moments ⇒ bit-stable under a different partitioning
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "5")
      val again = Stats.valueTrendOls(spark, sf0001)
        .collect().map(_.toString).toSeq
      assert(rows.map(_.toString).toSeq == again)
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }

  test("winsorized mean: fences, clamp counts and micro-cent means equal " +
      "a driver-side recompute under the disc member-value definition") {
    import org.apache.spark.sql.functions.col
    val cents = Tables(spark, sf0001, "orders")
      .selectExpr("o_orderpriority AS prio",
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents")
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toIndexedSeq).toMap
    def disc(xs: IndexedSeq[Long], p: Double): Long =
      xs(math.max(0, math.ceil(p * xs.length).toInt - 1))
    val got = Stats.priceWinsorizedMean(spark, sf0001).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val xs = cents(r.getString(0))
      val (p05, p95) = (disc(xs, 0.05), disc(xs, 0.95))
      val w = xs.map(x => math.min(math.max(x, p05), p95))
      val clamped = xs.count(x => x < p05 || x > p95).toLong
      assert(r.getLong(1) == xs.length.toLong)
      assert((r.getLong(2), r.getLong(3)) == ((p05, p95)), r.getString(0))
      assert(r.getLong(4) == clamped)
      assert(r.getLong(5) == w.sum)
      assert(r.getLong(6) == BigInt(w.sum) * 1000000 / xs.length)
      // winsorizing bounded the tail: something clamped, fences ordered
      assert(p05 <= p95 && clamped > 0, s"${r.getString(0)} vacuous")
    }
  }

  test("ab_cuped_lift equals a from-scratch recompute; CUPED preserves " +
      "the pooled mean and theta is shared across arms") {
    import org.apache.spark.sql.functions._
    def round(x: Double, n: Int): Double = {
      val p = math.pow(10, n); math.floor(x * p + 0.5) / p
    }
    val p = Tables(spark, sf0001, "events")
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), expr("unix_micros(ts)"),
        (col("value").cast("decimal(18,4)") * 10000).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val pivot = (p.map(_._2).min + p.map(_._2).max) / 2
    def nib(u: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(u.toString.getBytes("UTF-8"))
      "0123456789abcdef".indexOf("%02x".format(md(0)).charAt(0)).toLong % 2
    }
    val ux = p.groupBy(_._1).map { case (u, xs) =>
      (u, xs.filter(_._2 <= pivot).map(_._3).sum,
        xs.filter(_._2 > pivot).map(_._3).sum, nib(u))
    }.toSeq
    val n = ux.length.toDouble
    val gx = BigInt(ux.map(x => BigInt(x._2)).sum.toString).toDouble
    val gy = ux.map(x => BigInt(x._3)).sum.toDouble
    val gxy = ux.map(x => BigInt(x._2) * BigInt(x._3)).sum.toDouble
    val gxx = ux.map(x => BigInt(x._2) * BigInt(x._2)).sum.toDouble
    val varN = n * gxx - gx * gx
    val theta = if (varN == 0.0) 0.0 else (n * gxy - gx * gy) / varN
    val xbarG = gx / n
    val expected = ux.groupBy(_._4).toSeq.map { case (arm, xs) =>
      val nu = xs.length.toDouble
      val ybar = xs.map(x => BigInt(x._3)).sum.toDouble / nu
      val xbar = xs.map(x => BigInt(x._2)).sum.toDouble / nu
      (arm, xs.length.toLong, round(ybar / 10000.0, 4),
        round((ybar - theta * (xbar - xbarG)) / 10000.0, 4),
        round(theta, 6))
    }.sortBy(_._1)
    val got = graft.operators.Stats.abCupedLift(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4))).toSeq
    assert(got == expected)
    assert(got.length == 2, "one arm empty — assignment degenerate")
    assert(got.map(_._5).distinct.length == 1, "theta differs across arms")
    // CUPED is mean-preserving in the pooled total (exact in reals,
    // here up to display rounding)
    val pooledRaw = got.map(r => r._2 * r._3).sum / got.map(_._2).sum
    val pooledAdj = got.map(r => r._2 * r._4).sum / got.map(_._2).sum
    assert(math.abs(pooledRaw - pooledAdj) < 1e-3,
      s"CUPED shifted the pooled mean: $pooledRaw vs $pooledAdj")
  }

  test("ab_conversion_ztest equals a from-scratch two-proportion test") {
    import org.apache.spark.sql.functions._
    def round(x: Double, n: Int): Double = {
      val p = math.pow(10, n); math.floor(x * p + 0.5) / p
    }
    def nib(u: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(u.toString.getBytes("UTF-8"))
      "0123456789abcdef".indexOf("%02x".format(md(0)).charAt(0)).toLong % 2
    }
    val ev = Tables(spark, sf0001, "events")
      .select(col("user_id"), col("event_type"),
        (col("value").cast("decimal(18,4)") * 10000).cast("long"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val tots = ev.groupBy(_._1).map { case (u, xs) =>
      u -> xs.filter(_._2 == "purchase").map(_._3).sum
    }.toSeq
    // percentile_disc(0.5): smallest member with cume_dist >= 0.5
    val sorted = tots.map(_._2).sorted
    val med = sorted(math.ceil(0.5 * sorted.length).toInt.max(1) - 1)
    val byUser = tots.map { case (u, tot) =>
      (nib(u), if (tot > med) 1L else 0L)
    }
    val n0 = byUser.count(_._1 == 0L).toLong
    val c0 = byUser.filter(_._1 == 0L).map(_._2).sum
    val n1 = byUser.count(_._1 == 1L).toLong
    val c1 = byUser.filter(_._1 == 1L).map(_._2).sum
    val p0 = c0.toDouble / n0; val p1 = c1.toDouble / n1
    val ph = (c0.toDouble + c1.toDouble) / (n0.toDouble + n1.toDouble)
    val z = if (n0 == 0 || n1 == 0 || c0 + c1 == 0 || c0 + c1 == n0 + n1) 0.0
      else round((p1 - p0) /
        math.sqrt(ph * (1.0 - ph) * (1.0 / n0 + 1.0 / n1)), 4)
    val expected = (n0, c0, n1, c1, c0 * 1000000L / n0, c1 * 1000000L / n1,
      z, z > 1.96 || z < -1.96)
    assert(c0 + c1 > 0 && c0 + c1 < n0 + n1,
      "conversion flag degenerate — the z statistic is untested")
    val r = graft.operators.Stats.abConversionZtest(spark, sf0001)
      .collect()(0)
    val got = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getDouble(6), r.getBoolean(7))
    assert(got == expected)
    assert(n0 > 0 && n1 > 0, "an arm is empty — assignment degenerate")
  }
}

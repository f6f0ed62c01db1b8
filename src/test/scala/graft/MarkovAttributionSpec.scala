package graft

import org.apache.spark.sql.functions._
import graft.operators.MarkovAttribution

/** Markov removal-effect attribution: an INDEPENDENT end-to-end
  * recompute at sf0.001 — journeys re-derived in plain Scala, the
  * absorbing chain solved by Cramer with BigInt LAPLACE expansion
  * (cofactors — a different determinant formulation than the query's
  * 24-term permutation sum), every output row compared exactly. Plus
  * the model's structural laws. */
class MarkovAttributionSpec extends SparkSpec {

  private val channels = Seq("click", "error", "signup", "view")

  /** (variant, p_conv_ppm, removal_effect_ppm, credit_share_ppm). */
  private def recompute(): Seq[(String, Long, Long, Long)] = {
    val ev = Tables(spark, sf0001, "events")
      .select(col("user_id"), expr("unix_micros(ts)").as("tsu"),
        col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // journeys: per user ordered by (ts, event_id), purchases close
    val froms = "start" +: channels
    val tos = channels ++ Seq("conv", "null")
    val cnt = scala.collection.mutable.Map[(String, String), Long]()
      .withDefaultValue(0L)
    ev.groupBy(_._1).foreach { case (_, xs) =>
      val ordered = xs.sortBy(x => (x._2, x._3))
      var prev = "start"
      ordered.foreach { case (_, _, _, t) =>
        if (t == "purchase") { cnt((prev, "conv")) += 1; prev = "start" }
        else { cnt((prev, t)) += 1; prev = t }
      }
      if (prev != "start") cnt((prev, "null")) += 1
    }
    val p = froms.map { f =>
      val n = tos.map(t => cnt((f, t))).sum
      f -> tos.map { t =>
        t -> (if (n == 0) BigInt(0) else BigInt(cnt((f, t))) * 1000000 / n)
      }.toMap
    }.toMap
    def detLaplace(m: Vector[Vector[BigInt]]): BigInt =
      if (m.length == 1) m(0)(0)
      else (0 until m.length).map { j =>
        val minor = m.tail.map(row => row.patch(j, Nil, 1))
        val c = m(0)(j) * detLaplace(minor)
        if (j % 2 == 0) c else -c
      }.sum
    def pConv(removed: Int): BigInt = {
      val m = Vector.tabulate(4, 4) { (i, j) =>
        if (j == removed) { if (i == j) BigInt(1000000) else BigInt(0) }
        else if (i == j) BigInt(1000000) - p(channels(i))(channels(j))
        else -p(channels(i))(channels(j))
      }
      val b = Vector.tabulate(4)(i => p(channels(i))("conv"))
      val det = detLaplace(m)
      assert(det > 0, "chain determinant must be positive (substochastic)")
      val xNum = (0 to 3).map(j =>
        detLaplace(Vector.tabulate(4, 4)((i, k) =>
          if (k == j) b(i) else m(i)(k))))
      val num = (0 to 3).collect {
        case j if j != removed => p("start")(channels(j)) * xNum(j)
      }.sum + p("start")("conv") * det
      num / det
    }
    val full = pConv(-1)
    val effs = channels.indices.map(i => full - pConv(i))
    val total = effs.sum
    val rows = ("full", full.toLong, 0L,
      0L) +: channels.zipWithIndex.map { case (c, i) =>
      val share = if (total == 0) 0L else (effs(i) * 1000000 / total).toLong
      (c, pConv(i).toLong, effs(i).toLong, share)
    }
    rows.sortBy(_._1)
  }

  test("attribution_markov equals the independent BigInt Cramer/Laplace " +
      "recompute, row for row") {
    val got = MarkovAttribution.markovRemovalEffect(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got == recompute())
  }

  test("structural laws: removal never increases conversion, shares sum " +
      "to ~10⁶, all five event types are live in the data") {
    val rows = MarkovAttribution.markovRemovalEffect(spark, sf0001).collect()
    assert(rows.length == 5)
    val full = rows.find(_.getString(0) == "full").get.getLong(1)
    rows.filterNot(_.getString(0) == "full").foreach { r =>
      assert(r.getLong(1) <= full, s"removal raised conversion: $r")
      assert(r.getLong(2) == full - r.getLong(1))
    }
    val shares = rows.map(_.getLong(3)).sum
    assert(shares > 1000000L - 4 && shares <= 1000000L,
      s"credit shares sum to $shares")
    val types = Tables(spark, sf0001, "events")
      .select(col("event_type")).distinct().collect().map(_.getString(0)).toSet
    assert(types == (channels :+ "purchase").toSet,
      "channel set drifted — the fixed 4-channel matrix no longer matches")
  }
}

package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.RankTest

/** Rank-sum test: the two-phase prefix count must equal the naive
  * global-window form, and the doubled-U identities must hold. */
class RankTestSpec extends SparkSpec {

  private def stats = RankTest.segmentRankSum(spark, sf0001)
    .collect().head

  test("two-phase rank sum ≡ naive single-window computation") {
    val cust = spark.read.parquet(s"$sf0001/customer.parquet")
      .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
      .select(col("c_custkey"), col("c_mktsegment").as("seg"))
    val j = spark.read.parquet(s"$sf0001/orders.parquet")
      .join(cust, col("o_custkey") === col("c_custkey"))
      .select(col("o_totalprice").as("v"), col("seg"))
    val g = j.groupBy(col("v")).agg(
      count(when(col("seg") === "BUILDING", 1)).as("ma"),
      count(when(col("seg") === "MACHINERY", 1)).as("mb"),
      count(lit(1)).as("m"))
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val naive = g.withColumn("c", coalesce(sum(col("m")).over(w), lit(0L)))
      .agg(sum(col("ma")).as("n_a"), sum(col("mb")).as("n_b"),
        sum(col("ma") * (lit(2) * col("c") + col("m") + 1)).as("r2_a"),
        sum(col("m") * col("m") * col("m") - col("m")).as("tie_cubes"))
      .collect().head
    val got = stats
    assert(got.getLong(0) == naive.getLong(0))
    assert(got.getLong(1) == naive.getLong(1))
    assert(got.getLong(2) == naive.getLong(2))
    assert(got.getLong(4) == naive.getLong(3))
  }

  test("doubled-U identities: bounds and the A/B symmetry backbone") {
    val r = stats
    val (na, nb, r2a, u2a) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(na > 0 && nb > 0)
    // R2_A between na(na+1) (all A first) and na(na+2nb+1) (all A last)
    assert(r2a >= na * (na + 1) && r2a <= na * (na + 2 * nb + 1))
    // 0 ≤ U2_A ≤ 2·na·nb; U2_A + U2_B = 2·na·nb follows from the
    // doubled-midrank identity Σ(R2_A + R2_B) = 2·Σranks
    assert(u2a >= 0 && u2a <= 2 * na * nb)
  }

  test("KS statistic matches a driver-side brute recount") {
    import org.apache.spark.sql.functions._
    val r = graft.operators.RankTest.segmentKsTest(spark, sf0001)
      .collect()(0)
    val (na, nb, dmax, vAt, ppm) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4))
    // brute: collect the two samples, walk the pooled distinct values
    val rows = Tables(spark, sf0001, "orders")
      .join(Tables(spark, sf0001, "customer"),
        col("o_custkey") === col("c_custkey"))
      .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
      .select((col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long"), col("c_mktsegment"))
      .collect().map(x => (x.getLong(0), x.getString(1)))
    val a = rows.filter(_._2 == "BUILDING").map(_._1).sorted
    val bb = rows.filter(_._2 == "MACHINERY").map(_._1).sorted
    assert(na == a.length && nb == bb.length)
    val vals = (a ++ bb).distinct.sorted
    var best = 0L; var bestV = Long.MaxValue
    vals.foreach { v =>
      val ca = a.count(_ <= v).toLong
      val cb = bb.count(_ <= v).toLong
      val d = math.abs(ca * nb - cb * na)
      if (d > best) { best = d; bestV = v }
    }
    assert(dmax == best, s"D numerator drifted: $dmax vs $best")
    assert(vAt == bestV, s"argmax value drifted: $vAt vs $bestV")
    assert(ppm == best * 1000000L / (na * nb))
    assert(ppm > 0 && ppm < 1000000L)
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.operators.Baskets

/** Frequent-pair mining on sf0.001: a-priori pruning is lossless,
  * support is antimonotone, measures reconcile with raw counts. */
class BasketsSpec extends SparkSpec {
  import spark.implicits._

  test("a-priori pruned plan ≡ unpruned pair mining") {
    val pruned = Baskets.basketPairs(spark, sf0001)
      .select("part_a", "part_b", "n_pair")
      .collect().map(_.toSeq).toSet
    val b = Tables(spark, sf0001, "lineitem")
      .select($"l_orderkey", $"l_partkey").distinct()
    val naive = b.as("x")
      .join(b.as("y"), $"x.l_orderkey" === $"y.l_orderkey"
        && $"x.l_partkey" < $"y.l_partkey")
      .groupBy($"x.l_partkey".as("part_a"), $"y.l_partkey".as("part_b"))
      .agg(count(lit(1)).as("n_pair"))
      .filter($"n_pair" >= Baskets.MinSup)
      .collect().map(_.toSeq).toSet
    assert(pruned == naive,
      s"diff: +${(pruned -- naive).take(3)} -${(naive -- pruned).take(3)}")
    assert(pruned.nonEmpty, "no frequent pairs at sf0.001 — minsup too high")
  }

  test("antimonotonicity and measure arithmetic hold row by row") {
    val rows = Baskets.basketPairs(spark, sf0001).collect()
    val nOrders = Tables(spark, sf0001, "lineitem")
      .select($"l_orderkey").distinct().count()
    rows.foreach { r =>
      val (np, na, nb) = (r.getAs[Long]("n_pair"), r.getAs[Long]("n_a"),
        r.getAs[Long]("n_b"))
      assert(np >= Baskets.MinSup)
      assert(np <= math.min(na, nb), s"support not antimonotone: $r")
      assert(math.abs(r.getAs[Double]("support")
        - np.toDouble / nOrders) < 1e-5)
      assert(math.abs(r.getAs[Double]("confidence_a_b")
        - np.toDouble / na) < 1e-3)
      val lift = r.getAs[Double]("lift")
      assert(math.abs(lift - np.toDouble * nOrders / (na.toDouble * nb))
        < 1e-3)
      assert(lift > 1.0, // co-occurrence above independence at this minsup
        s"frequent pair with lift ≤ 1 at sparse density is implausible: $r")
    }
  }

  test("item recs: scores are the exact cos²-ppm of the pair table, " +
    "ranks are dense per item, and recommendation is symmetric") {
    val recs = Baskets.itemRecsCooccur(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(recs.nonEmpty)
    // item occurrence counts, brute
    val b = Tables(spark, sf0001, "lineitem")
      .select($"l_orderkey", $"l_partkey").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nItem = b.groupBy(_._2).map { case (k, v) => (k, v.length.toLong) }
    recs.foreach { case (item, rank, rec, np, ppm) =>
      assert(rank >= 1 && rank <= 3)
      assert(ppm == np * np * 1000000L / (nItem(item) * nItem(rec)),
        s"cos² drifted for ($item,$rec)")
    }
    // ranks 1..k dense per item
    recs.groupBy(_._1).foreach { case (item, rs) =>
      assert(rs.map(_._2).sorted.sameElements(1L to rs.length),
        s"ranks not dense for $item")
    }
    // the underlying pair relation is symmetric: if (a,b) is a's rec,
    // then b co-occurs with a ≥ MinSup times too (b may rank others
    // higher, but the pair must exist in b's candidate set)
    val pairSet = recs.map(r => (r._1, r._3)).toSet
    val candidates = recs.map(r => ((r._1, r._3), r._4)).toMap
    pairSet.foreach { case (a, bb) =>
      assert(candidates.getOrElse((a, bb), 0L) >= Baskets.MinSup)
    }
  }
}

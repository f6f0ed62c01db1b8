package graft

import org.apache.spark.sql.functions._
import graft.operators.{RpSketch, Similarity}

/** Sign-random-projection sketch invariants on sf0.001 — the code
  * recount is an INDEPENDENT driver-side fold (plain Scala doubles in
  * the same dimension order), not a re-run of the plan's expression. */
class RpSketchSpec extends SparkSpec {
  import spark.implicits._

  test("codes match a driver-side recount of the sign projections") {
    val got = RpSketch.rpCodes(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val embs = Tables(spark, sf0001, "embeddings")
      .select($"vec_id", $"embedding")
      .as[(Long, Array[Float])].collect()
    assert(embs.nonEmpty && got.size == embs.length)
    embs.foreach { case (id, v) =>
      assert(v.length == RpSketch.Dim)
      var code = 0
      (0 until RpSketch.Bits).foreach { j =>
        var acc = 0.0
        var d = 0
        while (d < RpSketch.Dim) {
          acc += v(d).toDouble * RpSketch.weight(j, d + 1)
          d += 1
        }
        if (acc >= 0) code |= (1 << j)
      }
      assert(got(id) == code, s"vec $id: got ${got(id)} expected $code")
    }
  }

  test("two-stage search: radius gate honest, re-rank consistent with exact") {
    val top = RpSketch.rpTopk(spark, sf0001).collect()
    assert(top.nonEmpty && top.length <= 10)
    assert(top.forall(_.getInt(1) <= RpSketch.Radius))
    // every reported cosine equals the exact kernel's value for that vec
    val exact = Similarity.cosineTopk(spark, sf0001, k = Int.MaxValue)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    top.foreach { r =>
      assert(exact(r.getLong(0)) == r.getDouble(2),
        s"vec ${r.getLong(0)}: re-rank cosine drifted")
    }
    // candidates are exactly the radius ball around the query code
    val codes = RpSketch.rpCodes(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val qc = codes(0L)
    val ball = codes.filter { case (id, c) =>
      id != 0L && Integer.bitCount(c ^ qc) <= RpSketch.Radius
    }.keySet
    assert(top.map(_.getLong(0)).toSet.subsetOf(ball))
  }

  test("wide sketch: bands recount from the planes; gate ⊇ Hamming≤B−1 ball") {
    val wide = RpSketch.wideCodesFrame(spark, sf0001)
      .collect().map(r => r.getLong(0) ->
        (0 until RpSketch.WideBands).map(i => r.getInt(i + 1))).toMap
    // independent driver-side fold of every band code from the weights
    val embs = Tables(spark, sf0001, "embeddings")
      .select($"vec_id", $"embedding")
      .as[(Long, Array[Float])].collect()
    embs.foreach { case (id, v) =>
      (0 until RpSketch.WideBands).foreach { k =>
        var code = 0
        (0 until RpSketch.BandBits).foreach { i =>
          val j = RpSketch.BandBits * k + i
          var acc = 0.0
          var d = 0
          while (d < RpSketch.Dim) {
            acc += v(d).toDouble * RpSketch.weight(j, d + 1)
            d += 1
          }
          if (acc >= 0) code |= (1 << i)
        }
        assert(wide(id)(k) == code, s"vec $id band $k drifted")
      }
    }
    val qb = wide(0L)
    val gated = RpSketch.rpTopkBanded(spark, sf0001, k = Int.MaxValue)
      .collect().map(_.getLong(0)).toSet
    // pigeonhole: ≤ WideBands−1 differing bits leave ≥1 band intact
    wide.foreach { case (id, bs) =>
      if (id != 0L) {
        val ham = bs.zip(qb).map { case (a, b) => Integer.bitCount(a ^ b) }.sum
        if (ham <= RpSketch.WideBands - 1)
          assert(gated.contains(id), s"vec $id at wide Hamming $ham dropped")
      }
    }
  }

  test("recall diagnostic: one row per gate, each the overlap of its top-10") {
    val rows = RpSketch.rpRecall(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val exact = Similarity.cosineTopk(spark, sf0001)
      .collect().map(_.getLong(0)).toSet
    def check(method: String, approxIds: Set[Long]): Unit = {
      val (n, rec) = rows(method)
      assert(n == (exact & approxIds).size.toLong, method)
      assert(rec == (exact & approxIds).size.toDouble / 10.0, method)
    }
    check(s"rp_hamming_r${RpSketch.Radius}",
      RpSketch.rpTopk(spark, sf0001).collect().map(_.getLong(0)).toSet)
    check(s"rp_banded_${RpSketch.WideBands}x${RpSketch.BandBits}",
      RpSketch.rpTopkBanded(spark, sf0001).collect().map(_.getLong(0)).toSet)
    check(s"rp_banded_${RpSketch.WideBands / 2}x${RpSketch.BandBits * 2}",
      RpSketch.rpTopkBanded16(spark, sf0001).collect().map(_.getLong(0)).toSet)
  }

  test("4x16 gate candidates are PROVABLY a subset of the 8x8 gate's") {
    // a 16-bit pair-match implies both 8-bit halves match individually,
    // so widening bands can only shrink the candidate set — the
    // containment behind the graded band-width cliff
    val c8 = RpSketch.rpTopkBanded(spark, sf0001, k = Int.MaxValue)
      .collect().map(_.getLong(0)).toSet
    val c16 = RpSketch.rpTopkBanded16(spark, sf0001, k = Int.MaxValue)
      .collect().map(_.getLong(0)).toSet
    assert(c16.subsetOf(c8), s"violators: ${(c16 -- c8).take(3)}")
  }
}

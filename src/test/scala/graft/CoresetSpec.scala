package graft

import org.apache.spark.sql.functions._
import graft.operators.Coreset

/** k-center greedy coreset: an independent from-scratch greedy over
  * brute cosines at sf0.001 (mirroring the kernel fold and the integer
  * deficit), plus the covering-radius laws. */
class CoresetSpec extends SparkSpec {

  private def deficit(a: Array[Float], b: Array[Float]): Long = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    val cos = dot / (math.sqrt(na) * math.sqrt(nb))
    1000000L - math.floor(cos * 1000000.0 + 0.5).toLong
  }

  test("coreset_kcenter equals a from-scratch farthest-point greedy") {
    val embs = Tables(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    var dmin = embs.map { case (v, e) => v -> deficit(e, embs(0L)) }
    val expected = scala.collection.mutable.ArrayBuffer(
      (1L, 0L, 2000000L))
    for (t <- 2 to Coreset.K) {
      val (pv, pd) = dmin.toSeq.minBy { case (v, d) => (-d, v) }
      expected += ((t.toLong, pv, pd))
      dmin = dmin.map { case (v, d) =>
        v -> math.min(d, deficit(embs(v), embs(pv)))
      }
    }
    val got = Coreset.coresetKcenter(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected.toSeq)
    // laws: picks are distinct; the covering radius never increases
    assert(got.map(_._2).distinct.length == got.length, "duplicate pick")
    val radii = got.map(_._3)
    assert(radii.zip(radii.tail).forall { case (a, b) => b <= a },
      s"covering radius increased: $radii")
  }
}

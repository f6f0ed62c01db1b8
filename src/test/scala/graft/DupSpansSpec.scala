package graft

import org.apache.spark.sql.functions._
import graft.operators.DupSpans

/** Maximal duplicated spans: every reported span is a REAL verbatim
  * token run (slice equality against the raw texts), and MAXIMAL
  * (extending one token left or right breaks the match or the text).
  */
class DupSpansSpec extends SparkSpec {

  private lazy val tokens: Map[Long, Array[String]] =
    spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) ->
        r.getString(1).split(" ").filter(_.nonEmpty))
      .toMap

  private lazy val spans =
    DupSpans.dupSpansMaximal(spark, sf0001).collect()

  test("every span is a verbatim shared token run") {
    assert(spans.nonEmpty, "no duplicated spans — vacuous")
    spans.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      val (sa, sb) = (r.getLong(2).toInt, r.getLong(3).toInt)
      val len = r.getLong(4).toInt
      val (ta, tb) = (tokens(a), tokens(b))
      assert(sa + len <= ta.length && sb + len <= tb.length,
        s"span ($a,$b,$sa,$sb,$len) out of bounds")
      assert(ta.slice(sa, sa + len).sameElements(tb.slice(sb, sb + len)),
        s"span ($a,$b,$sa,$sb,$len) tokens differ")
    }
  }

  test("every span is maximal: one more token on either side breaks it") {
    spans.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      val (sa, sb) = (r.getLong(2).toInt, r.getLong(3).toInt)
      val len = r.getLong(4).toInt
      val (ta, tb) = (tokens(a), tokens(b))
      val leftExtends = sa > 0 && sb > 0 && ta(sa - 1) == tb(sb - 1)
      val rightExtends = sa + len < ta.length && sb + len < tb.length &&
        ta(sa + len) == tb(sb + len)
      assert(!leftExtends, s"span ($a,$b,$sa,$sb,$len) extends left")
      assert(!rightExtends, s"span ($a,$b,$sa,$sb,$len) extends right")
    }
  }

  test("span lengths are >= the detection floor and a long planted " +
      "duplication is found") {
    assert(spans.forall(_.getLong(4) >= 8))
    // calibration found ~95-token shared runs in this corpus — a
    // detector that tops out near the floor is merging nothing
    assert(spans.map(_.getLong(4)).max >= 32,
      "no long span found — island merging suspect")
  }

  test("boilerplate df-cap: cap value pinned, high-df windows drop " +
      "BEFORE the match join (no quadratic pair set), surviving " +
      "spans stay exact") {
    import spark.implicits._
    assert(DupSpans.DfCap == 16)
    val boiler = (0 until 10).map(i => s"bp$i").mkString(" ")
    val shared = (0 until 20).map(i => s"sh$i").mkString(" ")
    // 50 docs carrying the same 10-token boilerplate (df 50 > 16) +
    // unique filler; docs 1 and 2 share ONE genuine 20-token span
    val docs = Seq(
      1L -> s"a0 a1 a2 a3 a4 $shared z0 z1",
      2L -> s"b0 b1 b2 $shared y0") ++
      (0 until 50).map { i =>
        (100L + i) -> s"d${i}x0 d${i}x1 $boiler d${i}x2 d${i}x3"
      }
    val df = docs.toDF("doc_id", "text")
    // the cap fires: every pure-boilerplate window is gone, the
    // genuine span's windows all survive
    val kept = DupSpans.cappedWindows(df).select("s").as[String]
      .collect().toSet
    assert(!kept.exists(_.startsWith("bp0 ")),
      "pure boilerplate window survived the cap")
    assert(kept.count(_.split(" ").forall(_.startsWith("sh"))) == 13,
      "pure shared-span windows must all survive") // 20 − 8 + 1
    val out = DupSpans.spansOf(df).collect()
    // no quadratic blowup: without the cap the 50 boilerplate docs
    // alone contribute C(50,2) = 1225 span rows
    assert(out.length == 1, s"expected ONE span, got ${out.length}")
    val r = out.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == ((1L, 2L, 5L, 3L, 20L)))
  }
}

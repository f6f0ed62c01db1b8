package graft

import org.apache.spark.sql.functions._
import graft.operators.LangId

/** Language-ID: an independent from-scratch JVM scorer at sf0.001
  * (own md5/bucket/split/model/argmax code path), plus the structural
  * laws the operator's scaladoc pins. */
class LangIdSpec extends SparkSpec {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  private def u32(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).substring(0, 8), 16)
  private def isTrain(docId: Long): Boolean =
    md5hex(docId.toString).substring(0, 8) < "c0000000"

  /** (doc_id, lang, isTrain, bucket-occurrence list) — over the
    * PLANTED eval frame (the ` q<lang>q` × PlantRepeat marker), the
    * classifier's graded input since r12. */
  private lazy val docs: Seq[(Long, String, Boolean, Seq[Long])] =
    Tables(spark, sf0001, "documents")
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .toIndexedSeq.map { r =>
        val (id, lang, raw) = (r.getLong(0), r.getString(1), r.getString(2))
        val text = raw + (" q" + lang + "q") * LangId.PlantRepeat
        val bs =
          if (text.length < LangId.N) Seq.empty[Long]
          else text.sliding(LangId.N).map(g => u32(g) % LangId.Buckets).toSeq
        (id, lang, isTrain(id), bs)
      }.filter(_._4.nonEmpty)

  /** Class set from the UNFILTERED table (the Spark-side spine rule). */
  private lazy val allLangs: Seq[String] =
    Tables(spark, sf0001, "documents").select(col("lang")).distinct()
      .collect().map(_.getString(0)).toIndexedSeq.sorted

  private lazy val expectedPred: Map[Long, (String, String)] = {
    val langs = allLangs
    val train = docs.filter(_._3)
    val cnt = train.flatMap { case (_, l, _, bs) => bs.map(l -> _) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tot = train.groupBy(_._2).view
      .mapValues(_.map(_._4.size.toLong).sum).toMap
    def w(l: String, b: Long): Long =
      ((cnt.getOrElse((l, b), 0L) + 1L) * 1000000L) /
        (tot.getOrElse(l, 0L) + LangId.Buckets)
    docs.filterNot(_._3).map { case (id, lt, _, bs) =>
      val tf = bs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val pred = langs.map { l =>
        (l, tf.map { case (b, f) => f * w(l, b) }.sum)
      }.minBy { case (l, s) => (-s, l) }._1
      id -> (lt, pred)
    }.toMap
  }

  test("langid_confusion equals a from-scratch JVM scorer") {
    val expected = expectedPred.values.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val got = LangId.langidConfusion(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == expected)
  }

  test("langid_f1_by_class equals the exact fold of the confusion matrix") {
    val preds = expectedPred.values.toSeq
    val expected = preds.map(_._1).distinct.sorted.map { l =>
      val nTrue = preds.count(_._1 == l).toLong
      val nPred = preds.count(_._2 == l).toLong
      val tp = preds.count(p => p._1 == l && p._2 == l).toLong
      val prec = if (nPred == 0) 0L else tp * 1000000L / nPred
      val rec = tp * 1000000L / nTrue
      val f1 = if (prec + rec == 0) 0L else 2 * prec * rec / (prec + rec)
      (l, nTrue, nPred, tp, prec, rec, f1)
    }
    val got = LangId.langidF1ByClass(spark, sf0001).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got == expected)
  }

  test("maintained model (count addition) equals the one-shot model, " +
      "and the two generations partition the train split") {
    val oneShot = LangId.model(spark, sf0001)
      .orderBy(col("lang"), col("b")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val maintained = LangId.langidModelMaintained(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(maintained.sameElements(oneShot))
    // the ingest class is a strict, non-empty subset of the train docs
    val train = docs.filter(_._3)
    val ingest = train.filter(d =>
      Set("0", "1")(md5hex(d._1.toString).substring(0, 1)))
    assert(ingest.nonEmpty && ingest.size < train.size)
  }

  test("erased model (count subtraction) equals a survivor-only " +
      "from-scratch recompute, and the erased class is live") {
    val erased = docs.filter(d =>
      d._3 && md5hex(d._1.toString).substring(0, 1) == "a")
    assert(erased.nonEmpty, "no erased train docs at sf0.001 — vacuous")
    val surv = docs.filter(d =>
      d._3 && md5hex(d._1.toString).substring(0, 1) != "a")
    val cnt = surv.flatMap { case (_, l, _, bs) => bs.map(l -> _) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tot = surv.groupBy(_._2).view
      .mapValues(_.map(_._4.size.toLong).sum).toMap
    val expected = allLangs.flatMap { l =>
      (0L until LangId.Buckets.toLong).map { b =>
        val c = cnt.getOrElse((l, b), 0L)
        (l, b, c,
          (c + 1L) * 1000000L / (tot.getOrElse(l, 0L) + LangId.Buckets))
      }
    }
    val got = LangId.langidModelErased(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expected)
  }

  test("langid_mix_by_source equals the provenance fold of the predictions") {
    val srcOf = Tables(spark, sf0001, "documents")
      .select(col("doc_id"), col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = expectedPred.toSeq
      .map { case (id, (_, pred)) => (srcOf(id), pred) }
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .map { case ((s0, p0), n) => (s0, p0, n) }
      .sortBy(x => (x._1, x._2))
    val got = LangId.langidMixBySource(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == expected)
  }

  test("stream-scored confusion equals the one-shot matrix row for row, " +
      "through real micro-batches") {
    val batch = LangId.langidConfusion(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    val streamed = LangId.langidConfusionStreamed(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(streamed == batch)
    // the replay really chopped: two per-batch sink generations exist
    val root = LangId.streamedPredsDir(spark, sf0001)
    val gens = new java.io.File(s"$root/preds").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(gens.sameElements(Array("b0", "b1")))
  }

  test("the planted signal makes the classifier classify: diagonal " +
      "mass >= 90% (r11 verdict #8 — off-chance, spec-pinned)") {
    val m = LangId.langidConfusion(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val total = m.map(_._3).sum
    val diag = m.filter(x => x._1 == x._2).map(_._3).sum
    assert(total > 0)
    // chance on 5 classes is 20%; the ~20%-of-gram-mass marker must
    // put the held-out accuracy far above it
    assert(diag * 10 >= total * 9,
      s"diagonal $diag / $total below the 90% pin — planted signal lost")
  }

  test("the split is honest and the model spine is total") {
    // both splits non-empty at sf0.001 (the ~75/25 hex threshold)
    assert(docs.exists(_._3) && docs.exists(!_._3))
    // model: one row per (lang × bucket), weights positive (Laplace)
    val m = LangId.model(spark, sf0001).collect()
    assert(m.length == allLangs.size * LangId.Buckets)
    assert(m.forall(_.getLong(3) > 0L))
  }
}

package graft

import java.security.MessageDigest
import org.apache.spark.sql.functions._
import graft.operators.Dsir
import graft.plans.Kmv

/** DSIR-style hashed-bigram selection: the whole chain (tokenize →
  * bigram → bucket → smoothed ratio model → per-doc score → top-k)
  * re-derived in plain JVM code straight from the raw texts — an
  * independent recompute, not a replay of the Spark plan. */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  private val B = 64

  /** (doc_id, source, lang, bucket) per bigram occurrence, from raw text. */
  private def jvmFeatures(): Seq[(Long, String, String, Long)] = {
    val md = MessageDigest.getInstance("MD5")
    Tables(spark, sf0001, "documents")
      .select(col("doc_id"), col("source"), col("lang"), col("text"))
      .as[(Long, String, String, String)].collect().toSeq
      .flatMap { case (id, src, lang, text) =>
        val t = text.split(" ").filter(_.nonEmpty)
        t.sliding(2).filter(_.length == 2).map { p =>
          (id, src, lang, Kmv.u32(md, p.mkString(" ").getBytes("UTF-8")) % B)
        }
      }
  }

  private def jvmModel(feats: Seq[(Long, String, String, Long)]): Map[Long, (Long, Long, Long)] = {
    val cRaw = feats.groupBy(_._4).view.mapValues(_.size.toLong).toMap
    val cTgt = feats.filter(_._3 == "en").groupBy(_._4).view.mapValues(_.size.toLong).toMap
    val nRaw = feats.size.toLong
    val nTgt = feats.count(_._3 == "en").toLong
    (0L until B.toLong).map { b =>
      val cr = cRaw.getOrElse(b, 0L)
      val ct = cTgt.getOrElse(b, 0L)
      val ratio = (BigInt(ct + 1) * BigInt(nRaw + B) * BigInt(1000000) /
        (BigInt(cr + 1) * BigInt(nTgt + B))).toLong
      b -> (ct, cr, ratio)
    }.toMap
  }

  test("bucket model: total 64-row frame, exact counts and smoothed ratios") {
    val feats = jvmFeatures()
    val want = jvmModel(feats)
    val got = Dsir.dsirBucketModel(spark, sf0001).collect()
    assert(got.length == B)
    assert(got.map(_.getLong(0)).toSeq == (0L until B.toLong))
    got.foreach { r =>
      val (ct, cr, ratio) = want(r.getLong(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((ct, cr, ratio)),
        s"bucket ${r.getLong(0)}")
    }
  }

  test("doc scores and top-k selection match the JVM recompute end-to-end") {
    val feats = jvmFeatures()
    val model = jvmModel(feats)
    val scores = feats.groupBy(f => (f._1, f._2, f._3)).map { case ((id, src, lang), fs) =>
      val rsum = fs.map(f => model(f._4)._3).sum
      (id, src, lang, fs.size.toLong, rsum / fs.size)
    }.toSeq
    val topK = scores.sortBy(s => (-s._5, s._1)).take(Dsir.SelK)
    val got = Dsir.dsirSelectedDocs(spark, sf0001).collect()
    assert(got.length == math.min(Dsir.SelK, scores.size))
    got.zip(topK).zipWithIndex.foreach { case ((r, w), i) =>
      assert(r.getLong(0) == i + 1L, "rank is dense from 1")
      assert((r.getLong(1), r.getString(2), r.getString(3), r.getLong(4), r.getLong(5))
        == ((w._1, w._2, w._3, w._4, w._5)), s"rank ${i + 1}")
    }
    // scores non-increasing down the ranking
    got.sliding(2).foreach { p =>
      if (p.length == 2) assert(p(0).getLong(5) >= p(1).getLong(5))
    }
  }

  test("stream-scored selection equals the one-shot selection row for " +
      "row, through real micro-batches") {
    val batch = Dsir.dsirSelectedDocs(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getString(3), r.getLong(4), r.getLong(5))).toSeq
    val streamed = Dsir.dsirSelectedStreamed(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getString(3), r.getLong(4), r.getLong(5))).toSeq
    assert(streamed == batch)
    // the replay really chopped: two per-batch sink generations exist
    val root = Dsir.streamedScoresDir(spark, sf0001)
    val gens = new java.io.File(s"$root/scores").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(gens.sameElements(Array("b0", "b1")))
  }

  test("AUC: the doubled-midrank statistic equals brute-force pair counting") {
    val feats = jvmFeatures()
    val model = jvmModel(feats)
    val scores = feats.groupBy(f => (f._1, f._3)).toSeq.map { case ((_, lang), fs) =>
      val rsum = fs.map(f => model(f._4)._3).sum
      (lang == "en", rsum / fs.size)
    }
    val pos = scores.filter(_._1).map(_._2)
    val neg = scores.filterNot(_._1).map(_._2)
    // doubled pair count: 2 per strict win, 1 per tie
    val doubled = pos.iterator.map { p =>
      neg.iterator.map { n =>
        if (p > n) 2L else if (p == n) 1L else 0L
      }.sum
    }.sum
    val r = Dsir.dsirAuc(spark, sf0001).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getLong(0) == pos.size.toLong)
    assert(row.getLong(1) == neg.size.toLong)
    assert(row.getLong(3) == doubled,
      "U2 from the rank decomposition != brute-force doubled pair count")
    assert(row.getLong(4) ==
      BigInt(doubled) * 1000000 / (2L * pos.size * neg.size))
  }

  test("decile lift: tie-sharing decile assignment and rates match the JVM recompute") {
    val feats = jvmFeatures()
    val model = jvmModel(feats)
    val scores = feats.groupBy(f => (f._1, f._3)).toSeq.map { case ((_, lang), fs) =>
      (lang == "en", fs.map(f => model(f._4)._3).sum / fs.size)
    }
    val n = scores.size.toLong
    // exclusive prefix count per distinct value, then floor(10c/n)
    val byV = scores.groupBy(_._2).toSeq.sortBy(_._1)
    var c = 0L
    val want = collection.mutable.Map.empty[Long, (Long, Long)]
    byV.foreach { case (_, docs) =>
      val dec = 10L * c / n
      val (pn, pp) = want.getOrElse(dec, (0L, 0L))
      want(dec) = (pn + docs.size, pp + docs.count(_._1))
      c += docs.size
    }
    val got = Dsir.dsirDecileLift(spark, sf0001).collect()
    assert(got.length == 10)
    got.foreach { r =>
      val (wn, wp) = want.getOrElse(r.getLong(0), (0L, 0L))
      assert((r.getLong(1), r.getLong(2)) == ((wn, wp)), s"decile ${r.getLong(0)}")
      val rate = if (wn == 0) 0L else BigInt(wp) * 1000000 / wn
      assert(r.getLong(3) == rate)
    }
    assert(got.map(_.getLong(1)).sum == n)
  }

  test("source yield: selected counts partition the top-k; never exceeds scored docs") {
    val y = Dsir.dsirSourceYield(spark, sf0001).collect()
    assert(y.nonEmpty)
    val nScored = y.map(_.getLong(1)).sum
    val nSel = y.map(_.getLong(2)).sum
    assert(nSel == math.min(Dsir.SelK.toLong, nScored))
    y.foreach(r => assert(r.getLong(2) <= r.getLong(1), r.getString(0)))
  }
}

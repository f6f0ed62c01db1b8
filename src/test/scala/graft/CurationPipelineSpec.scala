package graft

import org.apache.spark.sql.functions._
import graft.operators.{Curation, CurationPipeline, LangId, Similarity}

/** The composed curation pipeline (r11 verdict #1): stage-implication
  * laws on the flagged frame, conservation on the graded account,
  * agreement with the standalone stage operators, and a JVM recompute
  * of the mix arithmetic — all at sf0.001. */
class CurationPipelineSpec extends SparkSpec {

  private lazy val account =
    CurationPipeline.curationPipelineAccount(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
        r.getLong(8), r.getLong(9), r.getLong(10), r.getLong(11)))
      .toSeq

  test("stage flags are a strict implication chain: admit ⇒ diverse ⇒ " +
      "dedup-keeper ⇒ langid-pass") {
    val f = CurationPipeline.flagged(spark, sf0001)
      .select(col("g_pass"), col("dd_pass"), col("dv_pass"), col("admit"))
      .collect()
      .map(r => (r.getBoolean(0), r.getBoolean(1), r.getBoolean(2),
        r.getBoolean(3)))
    assert(f.nonEmpty)
    f.foreach { case (g, dd, dv, ad) =>
      assert(!ad || dv); assert(!dv || dd); assert(!dd || g)
    }
    // liveness: the planted classifier may legitimately pass EVERY doc
    // at sf0.001 (accuracy ≈ 1.0 — LangIdSpec pins the diagonal), so
    // the gate is only required non-empty; dedup and the cap must
    // actually drop rows
    assert(f.exists(_._1), "langid gate passed nothing")
    assert(f.exists(_._2) && f.count(_._1) > f.count(_._2),
      "dedup stage dropped nothing — vacuous")
    assert(f.exists(_._4), "nothing admitted")
    assert(f.count(_._3) > f.count(_._4),
      "cap stage dropped nothing — vacuous")
  }

  test("account conservation: monotone stages, cap binds exactly, " +
      "allocation never over-grants the budget") {
    assert(account.nonEmpty)
    account.foreach { case (_, raw, lang, dd, dv, adm, chRaw, chAdm,
        tokAdm, _, _, _) =>
      assert(raw >= lang && lang >= dd && dd >= dv && dv >= adm)
      assert(adm == math.min(dv, Curation.CapK.toLong),
        "cap must admit exactly min(n_diverse, K)")
      assert(chAdm <= chRaw)
      assert(adm > 0 || (chAdm == 0L && tokAdm == 0L))
    }
    val tot = account.map(_._9).sum
    val budget = 3 * tot / 4
    assert(account.map(_._11).sum <= budget,
      "Σalloc must never exceed the ¾ budget")
  }

  test("stage counts agree with the standalone operators they compose") {
    // langid gate == the whole-corpus prediction agreement fold
    val srcOf = Tables(spark, sf0001, "documents")
      .select(col("doc_id"), col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val gateBySrc = LangId.gatePredictions(spark, sf0001).collect()
      .filter(r => r.getString(1) == r.getString(2))
      .groupBy(r => srcOf(r.getLong(0))).view.mapValues(_.length.toLong)
      .toMap
    account.foreach { case (src, _, lang, _, _, _, _, _, _, _, _, _) =>
      assert(lang == gateBySrc.getOrElse(src, 0L), s"langid count at $src")
    }
    // dedup keepers == one per cluster that has a gate survivor
    val gateIds = LangId.gatePredictions(spark, sf0001).collect()
      .filter(r => r.getString(1) == r.getString(2))
      .map(_.getLong(0)).toSet
    val clusters = Similarity.neardupClusters(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expectDedup = clusters.filter(c => gateIds(c._1))
      .map(_._2).distinct.length.toLong
    assert(account.map(_._4).sum == expectDedup)
  }

  test("erased pipeline: survivors only, erasure is live, and the " +
      "account obeys the same conservation laws") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val ids = Tables(spark, sf0001, "documents")
      .select(col("doc_id")).collect().map(_.getLong(0))
    val nErased = ids.count(id => md5hex(id.toString).startsWith("a"))
    assert(nErased > 0, "no erased docs at sf0.001 — vacuous")
    val er = CurationPipeline.curationPipelineErased(spark, sf0001)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
        r.getLong(8), r.getLong(9), r.getLong(10), r.getLong(11)))
      .toSeq
    // raw counts shrink by exactly the per-source erased masses
    val baseRaw = account.map(a => a._1 -> a._2).toMap
    val srcOf = Tables(spark, sf0001, "documents")
      .select(col("doc_id"), col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val erasedBySrc = srcOf.filter(p => md5hex(p._1.toString)
      .startsWith("a")).groupBy(_._2).view.mapValues(_.length.toLong).toMap
    er.foreach { case (src, raw, lang, dd, dv, adm, _, _, _, _, _, _) =>
      assert(raw == baseRaw(src) - erasedBySrc.getOrElse(src, 0L),
        s"survivor raw count at $src")
      assert(raw >= lang && lang >= dd && dd >= dv && dv >= adm)
      assert(adm == math.min(dv, Curation.CapK.toLong))
    }
    // the composition is non-vacuous: at least one source's account
    // moved (the erased class is ~1/16 of every source)
    assert(er != account)
  }

  test("mix arithmetic is the exact integer recompute of the account " +
      "columns (temperatureMix discipline over admitted tokens)") {
    val totAdm = account.map(_._9).sum
    val sumW = account.map(_._10).sum
    val budget = 3 * totAdm / 4
    account.foreach { case (src, _, _, _, _, _, _, _, tokAdm, wFp,
        alloc, rate) =>
      assert(wFp == math.floor(math.sqrt(tokAdm.toDouble) * 1e6).toLong,
        s"w_fp at $src")
      val expAlloc =
        if (sumW == 0) 0L
        else (BigInt(budget) * wFp / sumW).toLong
      assert(alloc == expAlloc, s"alloc at $src")
      val expRate =
        if (tokAdm == 0) 0L else (BigInt(alloc) * 1000000 / tokAdm).toLong
      assert(rate == expRate, s"rate at $src")
    }
  }
}

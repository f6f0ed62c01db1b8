package graft

import org.apache.spark.sql.functions._

import graft.operators.EditJoin

/** Q-gram prefix-filtered edit-distance join: lossless vs brute force,
  * planted twins all found, filter genuinely selective. */
class EditJoinSpec extends SparkSpec {

  private lazy val ents = EditJoin.entities(spark, sf0001)
    .collect().map(r => (r.getLong(0), r.getString(1))).toSeq

  /** Brute-force quadratic ground truth (driver-side — sf0.001 only). */
  private lazy val brute = {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1)(i =>
        Array.tabulate(b.length + 1)(j => if (i == 0) j else if (j == 0) i else 0))
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    (for {
      (ia, na) <- ents
      (ib, nb) <- ents
      if ia < ib
      d = lev(na, nb)
      if d <= 1
    } yield (ia, ib, d.toLong)).sortBy(t => (t._1, t._2))
  }

  test("q-gram join ≡ brute-force quadratic (lossless, exact)") {
    val got = EditJoin.fuzzyJoinQgram(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == brute, s"got ${got.size} pairs, brute ${brute.size}")
    assert(got.nonEmpty)
  }

  test("every planted 1-edit twin is found at distance 1") {
    val got = EditJoin.fuzzyJoinQgram(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = ents.map(_._1).filter(_ >= 10000000L)
      .map(d => (d - 10000000L, d))
    assert(planted.nonEmpty)
    // a planted twin could be distance 0/1 from its origin via several
    // routes; the deletion construction guarantees dist ≤ 1 always
    planted.foreach { p =>
      assert(got.contains(p), s"planted pair $p missing") }
  }

  test("the prefix filter filters") {
    val n = ents.size.toLong
    val allPairs = n * (n - 1) / 2
    val cands = EditJoin.candidateCount(spark, sf0001)
    assert(cands >= brute.size.toLong)
    assert(cands * 5 < allPairs,
      s"prefix filter kept $cands of $allPairs pairs")
  }

  test("pass-join ≡ brute force ≡ q-gram join, and its segment keys " +
      "are ≥5× more selective than the q-gram prefixes") {
    val pj = EditJoin.fuzzyJoinPassjoin(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(pj == brute, s"passjoin ${pj.size} pairs, brute ${brute.size}")
    val qg = EditJoin.fuzzyJoinQgram(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(pj == qg)
    val pjCands = EditJoin.passjoinCandidateCount(spark, sf0001)
    val qgCands = EditJoin.candidateCount(spark, sf0001)
    assert(pjCands >= brute.size.toLong)
    assert(pjCands * 5 <= qgCands,
      s"segment keys kept $pjCands vs q-gram $qgCands — not sparser")
  }

  test("symspell delete-neighborhood join ≡ brute force, and its " +
      "candidate set is never looser than the q-gram prefixes") {
    val ss = EditJoin.fuzzyJoinSymspell(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(ss == brute, s"symspell ${ss.size} pairs, brute ${brute.size}")
    val ssCands = EditJoin.symspellCandidateCount(spark, sf0001)
    val qgCands = EditJoin.candidateCount(spark, sf0001)
    assert(ssCands >= brute.size.toLong, "candidates below the truth set")
    assert(ssCands <= qgCands,
      s"delete keys kept $ssCands vs q-gram $qgCands — not tighter")
  }
}

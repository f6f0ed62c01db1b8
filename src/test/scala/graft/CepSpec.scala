package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.Cep

/** CEP pattern machine: the 3-state automaton is proven equivalent to
  * leftmost non-overlapping greedy regex matching (the semantics both
  * engines' graded queries use), chop-invariant (the streaming
  * property), and the batch query is checked against a driver-side
  * fold. (Raw Gen sampling with fixed seeds — ComponentsPropSpec
  * idiom.) */
class CepSpec extends SparkSpec {

  private def samples[T](g: Gen[T], k: Int): Seq[T] =
    (0 until k).flatMap(i => g.apply(Gen.Parameters.default, Seed(23L + i)))

  private def regexCount(s: String): Long =
    Cep.Pattern.r.findAllMatchIn(s).size.toLong

  test("automaton ≡ regex non-overlapping count on random event strings") {
    val gen = Gen.listOf(Gen.oneOf('v', 'c', 'p', 's', 'e')).map(_.mkString)
    val strs = samples(gen, 200) ++ Seq(
      "", "vcp", "vvccpp", "vcpvcp", "vcvcp", "vvcvcp", "vcpp", "pcv",
      "vcpvvccp", "vpcvcp")
    strs.foreach { s =>
      assert(Cep.countMatches(s) == regexCount(s), s"seq=$s")
    }
  }

  test("fold is chop-invariant: any batch chopping with carried phase lands on the whole-string count") {
    val gen = for {
      s <- Gen.listOf(Gen.oneOf('v', 'c', 'p', 's', 'e')).map(_.mkString)
      cuts <- Gen.listOf(Gen.chooseNum(0, math.max(s.length, 1)))
    } yield (s, cuts)
    samples(gen, 120).foreach { case (s, cuts) =>
      val bounds = (cuts :+ 0 :+ s.length).map(_.min(s.length)).distinct.sorted
      var phase = 0
      var n = 0L
      bounds.zip(bounds.tail).foreach { case (a, b) =>
        s.substring(a, b).foreach { ch =>
          val (p2, hit) = Cep.step(phase, ch)
          phase = p2
          if (hit) n += 1
        }
      }
      assert(n == Cep.countMatches(s), s"seq=$s cuts=$bounds")
    }
  }

  test("batch query ≡ driver-side fold over the (ts, event_id)-ordered sequences") {
    val rows = Cep.cepFunnelMatches(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val raw = Tables(spark, sf0001, "events")
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), (r.getTimestamp(1).getTime, r.getLong(2),
        r.getString(3))))
      .groupBy(_._1)
    rows.foreach { r =>
      val u = r.getLong(0)
      val seq = raw(u).map(_._2).sortBy(x => (x._1, x._2)).map {
        case (_, _, "view") => 'v'
        case (_, _, "click") => 'c'
        case (_, _, "purchase") => 'p'
        case (_, _, "signup") => 's'
        case _ => 'e'
      }.mkString
      assert(r.getLong(1) == seq.length, s"user $u n_events")
      assert(r.getLong(2) == Cep.countMatches(seq), s"user $u n_funnels")
    }
    assert(rows.map(_.getLong(2)).sum > 0, "corpus should contain funnels")
  }

  test("streamed machine ≡ batch query row-for-row") {
    val batch = Cep.cepFunnelMatches(spark, sf0001).collect()
    val streamed = graft.streaming.StreamReplay
      .cepFunnelsStreamed(spark, sf0001).collect()
    assert(streamed.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      batch.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq)
  }
}

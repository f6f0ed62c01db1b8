package graft

import org.apache.spark.sql.DataFrame
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.Segmentation
import graft.operators.Segmentation.SegmentFilter

/** ScalaCheck-generated properties for the filter algebra (SURVEY.md
  * §5.2 pt 3): the P1 optional-predicate conjunction must behave like a
  * monotone filter lattice no matter which predicates are present.
  * (Raw Gen sampling with a fixed seed — deterministic, no
  * scalatest-plus bridge needed.) */
class FilterAlgebraPropSpec extends SparkSpec {

  lazy val act: DataFrame = Segmentation.activity(
    Tables(spark, sf0001, "customer"),
    Tables(spark, sf0001, "orders"),
    Segmentation.DefaultAsOf).cache()
  lazy val total: Long = act.count()

  val genFilter: Gen[SegmentFilter] = for {
    segs <- Gen.someOf("building", "machinery", "FURNITURE")
    minM <- Gen.option(Gen.choose(0.0, 40.0))
    maxM <- Gen.option(Gen.choose(0.0, 80.0))
    minS <- Gen.option(Gen.choose(0.0, 500000.0))
    name <- Gen.oneOf("", "customer#", "zzz-no-match")
  } yield SegmentFilter(segs.toSeq, minM, maxM, minS, name)

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private def countFor(f: SegmentFilter): Long =
    Segmentation.stats(act, f).first().getLong(0)

  test("empty filter is the identity") {
    assert(countFor(SegmentFilter()) == total)
  }

  test("any filter yields a subset; tightening spend never grows it") {
    samples(genFilter, 12).foreach { f =>
      val n = countFor(f)
      assert(n >= 0 && n <= total, s"out of range for $f")
      val tighter = f.copy(minTotalSpent =
        Some(f.minTotalSpent.getOrElse(0.0) + 100000.0))
      assert(countFor(tighter) <= n, s"monotonicity broken for $f")
    }
  }

  test("min/max months bounds compose like an interval") {
    samples(Gen.choose(0.0, 40.0), 8).foreach { m =>
      val lo = countFor(SegmentFilter(minMonthsSinceLast = Some(m)))
      val hi = countFor(SegmentFilter(maxMonthsSinceLast = Some(m)))
      val band = countFor(SegmentFilter(
        minMonthsSinceLast = Some(m), maxMonthsSinceLast = Some(m)))
      assert(band <= lo && band <= hi, s"band not contained at m=$m")
      // inclusion-exclusion over customers WITH order activity
      val withActivity = countFor(SegmentFilter(minMonthsSinceLast = Some(0.0)))
      assert(lo + hi - band == withActivity, s"cover broken at m=$m")
    }
  }

  test("stats count always equals preview-universe size") {
    samples(genFilter, 6).foreach { f =>
      val statsCount = countFor(f)
      val nation = Tables(spark, sf0001, "nation")
      val previewAll = Segmentation.preview(act, nation, f, k = Int.MaxValue)
      assert(previewAll.count() == statsCount, s"mismatch for $f")
    }
  }
}

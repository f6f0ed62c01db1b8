package graft

import graft.operators.Cusum

/** CUSUM drift monitor: the pure fold's detection semantics (level
  * series never alarms; a sustained small shift must; a single spike
  * must NOT — that is the z-test's job) and the graded query checked
  * against a driver-side replay of the same fold. */
class CusumSpec extends SparkSpec {

  test("level series drains to zero and never alarms") {
    val out = Cusum.foldSeries(Seq.fill(500)(3L), k = 4L)
    assert(out.forall { case (s, a) => s == 0L && !a })
  }

  test("a sustained +2 shift alarms; the alarm latency is h / excess") {
    // baseline 3/h (k = 4), shift to 6/h from t=100: S grows by 2/h,
    // h = 8k = 32 → first alarm 16 hours after the shift
    val series = Seq.fill(100)(3L) ++ Seq.fill(100)(6L)
    val out = Cusum.foldSeries(series, k = 4L)
    val firstAlarm = out.indexWhere(_._2)
    assert(firstAlarm == 100 + 15, s"got $firstAlarm") // 16th shifted hour
    assert(out.drop(firstAlarm).forall(_._2), "alarm persists under sustained shift")
  }

  test("a single spike of the same total mass does NOT alarm") {
    // one 20-count hour on a 3/h baseline: S jumps to 16 < 32, drains
    val series = Seq.fill(100)(3L) ++ Seq(20L) ++ Seq.fill(100)(3L)
    val out = Cusum.foldSeries(series, k = 4L)
    assert(out.forall(!_._2))
    assert(out.map(_._1).max == 16L)
  }

  test("graded query ≡ driver-side fold over the zero-filled spine") {
    import org.apache.spark.sql.functions._
    val rows = Cusum.hourlyVolumeCusum(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val byType = rows.groupBy(_.getString(0))
    byType.foreach { case (tpe, rs) =>
      val ordered = rs.sortBy(_.getTimestamp(1).getTime)
      val cnts = ordered.map(_.getLong(2)).toSeq
      // consecutive spine: |rows| = hours between first and last + 1
      val span = (ordered.last.getTimestamp(1).getTime -
        ordered.head.getTimestamp(1).getTime) / 3600000L + 1
      assert(ordered.length.toLong == span, s"$tpe spine has gaps")
      val k = cnts.sum / cnts.length + 1
      val replay = Cusum.foldSeries(cnts, k)
      assert(ordered.map(_.getLong(3)).toSeq == replay.map(_._1), s"$tpe cusum")
      assert(ordered.map(_.getBoolean(4)).toSeq == replay.map(_._2), s"$tpe alarm")
    }
  }
}

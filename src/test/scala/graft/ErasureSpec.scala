package graft

import org.apache.spark.sql.functions._
import graft.operators.Erasure

/** Position-delete erasure: the deletion vector addresses real rows,
  * removes exactly the target class, and loses nothing else. */
class ErasureSpec extends SparkSpec {

  private def pred = substring(md5(col("user_id").cast("string")), 1, 1) === "a"

  test("the delete file addresses only real (file, position) pairs " +
      "and covers exactly the erased class") {
    val (data, dv) = Erasure.state(spark, sf0001)
    val copy = spark.read.parquet(data)
      .select(col("_metadata.file_path").as("file"),
        col("_metadata.row_index").as("pos"), col("user_id"))
    val dvRows = spark.read.parquet(dv).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(dvRows.nonEmpty, "empty deletion vector — vacuous erasure")
    val all = copy.collect()
      .map(r => ((r.getString(0), r.getLong(1)), r.getLong(2)))
    val byAddr = all.toMap
    assert(dvRows.forall(byAddr.contains), "DV addresses a ghost row")
    // the DV is exactly the erased class, by address
    val expect = all.collect { case (addr, uid)
      if md5Hex(uid).startsWith("a") => addr }.toSet
    assert(dvRows == expect)
  }

  test("erased view: zero residual rows of the target class; every " +
      "other row survives; stable across rebuilds") {
    val view = Erasure.erasedView(spark, sf0001)
    assert(view.filter(pred).count() == 0, "residual erased rows")
    val (data, _) = Erasure.state(spark, sf0001)
    val copy = spark.read.parquet(data)
    assert(view.count() == copy.filter(!pred).count())
    val a = graft.operators.Erasure.eventsPositionDelete(spark, sf0001)
      .collect().map(_.toSeq).toSeq
    val b = graft.operators.Erasure.eventsPositionDelete(spark, sf0001)
      .collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  private def md5Hex(v: Long): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(v.toString.getBytes("UTF-8"))
      .map(b => "%02x".format(b)).mkString
  }

  test("physical fold: erased rows' bytes are ABSENT from the " +
      "rewritten files (raw scan, no view logic), delete files are " +
      "retired, and content matches the logical view row-for-row") {
    val (folded, deletes) = Erasure.compactedState(spark, sf0001)
    // retirement: the folded snapshot references no delete file
    assert(deletes.isEmpty)
    // bytes gone, not filtered: a RAW scan of the rewritten files —
    // no anti-join, no predicate pushed by the reader — finds zero
    // rows of the erased class, while the pre-fold copy holds many
    val raw = spark.read.parquet(folded)
    assert(raw.filter(pred).count() == 0,
      "erased class still physically present after the fold")
    val (data, _) = Erasure.state(spark, sf0001)
    assert(spark.read.parquet(data).filter(pred).count() > 0,
      "vacuous fold: the pre-fold copy holds no erased rows")
    // pure layout change: folded content ≡ the logical erased view
    val cols = raw.columns.sorted.toIndexedSeq.map(col)
    val a = raw.select(cols: _*).collect().map(_.toSeq)
      .sortBy(_.mkString("|")).toSeq
    val b = Erasure.erasedView(spark, sf0001).select(cols: _*)
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    assert(a == b, "fold lost or duplicated rows")
    // and the folded files are range-clustered on the sort key:
    // per-file event_id intervals are disjoint (the Compaction layout)
    val ranges = raw
      .groupBy(col("_metadata.file_path").as("f"))
      .agg(min(col("event_id")).as("lo"), max(col("event_id")).as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(ranges.sliding(2).forall {
      case Array((_, hi1), (lo2, _)) => hi1 < lo2
      case _ => true
    }, s"overlapping per-file key ranges: ${ranges.mkString(",")}")
  }
}

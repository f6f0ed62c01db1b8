package graft

import org.apache.spark.sql.functions._
import graft.operators.IvfMaintained

/** IVF list maintenance: centroids frozen, base lists untouched by
  * the append, day-2 vectors fully wired into the probe path. */
class IvfMaintainedSpec extends SparkSpec {

  private def isNew(v: Long): Boolean = {
    val md = java.security.MessageDigest.getInstance("MD5")
    "%02x".format(md.digest(v.toString.getBytes("UTF-8"))(0)).charAt(0) < '2'
  }

  test("append adds files without rewriting base lists; the delta " +
      "holds exactly the new vectors' assignments; lists partition " +
      "the corpus") {
    val st = IvfMaintained.state(spark, sf0001)
    assert(st.baseFiles.nonEmpty && st.deltaFiles.nonEmpty)
    val now = st.baseFiles.keys.map(n =>
      n -> new java.io.File(st.root, n).length).toMap
    assert(now == st.baseFiles, "a base list file was rewritten")
    val delta = spark.read.parquet(
        st.deltaFiles.keys.map(n => s"${st.root}/$n").toSeq: _*)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val newIds = Tables(spark, sf0001, "embeddings")
      .select(col("vec_id")).collect().map(_.getLong(0)).filter(isNew).toSet
    assert(delta.map(_._1).toSet == newIds,
      "delta lists must hold the new vectors, all of them, only them")
    // every vector assigned exactly once, to a valid (base) centroid
    val all = spark.read.parquet(st.root).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(all.map(_._1).distinct.length == all.length,
      "a vector landed in two lists")
    assert(all.length ==
      Tables(spark, sf0001, "embeddings").count())
    val centIds = all.map(_._2).toSet
    assert(centIds.forall(c => !isNew(c)), "a centroid is a day-2 vector")
    assert(centIds.size <= st.nlist)
  }

  test("the probe path sees day-2 vectors: probed lists contain " +
      "members of both generations") {
    val st = IvfMaintained.state(spark, sf0001)
    val lists = spark.read.parquet(st.root).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // at least one list holds both a base and a new member — so the
    // maintained query genuinely competes the generations
    val byCid = lists.groupBy(_._2)
    assert(byCid.values.exists(ms =>
      ms.exists(m => isNew(m._1)) && ms.exists(m => !isNew(m._1))),
      "no list mixes generations — the append is invisible to probes")
  }
}

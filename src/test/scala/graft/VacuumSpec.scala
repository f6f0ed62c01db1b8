package graft

import org.apache.spark.sql.functions._
import graft.operators.Vacuum

/** Vacuum: dead files physically deleted, live snapshot untouched,
  * content parity preserved — and the delete never reaches outside
  * the layout it owns. */
class VacuumSpec extends SparkSpec {

  test("vacuum deletes exactly the expired v1 files, keeps v2 " +
      "byte-for-byte, and the surviving directory is the full table") {
    val st = Vacuum.state(spark, sf0001)
    // something real was deleted, and nothing live was
    assert(st.deleted.nonEmpty, "vacuous vacuum: nothing deleted")
    assert(st.live.nonEmpty)
    assert(st.deleted.intersect(st.live.keySet).isEmpty)
    // the deleted files are GONE from disk
    st.deleted.foreach { n =>
      assert(!new java.io.File(st.dataDir, n).exists(),
        s"dead file still on disk: $n")
    }
    // the live files survive with identical name + length
    val now = Option(new java.io.File(st.dataDir).listFiles)
      .getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .map(f => f.getName -> f.length).toMap
    assert(now == st.live, "a live file was touched by vacuum")
    // content parity: the post-vacuum directory IS the table
    val got = spark.read.parquet(st.dataDir)
      .select(col("o_orderkey"), col("o_totalprice")).collect()
      .map(_.toSeq).sortBy(_.mkString("|")).toSeq
    val expect = Tables(spark, sf0001, "orders")
      .select(col("o_orderkey"), col("o_totalprice")).collect()
      .map(_.toSeq).sortBy(_.mkString("|")).toSeq
    assert(got == expect, "vacuum lost or duplicated live rows")
  }

  test("the keep-set contract: vacuum refuses nothing it should " +
      "keep — a re-run with the same live set is a no-op") {
    val st = Vacuum.state(spark, sf0001)
    val deletedAgain = Vacuum.vacuum(st.dataDir, st.live.keySet)
    assert(deletedAgain.isEmpty, s"re-vacuum deleted: $deletedAgain")
  }
}

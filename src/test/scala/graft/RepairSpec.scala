package graft

import org.apache.spark.sql.functions._
import graft.operators.Integrity

/** Anti-entropy repair on sf0.001: detection localizes to exactly the
  * damaged bucket, the localized rewrite restores content parity, and
  * the repaired replica is row-identical to the source. */
class RepairSpec extends SparkSpec {
  import spark.implicits._

  test("detect → localize → repair: audit rows carry the real story") {
    val rows = Integrity.ordersRepairAudit(spark, sf0001).collect()
    assert(rows.length == 16)
    // exactly bucket 5 was damaged, by the md5-quarter rule
    val damagedRows = rows.filter(_.getAs[Boolean]("was_damaged"))
    assert(damagedRows.map(_.getAs[Long]("bucket")).toSeq == Seq(5L))
    val expectedDropped = Tables(spark, sf0001, "orders")
      .filter(pmod($"o_orderkey", lit(16L)) === 5L
        && substring(md5($"o_orderkey".cast("string")), 1, 1)
          .isin("0", "1", "2", "3")).count()
    assert(expectedDropped > 0, "damage rule matched nothing at sf0.001")
    assert(damagedRows.head.getAs[Long]("n_dropped") == expectedDropped)
    rows.filterNot(_.getAs[Boolean]("was_damaged"))
      .foreach(r => assert(r.getAs[Long]("n_dropped") == 0L, r.toString))
    // the live post-repair re-audit is clean everywhere
    assert(rows.forall(_.getAs[Boolean]("is_match_after")))
  }

  test("repaired replica is row-identical to the source") {
    val (replica, _) = Integrity.repairState(spark, sf0001)
    val src = Tables(spark, sf0001, "orders")
      .collect().map(_.toSeq).toSet
    val rep = spark.read.parquet(replica).drop("bucket")
      .select(Tables(spark, sf0001, "orders").columns.map(col)
        .toIndexedSeq: _*)
      .collect().map(_.toSeq).toSet
    assert(rep == src,
      s"diff: +${(rep -- src).take(2)} -${(src -- rep).take(2)}")
  }

  test("referential audit: all 7 star-schema edges clean on the driver " +
      "tables, counts equal the child cardinalities") {
    val rows = Integrity.dqReferentialAudit(spark, sf0001).collect()
    assert(rows.length == 7)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_orphan") == 0L, s"orphans at $r")
      assert(r.getAs[Long]("n_null") == 0L, s"null FKs at $r")
    }
    val li = Tables(spark, sf0001, "lineitem").count()
    assert(rows.filter(_.getAs[String]("edge").startsWith("lineitem."))
      .forall(_.getAs[Long]("n_child") == li))
  }

  test("referential audit detects a PLANTED orphan and a planted NULL, " +
      "and duplicate parent keys do not multiply child rows") {
    import spark.implicits._
    val child = Seq(Some(1L), Some(2L), Some(99L), None)
      .toDF("fk")
    // parent key 1 duplicated: existence semantics must count each
    // child row once
    val parent = Seq(1L, 1L, 2L).toDF("pk")
    val r = Integrity.auditEdge(child, "fk", parent, "pk", "t").collect()(0)
    assert(r.getAs[Long]("n_child") == 4L)
    assert(r.getAs[Long]("n_null") == 1L)
    assert(r.getAs[Long]("n_orphan") == 1L)
  }
}

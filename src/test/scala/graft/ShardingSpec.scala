package graft

import java.security.MessageDigest
import org.apache.spark.sql.functions._
import graft.operators.Sharding
import graft.plans.Kmv

/** HRW routing: the assignment equals a JVM recompute, the load report
  * folds it, and the minimal-disruption law holds literally — removing
  * shard 7 moves exactly shard 7's keys. */
class ShardingSpec extends SparkSpec {
  import spark.implicits._

  private def jvmAssign(n: Int): Map[Long, Long] = {
    val md = MessageDigest.getInstance("MD5")
    Tables(spark, sf0001, "documents")
      .select(col("doc_id")).as[Long].collect()
      .map { id =>
        val shard = (0L until n.toLong).maxBy { s =>
          (Kmv.u32(md, s"$id:$s".getBytes("UTF-8")), -s)
        }
        id -> shard
      }.toMap
  }

  test("assignment and load report equal the JVM recompute") {
    val want = jvmAssign(8)
    val got = Sharding.assignment(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
    val loads = Sharding.hrwShardLoad(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(loads == want.groupBy(_._2).view.mapValues(_.size.toLong).toMap)
    assert(loads.keySet.size == 8, "a shard received zero keys at n=500")
  }

  test("minimal disruption: the 7-shard assignment differs from the " +
      "8-shard one exactly on shard 7's keys") {
    val a8 = Sharding.assignment(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val a7 = Sharding.assignment(spark, sf0001, n = 7).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val moved = a8.keySet.filter(id => a8(id) != a7(id))
    assert(moved.nonEmpty, "shard 7 held no keys — vacuous")
    assert(moved == a8.keySet.filter(a8(_) == 7L),
      "a key not on the removed shard moved — HRW's minimal-disruption law broken")
  }
}

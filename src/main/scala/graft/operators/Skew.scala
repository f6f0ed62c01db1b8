package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation (SURVEY.md §4.2 "salting for skew"). AQE's runtime
  * skew-join split covers most cases; explicit salting is for the
  * pathological hot key (one promoter with 10⁸ fans) where even a
  * split partition of one key overwhelms an executor.
  *
  * Shape: the huge/skewed PROBE side gets a deterministic salt in
  * [0, n) derived from caller-chosen columns; the smaller BUILD side is
  * replicated n times (one copy per salt). The join key becomes
  * (key, salt), so one hot key spreads over n partitions. Replication
  * multiplies the build side by n — choose n ≈ hot-key-rows /
  * target-partition-rows, and keep the build side the smaller input.
  */
object Skew {

  /** Equi-join `left(leftKey) = right(rightKey)` with an n-way salt.
    * `saltBy` must be deterministic per row (e.g. a unique id column on
    * the probe side) — it only needs to DISTRIBUTE, not be unique. */
  def saltedJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, saltBy: Column, n: Int): DataFrame = {
    require(n > 0, s"salt fan-out must be positive, got $n")
    // withColumn would silently OVERWRITE a pre-existing __salt column
    // (e.g. a caller chaining salted joins) — fail loudly instead.
    require(!left.columns.contains("__salt") && !right.columns.contains("__salt"),
      "saltedJoin inputs must not already carry a __salt column")
    val l = left.withColumn("__salt", pmod(hash(saltBy), lit(n)))
    val r = right.withColumn("__salt",
      explode(lit((0 until n).toArray)))
    val joined = l.join(r,
      l(leftKey) === r(rightKey) && l("__salt") === r("__salt"))
    joined.drop(l("__salt")).drop(r("__salt"))
  }
}

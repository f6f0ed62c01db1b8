package graft

import org.apache.spark.sql.functions._
import graft.operators.EventOps

/** Custom HLL TypedImperativeAggregate (A6+): accuracy vs exact
  * distinct, and partition-invariance of the merged sketch. */
class HllSketchSpec extends SparkSpec {
  import spark.implicits._

  test("hll estimate is within 15% of exact distinct per type") {
    val est = EventOps.hllUsers(spark, sf0001)
      .select("event_type", "hll_users").as[(String, Double)].collect().toMap
    val exact = EventOps.distinctUsers(spark, sf0001)
      .select("event_type", "n_users").as[(String, Long)].collect().toMap
    assert(est.keySet == exact.keySet)
    exact.foreach { case (t, n) =>
      val rel = math.abs(est(t) - n) / n.toDouble
      assert(rel < 0.15, s"$t: est=${est(t)} exact=$n rel=$rel")
    }
  }

  test("sketch merge is partition-invariant (same estimate at any parallelism)") {
    graft.plans.SketchFunctions.register(spark)
    def run(parts: Int) =
      Tables(spark, sf0001, "events").repartition(parts)
        .groupBy(col("event_type"))
        .agg(expr("hll_sketch(CAST(user_id AS STRING))").as("h"))
        .select(col("event_type"), col("h.estimate"), col("h.n_zero"), col("h.sum_pow"))
        .orderBy("event_type").collect()
    assert(run(1).sameElements(run(13)))
  }

  test("CMS never underestimates and is exact without collisions") {
    graft.plans.CmsSketch.register(spark)
    val r = graft.operators.TextOps.cmsTermCounts(spark, sf0001).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val exact = row.getAs[Long]("n_exact")
      val cms = row.getAs[Long]("n_cms")
      assert(cms >= exact,
        s"CMS underestimated ${row.getAs[String]("term")}: $cms < $exact")
    }
  }

  test("CMS merge is partition-invariant") {
    graft.plans.CmsSketch.register(spark)
    def run(parts: Int) =
      Tables(spark, sf0001, "documents").repartition(parts)
        .select(explode(split(col("text"), " ")).as("t"))
        .filter(col("t") =!= "")
        .agg(expr("cms_sketch(t)").as("cms"))
        .selectExpr("cms").collect()(0).getSeq[Long](0)
    assert(run(1) == run(7))
  }

  test("null keys are ignored, empty groups estimate 0") {
    graft.plans.SketchFunctions.register(spark)
    val df = Seq(("a", Some("x")), ("a", Some("y")), ("a", None), ("b", None))
      .toDF("g", "k")
      .groupBy("g").agg(expr("hll_sketch(k)").as("h"))
      .select(col("g"), col("h.estimate").as("e"))
      .orderBy("g").collect()
    assert(df(0).getDouble(1) > 1.5 && df(0).getDouble(1) < 2.5) // ~2 distinct
    assert(df(1).getDouble(1) == 0.0) // all-null group → linear count of m/m
  }
}

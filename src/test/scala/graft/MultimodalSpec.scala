package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.operators.Multimodal.MediaRow
import graft.functions.TypedAggs

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("mapPartitions decode path ≡ expression path (stubbed decode)") {
    val media = Multimodal.mediaTable(spark, sf0001).as[MediaRow]
    val viaMapPartitions = Multimodal.extractFeatures(media)
      .select("doc_id", "kind", "f0", "f1", "f2", "f3")
      .orderBy("doc_id").collect()
    val viaExpressions = Multimodal.mediaFeatures(spark, sf0001)
      .orderBy("doc_id").collect()
    assert(viaMapPartitions.length == viaExpressions.length)
    viaMapPartitions.zip(viaExpressions).foreach { case (a, b) =>
      assert(a == b, s"mismatch: $a vs $b")
    }
  }

  test("media payloads are opaque binary with typed metadata") {
    val df = Multimodal.mediaTable(spark, sf0001)
    assert(df.schema("payload").dataType.typeName == "binary")
    assert(df.filter(length($"payload") =!= 16).count() == 0)
    val kinds = df.select("kind").distinct().as[String].collect().toSet
    assert(kinds == Set("image", "audio", "video"))
  }

  test("U3: typed aggregator matches the untyped decimal formula") {
    val typed = TypedAggs.typedAggStats(spark, sf0001)
      .orderBy("c_mktsegment").collect()
    val untyped = Tables(spark, sf0001, "customer")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n"),
        graft.functions.ScalarFns.rateAvg($"c_acctbal").as("avg_acctbal"))
      .orderBy("c_mktsegment").collect()
    typed.zip(untyped).foreach { case (t, u) =>
      assert(t.getAs[Long]("n") == u.getAs[Long]("n"))
      assert(t.getAs[Double]("avg_acctbal") == u.getAs[Double]("avg_acctbal"))
    }
  }
}

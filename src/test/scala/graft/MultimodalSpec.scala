package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.operators.Multimodal.MediaRow
import graft.functions.TypedAggs

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("REAL ImageIO decode path ≡ expression path") {
    val media = Multimodal.mediaTable(spark, sf0001).as[MediaRow]
    val viaImageIo = Multimodal.extractFeatures(media)
      .select("doc_id", "kind", "f0", "f1", "f2", "f3")
      .orderBy("doc_id").collect()
    val viaExpressions = Multimodal.mediaFeatures(spark, sf0001)
      .orderBy("doc_id").collect()
    assert(viaImageIo.length == viaExpressions.length)
    viaImageIo.zip(viaExpressions).foreach { case (a, b) =>
      assert(a == b, s"mismatch: $a vs $b")
    }
  }

  test("payloads are genuine decodable 2x2 images with md5-derived pixels") {
    val sample = Multimodal.mediaTable(spark, sf0001)
      .join(Tables(spark, sf0001, "documents").select($"doc_id", $"text"), "doc_id")
      .select($"payload", $"text").limit(5).collect()
    sample.foreach { r =>
      val payload = r.getAs[Array[Byte]]("payload")
      assert(payload.length == Multimodal.BmpBytes)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      assert(img != null, "ImageIO could not decode the payload")
      assert(img.getWidth == 2 && img.getHeight == 2)
      // decoded bottom-row pixel channels == md5(text) bytes 0..2 (BGR)
      val md5b = java.security.MessageDigest.getInstance("MD5")
        .digest(r.getAs[String]("text").getBytes("UTF-8"))
      val p = img.getRGB(0, img.getHeight - 1)
      assert((p & 0xff) == (md5b(0) & 0xff), "blue != md5 byte 0")
      assert(((p >> 8) & 0xff) == (md5b(1) & 0xff), "green != md5 byte 1")
      assert(((p >> 16) & 0xff) == (md5b(2) & 0xff), "red != md5 byte 2")
    }
  }

  test("media payloads are opaque binary with typed metadata") {
    val df = Multimodal.mediaTable(spark, sf0001)
    assert(df.schema("payload").dataType.typeName == "binary")
    assert(df.filter(length($"payload") =!= Multimodal.BmpBytes).count() == 0)
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

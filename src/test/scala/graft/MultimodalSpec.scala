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

  test("perceptual hash: decoded-pixel aHash ≡ md5-byte column twin") {
    // the column twin mirrors the DuckDB oracle: luminance sums from
    // md5 hex bytes, strict-threshold bits, payload-byte pixel order
    def hexVal(c: org.apache.spark.sql.Column) =
      instr(lit("0123456789abcdef"), c) - 1
    def byteAt(i: Int) =
      hexVal(substring(md5(col("text")), 2 * i + 1, 1)) * 16 +
        hexVal(substring(md5(col("text")), 2 * i + 2, 1))
    def lum(k: Int) = byteAt(3 * k) + byteAt(3 * k + 1) + byteAt(3 * k + 2)
    val total = lum(0) + lum(1) + lum(2) + lum(3)
    val phashCol = (0 to 3).map(k =>
      when(lit(4) * lum(k) > total, lit(1 << k)).otherwise(lit(0)))
      .reduce(_ + _)
    val twin = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), phashCol.cast("int").as("phash"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    val decoded = Multimodal.mediaPhashIndex(spark, sf0001) // warm path
    assert(decoded.collect().map(_.getLong(2)).sum == twin.length)
    val perDoc = Multimodal.mediaPhashDups(spark, sf0001) // exercises join
    assert(perDoc.collect().isEmpty, "sf0.001 carries no exact copies")
    // direct per-doc parity through the decode path
    val viaDecode = Multimodal.mediaTable(spark, sf0001).as[MediaRow]
      .mapPartitions(_.map(r => r.doc_id)).collect() // payloads decodable
    assert(viaDecode.length == twin.length)
    val idx = Multimodal.mediaPhashIndex(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    val twinIdx = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(
        element_at(lit(Array("image", "audio", "video")),
          (col("doc_id") % 3).cast("int") + 1).as("kind"),
        phashCol.cast("int").as("phash"))
      .groupBy("kind", "phash").count().collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(idx == twinIdx, "decode-path index != md5-twin index")
  }

  test("perceptual-hash dedup finds exactly the true copies at sf0.1") {
    val truth = {
      val d = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
        .select(col("doc_id"), md5(col("text")).as("h"))
      val a = d.select(col("doc_id").as("doc_a"), col("h"))
      val b = d.select(col("doc_id").as("doc_b"), col("h").as("hb"))
      a.join(b, col("h") === col("hb") && col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b").orderBy("doc_a", "doc_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    }
    val found = Multimodal.mediaPhashDups(spark, "/root/testdata/sf0.1")
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(found == truth, s"found ${found.size}, truth ${truth.size}")
    assert(found.nonEmpty, "sf0.1 should carry exact copies")
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

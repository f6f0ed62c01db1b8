package graft

import org.apache.spark.sql.functions._
import graft.operators.Chunking

/** Chunking: every graded row re-derived from the raw texts in plain
  * JVM code — slice content, coverage, the emit rule, and the
  * cross-doc duplicate set. */
class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  private val C = Chunking.Chunk
  private val S = Chunking.Stride

  private def rawDocs(): Map[Long, Array[String]] =
    Tables(spark, sf0001, "documents")
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect()
      .map { case (id, text) => id -> text.split(" ").filter(_.nonEmpty) }
      .toMap

  private def jvmChunks(t: Array[String]): Seq[(Long, Long, Long, String)] = {
    val n = t.length
    Iterator.from(0).map(_ * S).takeWhile(_ < n)
      .filter(s => s == 0 || s + (C - S) < n)
      .zipWithIndex.map { case (s, _) =>
        val slice = t.slice(s, math.min(s + C, n))
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest(slice.mkString(" ").getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        ((s / S).toLong, s.toLong, slice.length.toLong, hex)
      }.toSeq
  }

  test("chunk index: content hashes, offsets and ordinals exactly as the JVM rule") {
    val docs = rawDocs()
    val got = Chunking.docChunksIndex(spark, sf0001).collect()
      .groupBy(_.getLong(0))
    assert(got.keySet == docs.keySet)
    docs.foreach { case (id, t) =>
      val want = jvmChunks(t)
      val rows = got(id).sortBy(_.getLong(1))
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toSeq
      assert(rows == want, s"doc $id")
    }
  }

  test("coverage: chunks cover every token; no chunk is fully inside its predecessor") {
    val docs = rawDocs()
    Chunking.docChunksIndex(spark, sf0001).collect()
      .groupBy(_.getLong(0)).foreach { case (id, rows) =>
        val n = docs(id).length
        val sorted = rows.sortBy(_.getLong(2))
          .map(r => (r.getLong(2), r.getLong(2) + r.getLong(3))).toSeq
        assert(sorted.head._1 == 0L, s"doc $id starts at 0")
        assert(sorted.last._2 == n.toLong, s"doc $id last chunk reaches the end")
        sorted.sliding(2).foreach {
          case Seq((_, e1), (s2, e2)) =>
            assert(s2 <= e1, s"doc $id: gap before token $s2")
            assert(e2 > e1, s"doc $id: chunk ending $e2 adds no new token")
          case _ =>
        }
      }
  }

  test("cross-doc duplicate chunks match the brute-force recompute (and are present)") {
    val docs = rawDocs()
    val all = docs.toSeq.flatMap { case (id, t) =>
      jvmChunks(t).map { case (_, _, _, h) => (h, id) }
    }
    val want = all.groupBy(_._1)
      .filter { case (_, occ) => occ.map(_._2).distinct.size > 1 }
      .map { case (h, occ) =>
        h -> (occ.map(_._2).distinct.size.toLong, occ.size.toLong)
      }
    val got = Chunking.dupChunksCrossDoc(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == want)
    assert(got.nonEmpty, "the near-dup plants must produce shared chunks")
  }

  test("stats: overlap mass is non-negative and consistent with the index") {
    val idx = Chunking.docChunksIndex(spark, sf0001)
    val bySrcIdx = idx
      .join(Tables(spark, sf0001, "documents").select("doc_id", "source"),
        Seq("doc_id"))
      .groupBy("source")
      .agg(count(lit(1)).as("n"), sum("n_tokens").as("ct"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val stats = Chunking.chunkStatsBySource(spark, sf0001).collect()
    assert(stats.nonEmpty)
    stats.foreach { r =>
      val src = r.getString(0)
      assert((r.getLong(2), r.getLong(4)) == bySrcIdx(src), src)
      assert(r.getLong(5) == r.getLong(4) - r.getLong(3), src)
      assert(r.getLong(5) >= 0L, src)
    }
  }
}

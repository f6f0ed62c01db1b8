package graft

import org.apache.spark.sql.functions._
import graft.operators.{Chunking, IndexErasure}

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

  test("chunk store lifecycle: append leaves base files untouched; the " +
      "maintained store equals one-shot chunking; erasure retires exactly " +
      "the erase class's chunks from base-generation files only") {
    val st = Chunking.state(spark, sf0001)
    // file discipline: both generations present, base set frozen
    assert(st.baseFiles.nonEmpty && st.deltaFiles.nonEmpty)
    val nowFiles = new java.io.File(st.root).listFiles
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .map(f => f.getName -> f.length).toMap
    st.baseFiles.foreach { case (n, len) =>
      assert(nowFiles.get(n).contains(len), s"base file $n touched") }
    // maintained ≡ one-shot
    val maintained = Chunking.chunkStoreMaintained(spark, sf0001)
      .collect().map(_.toString).sorted.toSeq
    val oneShot = Chunking.docChunksIndex(spark, sf0001)
      .collect().map(_.toString).sorted.toSeq
    assert(maintained == oneShot)
    // erased view: exactly the survivors' chunks; delta in base gen only
    def isErased(id: Long): Boolean = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(id.toString.getBytes("UTF-8")).map("%02x".format(_))
        .mkString.startsWith("a")
    }
    val erased = Chunking.chunkStoreErased(spark, sf0001).collect()
    assert(erased.forall(r => !isErased(r.getLong(0))))
    val survivorRows = Chunking.docChunksIndex(spark, sf0001).collect()
      .filter(r => !isErased(r.getLong(0))).map(_.toString).sorted.toSeq
    assert(erased.map(_.toString).sorted.toSeq == survivorRows)
    assert(erased.length < oneShot.length, "erasure retired nothing — vacuous")
    // the delete delta addresses base-generation files only ('a' ⊂ base)
    val dv = IndexErasure.deleteDelta(spark, st.root,
      IndexErasure.erased(col("doc_id")))
    val dvFiles = spark.read.parquet(dv)
      .select(col("file")).distinct().collect()
      .map(_.getString(0).split("/").last).toSet
    assert(dvFiles.nonEmpty)
    dvFiles.foreach(f => assert(st.baseFiles.contains(f),
      s"delete delta addresses non-base file $f"))
    // chunk dedup forgets: erased dup report ≡ brute force over survivors,
    // and at least one hash lost a carrier vs the full report
    val dupErased = Chunking.dupChunksErased(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val bruteDup = Chunking.docChunksIndex(spark, sf0001).collect()
      .filter(r => !isErased(r.getLong(0)))
      .groupBy(_.getString(4))
      .filter { case (_, rs) => rs.map(_.getLong(0)).distinct.length > 1 }
      .map { case (h, rs) =>
        h -> (rs.map(_.getLong(0)).distinct.length.toLong, rs.length.toLong) }
    assert(dupErased == bruteDup)
  }

  test("streamed ingest: the stream-built chunk store equals the one-shot " +
      "index row-for-row, across >= 2 micro-batches with per-batch sinks") {
    val got = Chunking.chunkStoreStreamed(spark, sf0001)
      .collect().map(_.toString).sorted.toSeq
    val want = Chunking.docChunksIndex(spark, sf0001)
      .collect().map(_.toString).sorted.toSeq
    assert(got == want)
    // real chopping happened: base + at least two batch dirs
    val root = new java.io.File(
      s"${Chunking.streamedChunksDir(spark, sf0001)}/chunks")
    val gens = root.listFiles.filter(_.isDirectory).map(_.getName).toSet
    assert(gens.contains("base") && gens.contains("b0") && gens.contains("b1"),
      s"expected base+b0+b1 generations, got $gens")
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

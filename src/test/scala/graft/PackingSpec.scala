package graft

import org.apache.spark.sql.functions._
import graft.operators.Packing

/** Sequence packing on sf0.001: the two-phase distributed prefix sum
  * is row-identical to the naive single-window cumsum; pack accounting
  * conserves tokens and covers the stream. */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("two-phase prefix sum ≡ single-window cumsum, row for row") {
    val twoPhase = Packing.positioned(spark, sf0001)
      .select("doc_id", "cum_start", "cum_end")
      .collect().map(_.toSeq).toSet
    val naive = Packing.positionedNaive(spark, sf0001)
      .select("doc_id", "cum_start", "cum_end")
      .collect().map(_.toSeq).toSet
    assert(twoPhase == naive,
      s"diff: +${(twoPhase -- naive).take(3)} -${(naive -- twoPhase).take(3)}")
  }

  test("positions tile the token stream: starts meet ends, no gaps") {
    val p = Packing.positioned(spark, sf0001)
      .select($"cum_start".as[Long], $"cum_end".as[Long], $"tok".as[Long])
      .collect().sortBy(_._1)
    // first doc starts at 0; every doc starts where the previous ended
    assert(p.head._1 == 0L)
    p.sliding(2).foreach { case Array(a, b) =>
      assert(b._1 == a._2, s"gap: ${a._2} -> ${b._1}")
    case _ => () }
    // widths are the token counts; total equals the corpus sum
    assert(p.forall(r => r._2 - r._1 == r._3))
    assert(p.last._2 == p.map(_._3).sum)
  }

  test("pack accounting: straddles and cuts are consistent with the " +
    "pack count") {
    val rows = Packing.docPackChunks(spark, sf0001).collect()
    val totalTokens = rows.map(_.getAs[Long]("total_tokens")).sum
    val nPacks = rows.head.getAs[Long]("n_packs_total")
    assert(nPacks == (totalTokens + Packing.PackTokens - 1)
      / Packing.PackTokens)
    // every interior pack boundary is cut by exactly one doc (docs
    // tile the stream), unless it lands exactly between two docs —
    // so Σ cuts ≤ boundaries, and straddles ≤ cuts (a doc can cross
    // several boundaries only when longer than a pack)
    val cuts = rows.map(_.getAs[Long]("n_boundary_cuts")).sum
    val straddles = rows.map(_.getAs[Long]("n_straddle")).sum
    assert(cuts <= nPacks - 1)
    assert(straddles <= cuts)
    assert(straddles > 0, "corpus too small to exercise straddling")
  }

  test("shard manifest: segments reconcile with docs + cuts; every doc " +
    "starts exactly once") {
    val m = graft.operators.Packing.shardManifest(spark, sf0001).collect()
    assert(m.map(_.getAs[Long]("shard_id")).toSeq == (0L to 7L))
    val chunks = graft.operators.Packing.docPackChunks(spark, sf0001)
      .collect()
    val nDocs = chunks.map(_.getAs[Long]("n_docs")).sum
    val cuts = chunks.map(_.getAs[Long]("n_boundary_cuts")).sum
    val totalTokens = chunks.map(_.getAs[Long]("total_tokens")).sum
    assert(m.map(_.getAs[Long]("n_segments")).sum == nDocs + cuts,
      "one segment per doc plus one per boundary cut")
    assert(m.map(_.getAs[Long]("n_docs_start")).sum == nDocs)
    assert(m.map(_.getAs[Long]("tokens_start")).sum == totalTokens)
  }

  test("append-stable packing: day-1 pack assignments are a frozen " +
    "prefix — identical to a day-1-only run") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val P = graft.operators.Packing
    // the gen-ordered full-corpus positions, day-1 slice
    val full = P.positioned(spark, sf0001, genOrdered = true)
      .filter(substring(col("h"), 1, 1) >= "2")
      .select(col("doc_id"), col("cum_start"), col("cum_end"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
      .toMap
    // an independent day-1-ONLY packing: filter first, then cumsum
    val w = Window.orderBy(col("h"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val alone = spark.read.parquet(s"$sf0001/documents.parquet")
      .withColumn("h", md5(col("doc_id").cast("string")))
      .filter(substring(col("h"), 1, 1) >= "2")
      .withColumn("tok", size(expr(
        s"regexp_extract_all(text, '${graft.operators.TextOps.bpePattern}', 0)"))
        .cast("long"))
      .withColumn("cum_end", sum(col("tok")).over(w))
      .withColumn("cum_start", col("cum_end") - col("tok"))
      .select(col("doc_id"), col("cum_start"), col("cum_end"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
      .toMap
    assert(full == alone,
      "appending day-2 docs must not move any day-1 position")
    // and the appended generation only ADDS packs at the end
    assert(full.nonEmpty && full.size < P.positioned(spark, sf0001,
      genOrdered = true).count())
  }
}

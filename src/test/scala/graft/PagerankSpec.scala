package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Integer fixed-point PageRank over the near-dup graph: exact
  * agreement with a driver-side recompute of the recurrence, mass
  * conservation up to floor loss, determinism. */
class PagerankSpec extends SparkSpec {

  test("pagerank ≡ driver-side integer recurrence, exactly") {
    val S = 1000000000000L
    val ranked = Similarity.neardupPagerank(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(ranked.nonEmpty, "empty near-dup graph at sf0.001")
    // independent recompute from the raw pair list
    val pairs = Similarity.neardupPairs(spark, sf0001)
      .filter(col("jaccard") >= 0.5).select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = pairs.flatMap(p => Seq(p, p.swap))
    val deg = edges.groupBy(_._1).map { case (v, es) => v -> es.length.toLong }
    val n = deg.size.toLong
    val base = S / n
    var r: Map[Long, Long] = deg.keys.map(_ -> base).toMap
    for (_ <- 1 to 3) {
      val c = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => r(src) / deg(src) }.sum
      }
      r = deg.keys.map(v => v -> (15L * base + 85L * c.getOrElse(v, 0L)) / 100L)
        .toMap
    }
    ranked.foreach { case (doc, d, rank) =>
      assert(deg(doc) == d, s"degree mismatch for $doc")
      assert(r(doc) == rank, s"rank mismatch for $doc: ${r(doc)} vs $rank")
    }
    assert(ranked.length == n.toInt)
  }

  test("rank mass is conserved up to per-node floor loss") {
    val rows = Similarity.neardupPagerank(spark, sf0001).collect()
    val S = 1000000000000L
    val total = rows.map(_.getLong(2)).sum
    val n = rows.length.toLong
    // each division floors away < 1 unit per operand per round; 3
    // rounds, ≤ edges+nodes divisions — bound loosely by 300 per node
    assert(total <= S)
    assert(total >= S - 300L * n - S % n * 2, s"mass $total of $S")
  }

  test("deterministic across shuffle-partition settings") {
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    val a = Similarity.neardupPagerank(spark, sf0001)
      .collect().map(_.toString).toSeq
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "5")
      val b = Similarity.neardupPagerank(spark, sf0001)
        .collect().map(_.toString).toSeq
      assert(a == b)
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.operators.GraphOps

/** kNN-graph BFS: distance-certificate invariants that pin the hop
  * labels to true BFS semantics without re-deriving the oracle. */
class GraphOpsSpec extends SparkSpec {

  private lazy val edges: Map[Long, Set[Long]] =
    GraphOps.knnEdges(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (s, es) => s -> es.map(_._2).toSet }

  private lazy val hops: Map[Long, Long] =
    GraphOps.knnBfsHops(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap

  test("edge set is symmetric and irreflexive") {
    assert(edges.nonEmpty)
    edges.foreach { case (s, ds) =>
      assert(!ds.contains(s), s"self-loop at $s")
      ds.foreach(d => assert(edges(d).contains(s), s"asymmetric $s->$d"))
    }
  }

  test("every node keeps at least 2 neighbors (top-2 out-degree, " +
      "symmetrization only adds)") {
    edges.foreach { case (s, ds) =>
      assert(ds.size >= 2, s"node $s has degree ${ds.size}")
    }
  }

  test("seeds are exactly the mod-97 vertices, at hop 0") {
    val seeds = edges.keySet.filter(_ % 97 == 0)
    assert(seeds.nonEmpty, "no seeds in graph at sf0.001")
    assert(hops.filter(_._2 == 0L).keySet == seeds)
  }

  test("hop labels are valid BFS distances: every hop-h>0 node has a " +
      "hop-(h-1) neighbor and none closer") {
    assert(hops.nonEmpty)
    hops.foreach { case (v, h) =>
      if (h > 0) {
        val nbr = edges(v).flatMap(hops.get)
        assert(nbr.min == h - 1,
          s"$v at hop $h has nearest labeled neighbor at ${nbr.min}")
      }
    }
  }

  test("frontier closure: an unreached node never touches a labeled " +
      "node at hop < cap (the cap is the only reason it is missing)") {
    val unreached = edges.keySet -- hops.keySet
    unreached.foreach { v =>
      val labeled = edges(v).flatMap(hops.get)
      assert(labeled.forall(_ >= 6), s"unreached $v adjacent to hop " +
        s"${if (labeled.isEmpty) "none" else labeled.min}")
    }
  }

  test("deterministic across shuffle-partition settings") {
    val a = hops
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val b = GraphOps.knnBfsHops(spark, sf0001).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(a == b)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}

package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.Similarity

/** ScalaCheck-generated graphs vs a brute-force union-find: the
  * pointer-jumping connected-components loop is the subtlest algorithm
  * in the repo (its correctness argument rests on three invariants —
  * labels stay in-component, labels are pointwise non-increasing, the
  * combined operator's fixpoint is the component min), so random graphs
  * check the RESULT against an implementation too simple to be wrong.
  * (Raw Gen sampling with a fixed seed — deterministic, same pattern as
  * FilterAlgebraPropSpec.) */
class ComponentsPropSpec extends SparkSpec {
  import spark.implicits._

  /** Random undirected graph: n vertices with arbitrary (possibly
    * colliding/self-loop-free) edges — shapes include chains, cliques,
    * stars, and isolated clumps. */
  private val genGraph: Gen[(Int, Seq[(Long, Long)])] = for {
    n <- Gen.choose(2, 28)
    m <- Gen.choose(0, 40)
    edges <- Gen.listOfN(m, for {
      a <- Gen.choose(0L, (n - 1).toLong)
      b <- Gen.choose(0L, (n - 1).toLong) if a != b
    } yield (math.min(a, b), math.max(a, b)))
  } yield (n, edges.distinct)

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = {
      var r = x
      while (parent(r) != r) r = parent(r)
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // path-compress to roots, label = component-minimum vertex
    (0 until n).map(v => v.toLong -> find(v).toLong).toMap
  }

  private def samples[T](g: Gen[T], k: Int): Seq[T] =
    (0 until k).flatMap(i => g.apply(Gen.Parameters.default, Seed(7L + i)))

  test("random graphs: BOTH component paths == brute-force union-find") {
    samples(genGraph, 12).foreach { case (n, rawEdges) =>
      if (rawEdges.nonEmpty) {
        val pairs = rawEdges.toDF("src", "dst")
        val edges = pairs.union(pairs.select($"dst".as("src"), $"src".as("dst")))
        val want = unionFind(n, rawEdges)
        // the Spark paths only label edge-endpoint vertices; isolated
        // vertices are the callers' left-join (trivially label = self)
        val endpoints = rawEdges.flatMap(e => Seq(e._1, e._2)).toSet
        val expected = want.view.filterKeys(endpoints).toMap
        // the gate (these graphs are tiny, so this IS the local path)…
        val (local, r0) = Similarity.connectedComponents(edges)
        val gotLocal = local.as[(Long, Long)].collect().toMap
        local.unpersist()
        assert(r0 == 0, s"tiny graph should take the local path")
        assert(gotLocal == expected,
          s"n=$n edges=$rawEdges (local): $gotLocal != expected")
        // …and the distributed loop on the same graph
        val (labels, rounds) = Similarity.connectedComponentsLoop(edges)
        val got = labels.as[(Long, Long)].collect().toMap
        labels.unpersist()
        assert(got == expected,
          s"n=$n edges=$rawEdges rounds=$rounds (loop): $got != expected")
      }
    }
  }

  test("loop-path labels come back on REBUILDABLE lineage (r5 advice)") {
    val pairs = Seq((0L, 1L), (1L, 2L), (5L, 6L)).toDF("src", "dst")
    val edges = pairs.union(pairs.select($"dst".as("src"), $"src".as("dst")))
    val (labels, rounds) = Similarity.connectedComponentsLoop(edges)
    assert(rounds > 0)
    // the converged frame must bottom out in a file scan — the in-loop
    // localCheckpoint blocks are RELEASED as the loop advances, so an
    // RDD-backed result would raise "checkpoint block not found" on
    // any action after a block drop instead of recomputing
    val leaves = labels.queryExecution.analyzed.collectLeaves()
    assert(leaves.nonEmpty && leaves.forall(
      _.isInstanceOf[org.apache.spark.sql.execution.datasources.LogicalRelation]),
      s"loop labels not file-backed: ${labels.queryExecution.analyzed}")
    // and repeated actions (the rebuild contract's observable) agree
    val once = labels.as[(Long, Long)].collect().toMap
    assert(once == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 5L -> 5L, 6L -> 5L))
    assert(labels.as[(Long, Long)].collect().toMap == once)
  }
}

package graft

import graft.operators.Similarity

/** Multi-round Lloyd refinement (N3++): round plumbing, drift
  * trajectory, and the iterate-to-convergence control loop. */
class KmeansSpec extends SparkSpec {
  import spark.implicits._

  test("round 1 of the R-indexed path is exactly the original single round") {
    val a1 = Similarity.kmeansAssign(spark, sf0001)
      .as[(Long, Long)].collect().toSeq
    val aR = Similarity.kmeansAssignR(spark, sf0001, 1)
      .as[(Long, Long)].collect().toSeq
    assert(a1 == aR)
  }

  test("drift trajectory: per-round rows, drifts in (0, 1], round 2 no looser than round 1") {
    val rows = Similarity.kmeansRoundDrift(spark, sf0001)
      .as[(Long, Long, Double)].collect()
    val byRound = rows.groupBy(_._1)
    assert(byRound.keySet == Set(1L, 2L), "expected exactly rounds 1 and 2")
    assert(rows.forall { case (_, _, d) => d > 0.0 && d <= 1.0 },
      "cosine drift out of range")
    // Lloyd monotonicity (in aggregate): the mean movement cannot grow
    // as the assignment stabilizes
    def meanDrift(r: Long) = {
      val ds = byRound(r).map(_._3); ds.sum / ds.length
    }
    assert(meanDrift(2L) >= meanDrift(1L) - 1e-9,
      s"round-2 mean drift ${meanDrift(2L)} worse than round-1 ${meanDrift(1L)}")
  }

  test("converged assignment is a total assignment under round-2 centroids") {
    val n = spark.read.parquet(s"$sf0001/embeddings.parquet").count()
    val assign = Similarity.kmeansConvergedAssign(spark, sf0001)
    assert(assign.count() == n, "every vector must be assigned")
    assert(assign.select("vec_id").distinct().count() == n,
      "assignment must be unique per vector")
  }

  test("convergence loop stops once min drift reaches 1 - eps, and runs >= 2 rounds when asked to") {
    // generous eps: on this corpus the loop must terminate well before
    // maxRounds, and the frozen round must be >= 2 with a strict eps
    val (_, rLoose) = Similarity.kmeansConverge(spark, sf0001, eps = 0.5)
    assert(rLoose == 1, "eps=0.5 should accept the first round")
    val (cent, rStrict) = Similarity.kmeansConverge(spark, sf0001,
      eps = 1e-12, maxRounds = 3)
    assert(rStrict >= 2, "a strict eps must force multiple rounds")
    assert(rStrict <= 3 && cent.count() > 0)
  }

  test("graded convergence twin ≡ the production loop at the shared eps/cap") {
    val (_, rLoop) = Similarity.kmeansConverge(spark, sf0001)
    val row = Similarity.kmeansConvergedRounds(spark, sf0001)
      .as[(Long, Double)].collect().head
    assert(row._1 == rLoop.toLong,
      s"graded rounds_run ${row._1} != loop's $rLoop")
    assert(row._2 >= 1.0 - Similarity.KmeansEps || rLoop == Similarity.KmeansMaxRounds,
      "a converged run must report min_drift at/above the threshold")
    assert(row._2 > 0.0 && row._2 <= 1.0)
  }
}

package graft

import graft.sources.ResultCache

/** S6 TTL result cache (reference SCALING.md:87-99 — md5(filters) key,
  * 300 s TTL) — hit/miss/expiry semantics with an injected clock. */
class ResultCacheSpec extends SparkSpec {
  import spark.implicits._

  override def withFixture(test: NoArgTest) = {
    ResultCache.clear()
    try super.withFixture(test)
    finally {
      ResultCache.clear()
      ResultCache.clock = () => System.currentTimeMillis()
    }
  }

  test("S6: key is the md5 of the descriptor (reference key shape)") {
    assert(ResultCache.key("abc") == "900150983cd24fb0d6963f7d28e17f72")
  }

  /** "Is it pinned" probes BOTH storage homes: the Dataset-level
    * persist (CacheManager — where current entries' serving copies
    * live) and the LogicalRDD's underlying RDD (where the r4-era
    * checkpoint blocks lived — kept so the probe stays honest for any
    * frame persisted either way). */
  private def pinned(df: org.apache.spark.sql.DataFrame): Boolean = {
    val atDataset =
      df.storageLevel != org.apache.spark.storage.StorageLevel.NONE
    val atRdd = df.queryExecution.logical match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.getStorageLevel != org.apache.spark.storage.StorageLevel.NONE
      case _ => false
    }
    atDataset || atRdd
  }

  test("S6: second lookup within TTL is a hit — build runs once") {
    var now = 1_000_000L
    ResultCache.clock = () => now
    var builds = 0
    def lookup() = ResultCache.getOrCompute("filters-a", 300) {
      builds += 1; Seq(1, 2, 3).toDF("x")
    }
    val first = lookup().collect()
    now += 299 * 1000
    val second = lookup().collect()
    assert(builds == 1 && ResultCache.misses == 1)
    assert(first.sameElements(second))
  }

  test("S6: lookup after TTL expiry rebuilds") {
    var now = 1_000_000L
    ResultCache.clock = () => now
    var builds = 0
    def lookup() = ResultCache.getOrCompute("filters-b", 300) {
      builds += 1; Seq(builds).toDF("x")
    }
    assert(lookup().collect().map(_.getInt(0)).sameElements(Array(1)))
    now += 301 * 1000
    // expired: the rebuilt result is served, not the stale one
    assert(lookup().collect().map(_.getInt(0)).sameElements(Array(2)))
    assert(builds == 2)
  }

  test("S6: different descriptors never share an entry") {
    ResultCache.clock = () => 1_000_000L
    val a = ResultCache.getOrCompute("filters-c", 300)(Seq(1).toDF("x"))
    val b = ResultCache.getOrCompute("filters-d", 300)(Seq(2).toDF("x"))
    assert(a.collect().head.getInt(0) == 1)
    assert(b.collect().head.getInt(0) == 2)
    assert(ResultCache.misses == 2)
  }

  test("S6: expired entries are swept (unpersisted) on unrelated lookups") {
    var now = 1_000_000L
    ResultCache.clock = () => now
    val a = ResultCache.getOrCompute("filters-e", 1)(Seq(1).toDF("x"))
    assert(pinned(a))
    now += 301 * 1000
    // looking up a DIFFERENT key must still evict+release filters-e —
    // TTL bounds retention, not just reuse
    ResultCache.getOrCompute("filters-f", 300)(Seq(2).toDF("x"))
    assert(!pinned(a),
      "expired entry's blocks were not released by the sweep")
  }

  test("S6: concurrent lookups of one key build exactly once") {
    ResultCache.clock = () => 1_000_000L
    val builds = new java.util.concurrent.atomic.AtomicInteger()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val futures = (1 to 8).map { _ =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          override def call(): Long =
            ResultCache.getOrCompute("filters-conc", 300) {
              builds.incrementAndGet()
              Seq(1, 2, 3).toDF("x")
            }.count()
        })
      }
      assert(futures.map(_.get()).forall(_ == 3L))
      assert(builds.get() == 1, s"build ran ${builds.get()} times under contention")
    } finally pool.shutdown()
  }

  test("S6: the dedup/IVF pipelines leave ZERO graft-owned pinned frames after expiry") {
    var now = 1_000_000L
    ResultCache.clock = () => now
    // build every ResultCache-routed shared intermediate
    val pairs = operators.Similarity.neardupPairs(spark, sf0001)
    val clusters = operators.Similarity.neardupClusters(spark, sf0001)
    val assign = operators.Similarity.ivfAssign(spark, sf0001)
    val frames = Seq("pairs" -> pairs, "clusters" -> clusters, "assign" -> assign)
    frames.foreach { case (n, df) =>
      assert(pinned(df), s"$n should be pinned while fresh") }
    // expire everything PAST the release grace, then trigger the sweep
    // with an unrelated lookup (the pair table's board-span TTL is
    // 600 s — the longest graft-owned TTL — + grace 120 s < 721 s)
    now += 721 * 1000
    ResultCache.getOrCompute("unrelated", 300)(Seq(1).toDF("x"))
    frames.foreach { case (n, df) =>
      assert(!pinned(df),
        s"$n still pinned after TTL expiry + sweep — cache leak") }
  }

  /** A frame handed out while fresh keeps serving from BLOCKS for the
    * grace window after its TTL lapses — release is deferred, not
    * skipped (round-3 advice); past grace, actions recompute (below). */
  test("S6: a replaced entry's blocks survive the swap for the grace window") {
    var now = 1_000_000L
    ResultCache.clock = () => now
    val stale = ResultCache.getOrCompute("filters-grace", 1)(Seq(1).toDF("x"))
    // expired; the rebuild retires (not releases) the stale frame
    now += 2 * 1000
    ResultCache.getOrCompute("filters-grace", 300)(Seq(2).toDF("x"))
    assert(pinned(stale),
      "stale frame released at swap — an in-flight reader should have " +
      "finished from blocks, not paid a recompute")
    assert(stale.collect().map(_.getInt(0)).sameElements(Array(1)),
      "stale frame no longer readable during its grace window")
    // past expiry + grace: the sweep (triggered by any lookup) frees it
    now += ResultCache.graceMs + 1000
    ResultCache.getOrCompute("filters-grace2", 300)(Seq(3).toDF("x"))
    assert(!pinned(stale), "retired frame never released after grace")
  }

  /** r4 brief #5 — REBUILD-ON-MISS: a consumer that holds a cached
    * frame longer than expiry + grace must get a RECOMPUTE on its next
    * action, not "block not found". The entry's row RDD keeps its full
    * physical lineage (the builder "closure" stored inside the frame),
    * so acting on a fully-released frame re-runs the build. */
  test("S6: acting on a frame past expiry + grace recomputes instead of failing") {
    var now = 1_000_000L
    ResultCache.clock = () => now
    var builds = 0
    val held = ResultCache.getOrCompute("filters-rebuild", 1) {
      builds += 1; Seq(7, 8, 9).toDF("x")
    }
    assert(held.collect().map(_.getInt(0)).sorted.sameElements(Array(7, 8, 9)))
    // expire PAST the grace window, then force the sweep + drain via an
    // unrelated lookup: the held frame's blocks are now fully released
    now += (1 + 301) * 1000 + ResultCache.graceMs
    ResultCache.getOrCompute("filters-rebuild-other", 300)(Seq(1).toDF("x"))
    assert(!pinned(held), "blocks should be fully released past grace")
    // the SAME previously-obtained frame still answers — by recompute
    assert(held.collect().map(_.getInt(0)).sorted.sameElements(Array(7, 8, 9)),
      "previously-obtained frame failed after release — no rebuild path")
  }

  /** retire() itself drains (r4 advice): a retirement must free
    * past-grace retirees even while the 30 s sweep throttle blocks the
    * lookup-path drain. */
  test("S6: retire() drains without waiting for a sweep") {
    var now = 1_000_000L
    ResultCache.clock = () => now
    // restore in a local finally (r5 advice) — the fixture's clear()
    // also resets graceMs, but the discipline belongs with the mutation
    // so a future fixture change cannot silently leak shrunken grace
    // into suites sharing the JVM
    ResultCache.graceMs = 1000
    try {
      // this lookup also runs the throttled sweep (arming its 30 s timer)
      val first = ResultCache.getOrCompute("filters-drain", 1)(Seq(1).toDF("x"))
      assert(pinned(first))
      // 3 s later: the entry is expired AND past its 1 s grace, but the
      // sweep is still throttled (3 s < 30 s) — only the drain inside
      // retire() can free it on this same-key rebuild
      now += 3 * 1000
      ResultCache.getOrCompute("filters-drain", 300)(Seq(2).toDF("x"))
      assert(!pinned(first),
        "retire() did not drain a past-grace retiree while the sweep " +
        "was throttled")
    } finally ResultCache.graceMs = ResultCache.DefaultGraceMs
  }

  test("S6: evictAll releases every entry immediately") {
    ResultCache.clock = () => 1_000_000L
    val a = ResultCache.getOrCompute("filters-g", 300)(Seq(1).toDF("x"))
    assert(pinned(a))
    ResultCache.evictAll()
    assert(!pinned(a))
    // and the next lookup is a rebuild, not a stale hit
    var built = false
    ResultCache.getOrCompute("filters-g", 300) { built = true; Seq(2).toDF("x") }
    assert(built)
  }

  test("S6: the graded cached query equals its uncached twin") {
    val cached = SparkEntry.queries("segment_stats_cached")(spark, sf0001).collect()
    val plain = SparkEntry.queries("segment_stats")(spark, sf0001).collect()
    assert(cached.sameElements(plain))
  }
}

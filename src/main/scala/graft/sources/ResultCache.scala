package graft.sources

import java.security.MessageDigest
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.sql.DataFrame

/** S6 — keyed, TTL-bounded result reuse (reference `SCALING.md:87-99`:
  * Redis cache keyed by `md5(filters)` with a 300 s TTL, fronting the
  * audience query).
  *
  * The Spark-native analog: key = md5 of the query's deterministic
  * descriptor (the same string that feeds the F10 content-hash segment
  * id), value = the RESULT DataFrame, plan-truncated and eagerly
  * persisted (MEMORY_AND_DISK blocks; see getOrCompute for the
  * rebuild-on-miss contract). A hit returns the cached frame — Spark
  * serves rows from blocks instead of recomputing; an expired or
  * missing key builds, persists, and replaces (the stale entry is
  * released without blocking).
  *
  * Scale notes: results cached here are post-aggregation (segment
  * stats, previews — KB-sized), never raw scans, so the memory
  * footprint is bounded by entry count, not data size. The cache is
  * per-JVM like any block-manager state; a multi-tenant deployment
  * would put the same key→result mapping in an external store and
  * `CACHE TABLE`-backed views serve the same role.
  *
  * Time is injectable so TTL expiry is unit-testable.
  */
object ResultCache {
  private final case class Entry(df: DataFrame, expiresAtMs: Long)
  private val entries = new ConcurrentHashMap[String, Entry]()
  private val missCounter = new AtomicLong()

  /** Test hook: the clock used for TTL decisions. */
  @volatile private[graft] var clock: () => Long = () => System.currentTimeMillis()

  /** md5 hex of the descriptor — the reference's cache key shape. */
  def key(descriptor: String): String =
    MessageDigest.getInstance("MD5")
      .digest(descriptor.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Number of cache misses (builds) so far — observability + tests. */
  def misses: Long = missCounter.get()

  // Session identity for cache keys. identityHashCode is NOT unique, so
  // it cannot back the "a hit never crosses sessions" invariant; this
  // map hands each session a process-unique id and, being weak-keyed,
  // lets stopped sessions be collected.
  private val sessionIds =
    new java.util.WeakHashMap[org.apache.spark.sql.SparkSession, java.lang.Long]()
  private val nextSessionId = new AtomicLong()

  /** Process-unique, collision-free id for a session (for cache keys). */
  def sessionId(s: org.apache.spark.sql.SparkSession): Long =
    sessionIds.synchronized {
      val cur = sessionIds.get(s)
      if (cur != null) cur
      else { val id = nextSessionId.incrementAndGet(); sessionIds.put(s, id); id }
    }

  /** Return the cached result for `descriptor` if fresh, else run
    * `build`, materialize the result, and cache it for `ttlSeconds`.
    * The descriptor must capture EVERYTHING the result depends on
    * (filter spec, table directory, as-of date) — exactly like the
    * reference's serialized-filters key.
    *
    * Entries are handed out PLAN-TRUNCATED but REBUILDABLE. The result
    * rows are lifted out of the builder's logical plan into an
    * `RDD[Row]` leaf: a consumer that joins/aggregates a cached result
    * re-analyzes only a one-node `LogicalRDD` on the driver — not the
    * builder's whole tree, measured at ~2.8 s per action for the LSH
    * pair table's plan vs 0.24 s of actual execution. Unlike the
    * r4-era eager `localCheckpoint` (whose TRUNCATED lineage made any
    * block release unrecoverable — "checkpoint block not found" with
    * no recompute path), the row RDD keeps its full PHYSICAL lineage:
    * the Dataset-level persist below is just the serving copy, and if
    * its blocks are ever dropped — TTL sweep past the grace window, an
    * explicit evictAll, executor loss, memory pressure — the next
    * action on an already-handed-out frame RECOMPUTES through the
    * lineage instead of failing (r4 brief #5: the "builder closure" IS
    * the lineage here, stored inside the frame itself). Blocks live at
    * MEMORY_AND_DISK (spill, not discard), and the builder's own
    * persisted intermediate (if any) is released once the serving copy
    * holds the rows. */
  def getOrCompute(descriptor: String, ttlSeconds: Long)
      (build: => DataFrame): DataFrame = {
    val k = key(descriptor)
    val now = clock()
    sweep(now)
    val cur = entries.get(k)
    if (cur != null && cur.expiresAtMs > now) cur.df
    // PER-KEY lock: a slow build (the cluster pipeline takes seconds)
    // must not serialize lookups of unrelated keys behind it.
    else keyLocks.computeIfAbsent(k, _ => new Object).synchronized {
      // re-check under the lock: another thread may have rebuilt
      val cur2 = entries.get(k)
      if (cur2 != null && cur2.expiresAtMs > clock()) cur2.df
      else {
        missCounter.incrementAndGet()
        val built = build
        val df = built.sparkSession.createDataFrame(built.rdd, built.schema)
        df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // eager materialization: the build bills the MISS, never the
        // first reader (and reads the builder's still-persisted
        // intermediates while they exist)
        df.count()
        // the serving copy owns the rows now — drop the builder's own
        // persist (no-op when the builder never persisted)
        try built.unpersist(blocking = false)
        catch { case _: Throwable => () }
        // Install the replacement BEFORE retiring the stale entry, and
        // retire (grace-delayed release) rather than release: readers
        // that obtained the stale frame while fresh keep their blocks
        // for `graceMs` past expiry — with the lineage in place this
        // is now purely a PERFORMANCE courtesy (avoids recompute churn
        // for in-flight actions), no longer a correctness window.
        entries.put(k, Entry(df, clock() + ttlSeconds * 1000))
        installEndOfAppCleanup(df.sparkSession)
        if (cur2 != null) retire(cur2)
        df
      }
    }
  }

  /** How long a retired (replaced or expired) entry's blocks stay
    * alive past its expiry before the sweep actually unpersists them.
    * A frame obtained while fresh serves from blocks for at least
    * `graceMs` after its TTL lapses; past that, an action on it
    * RECOMPUTES through the row RDD's lineage (see getOrCompute) — the
    * grace window bounds recompute churn, not readability. Var so the
    * grace-semantics spec can shrink it. */
  private[graft] val DefaultGraceMs: Long = 120_000L
  @volatile private[graft] var graceMs: Long = DefaultGraceMs

  private final case class Doomed(df: DataFrame, releaseAtMs: Long)
  private val graveyard =
    new java.util.concurrent.ConcurrentLinkedQueue[Doomed]()

  /** Queue an entry's frame for release `graceMs` after its EXPIRY
    * (not after retirement: an entry replaced long past its TTL has no
    * recent readers to protect, and the sweep that retires it may then
    * free it in the same pass). */
  private def retire(e: Entry): Unit = {
    graveyard.add(Doomed(e.df, e.expiresAtMs + graceMs))
    // Opportunistic drain (r4 advice): a retirement with NO subsequent
    // cache lookup must not leave earlier retirees' blocks — and the
    // SparkSession each frame strongly pins — alive until application
    // end. Safe concurrently: the queue iterator is weakly consistent
    // and release() is idempotent.
    drainGraveyard(clock())
    ()
  }

  /** Unpersist every graveyard frame whose grace window has passed. */
  private def drainGraveyard(now: Long): Unit = {
    val it = graveyard.iterator()
    while (it.hasNext) {
      val d = it.next()
      if (d.releaseAtMs <= now) { release(d.df); it.remove() }
    }
  }

  /** Release an entry's storage: cache-manager blocks (persist-era
    * entries / defensive) AND the checkpoint RDD's blocks. */
  private def release(df: DataFrame): Unit = {
    try { df.unpersist(blocking = false); () }
    catch { case _: Throwable => () }
    try df.queryExecution.logical match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false); ()
      case _ => ()
    } catch { case _: Throwable => () }
  }

  // Entries are also released at application end (SparkContext stop):
  // without this, cached DataFrames — each strongly pinning its
  // SparkSession — would be retained for the JVM lifetime in a process
  // that starts and stops Spark contexts (round-2 advice). One listener
  // per context, installed on first build against it.
  private val cleanupInstalled =
    java.util.Collections.newSetFromMap(
      new ConcurrentHashMap[org.apache.spark.SparkContext, java.lang.Boolean]())
  private def installEndOfAppCleanup(s: org.apache.spark.sql.SparkSession): Unit = {
    val sc = s.sparkContext
    if (cleanupInstalled.add(sc))
      sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onApplicationEnd(
            end: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit = {
          evictAll()
          // release OUR strong reference to the stopped context too — a
          // JVM cycling contexts must not accumulate dead SparkContexts
          // in this guard set (the very leak this listener exists to fix)
          cleanupInstalled.remove(sc)
          ()
        }
      })
  }

  /** Release every entry NOW (blocks unpersisted, map emptied) —
    * invoked automatically at application end, callable explicitly by
    * an embedding application at its own shutdown points. keyLocks are
    * deliberately retained (a thread may be parked on one; they are
    * bytes per distinct descriptor). */
  def evictAll(): Unit = {
    val it = entries.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      release(e.getValue.df)
      it.remove()
    }
    // immediate, no grace: evictAll is an application-end / explicit
    // shutdown point — there are no consumers left to protect
    drainGraveyard(Long.MaxValue)
  }

  private val keyLocks = new ConcurrentHashMap[String, Object]()

  // TTL gates RETENTION, not just reuse: expired persisted DataFrames —
  // each pinning its session's block-manager state — must not
  // accumulate for the JVM lifetime. Runs on every lookup (hits too:
  // a hit-dominated workload must still release other keys' expired
  // entries), throttled to once per 30 s of clock time.
  // MinValue = "never swept" sentinel, checked EXPLICITLY: computing
  // `now - Long.MinValue` overflows negative and would disable the
  // throttle guard forever.
  @volatile private var lastSweepMs = Long.MinValue
  private def due(now: Long): Boolean =
    lastSweepMs == Long.MinValue || now - lastSweepMs >= 30_000
  private def sweep(now: Long): Unit =
    if (due(now)) this.synchronized {
      if (due(now)) {
        lastSweepMs = now
        val it = entries.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue.expiresAtMs <= now) {
            // retire, don't release: a consumer that obtained this
            // frame while fresh may still have an action in flight —
            // let it finish from blocks rather than force a recompute.
            // Blocks are freed by drainGraveyard once `graceMs` past
            // expiry; later actions rebuild through the lineage.
            retire(e.getValue)
            it.remove()
            // key-lock objects are deliberately NOT removed: a thread
            // may be parked on one, and swapping it out would let two
            // builds of the same key race. They are bytes per distinct
            // descriptor — bounded and negligible.
          }
        }
        drainGraveyard(now)
      }
    }

  /** Drop everything and reset counters (test isolation). */
  private[graft] def clear(): Unit = {
    evictAll()
    missCounter.set(0)
    lastSweepMs = Long.MinValue
    graceMs = DefaultGraceMs
  }
}

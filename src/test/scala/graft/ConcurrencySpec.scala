package graft

import scala.concurrent.{Await, Future}
import scala.concurrent.ExecutionContext.Implicits.global
import scala.concurrent.duration._

/** Concurrent query execution on one shared session — the registry and
  * the custom-function registration must be thread-safe (a real driver
  * serves many sessions/queries at once). */
class ConcurrencySpec extends SparkSpec {

  test("8 graded queries execute concurrently on one session") {
    val names = Seq("segment_stats", "cosine_topk", "pricing_summary",
      "revenue_by_nation", "topk_orders", "cosine_topk_ivf",
      "token_stats", "json_props")
    val futures = names.map { n =>
      Future(n -> SparkEntry.queries(n)(spark, sf0001).count())
    }
    val counts = Await.result(Future.sequence(futures), 5.minutes).toMap
    assert(counts.values.forall(_ > 0))
    // re-run serially: same counts (no cross-query interference)
    names.foreach { n =>
      assert(SparkEntry.queries(n)(spark, sf0001).count() == counts(n))
    }
  }
}

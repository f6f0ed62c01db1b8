package graft

import org.apache.spark.sql.functions._
import graft.operators._

/** Semantics checks for the relational operator batch on sf0.001 (tiny,
  * fast). Cross-engine value equality is covered by the DuckDB oracle
  * gate; these assert the *shape* and internal invariants.
  */
class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  test("W3+: session transitions — counts partition the lagged stream, probs sum to 1") {
    val rows = EventOps.sessionTransitions(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val totalTransitions = rows.map(_.getAs[Long]("n")).sum
    val events = Tables(spark, sf0001, "events").count()
    val users = Tables(spark, sf0001, "events")
      .select("user_id").distinct().count()
    // every event except each user's first contributes exactly one bigram
    assert(totalTransitions == events - users,
      s"$totalTransitions vs events=$events users=$users")
    rows.groupBy(_.getString(0)).foreach { case (prev, group) =>
      val p = group.map(_.getAs[Double]("p")).sum
      assert(math.abs(p - 1.0) < 0.01, s"$prev probabilities sum to $p")
    }
  }

  test("J7: fuzzy name match finds the intended typo targets, dist <= 2") {
    val rows = Joins.fuzzyNameMatch(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Int]("dist") <= 2))
    // the dropped-'o' probe must recover customer 123 at distance 1
    val c123 = rows.filter(_.getString(0) == "Custmer#000000123")
      .filter(_.getAs[Long]("c_custkey") == 123L)
    assert(c123.length == 1 && c123.head.getAs[Int]("dist") == 1)
  }

  test("J3/J4: semi + anti partition the customer set") {
    val urgent = Joins.urgentBySegment(spark, sf0001)
      .agg(sum("n_customers")).first().getLong(0)
    val total = Tables(spark, sf0001, "customer").count()
    assert(urgent > 0 && urgent <= total)
  }

  test("J5: latest_order_per_customer is unique per customer") {
    val df = Joins.latestOrderPerCustomer(spark, sf0001)
    assert(df.count() == df.select("o_custkey").distinct().count())
  }

  test("J6: price bands cover every order exactly once") {
    val banded = Joins.priceBands(spark, sf0001)
      .agg(sum("n_orders")).first().getLong(0)
    assert(banded == Tables(spark, sf0001, "orders").count())
  }

  test("A4: pricing summary groups are the returnflag×linestatus cross") {
    val df = Aggregates.pricingSummary(spark, sf0001)
    assert(df.count() > 0 && df.columns.length == 10)
    // avg bounds: min <= avg <= max (survey §5.3 property)
    val r = df.agg(min("avg_disc"), max("avg_disc")).first()
    assert(r.getDouble(0) >= 0.0 && r.getDouble(1) <= 0.11)
  }

  test("A7: rollup emits grand total = table count") {
    val df = Aggregates.rollupSegmentNation(spark, sf0001)
    val grand = df.filter($"mktsegment" === "ALL" && $"nation" === "ALL")
      .select("n_customers").first().getLong(0)
    assert(grand == Tables(spark, sf0001, "customer").count())
  }

  test("L3: topk is a k-prefix of the total order") {
    val t = Aggregates.topkOrders(spark, sf0001).select("o_totalprice")
      .as[Double].collect()
    assert(t.length == 10 && t.sameElements(t.sorted.reverse))
  }

  test("set ops: intersect ∪ except = left set") {
    val i = Aggregates.segmentIntersect(spark, sf0001).count()
    val e = Aggregates.segmentExcept(spark, sf0001).count()
    val urgent = Tables(spark, sf0001, "orders")
      .filter($"o_orderpriority" === "1-URGENT")
      .select("o_custkey").distinct().count()
    assert(i + e == urgent)
  }

  test("W2: sliding rate limit counts are >= threshold and window-consistent") {
    val df = Windows.slidingRateLimit(spark, sf0001, limit = 1)
    // limit=1 keeps every event; n_last_hour >= 1 everywhere
    assert(df.count() == Tables(spark, sf0001, "events").count())
    assert(df.agg(min("n_last_hour")).first().getLong(0) >= 1L)
  }

  test("W3: lag/lead are inverse shifts") {
    val df = Windows.rankLagOrders(spark, sf0001)
    val bad = df.filter($"spend_rank" < 1).count()
    assert(bad == 0)
  }

  test("ST7 batch: hourly stats sum to total events") {
    val df = EventOps.hourlyEventStats(spark, sf0001)
    val n = df.agg(sum("n_events")).first().getLong(0)
    assert(n == Tables(spark, sf0001, "events").count())
  }

  test("U1: campaign copy is deterministic and complete") {
    val a = CampaignOps.campaignDrafts(spark, sf0001).collect()
    val b = CampaignOps.campaignDrafts(spark, sf0001).collect()
    assert(a.sameElements(b))
    assert(a.forall(r => r.getAs[String]("email_subject").startsWith("You're invited: ")))
  }

  test("S5: idempotent schedule — doubled input, single output per key") {
    val df = CampaignOps.idempotentSchedule(spark, sf0001)
    assert(df.count() == df.select("campaign_id").distinct().count())
  }

  test("F8/F9: copy_parse routes each LLM-output variant correctly") {
    val rows = CampaignOps.copyParse(spark, sf0001).collect()
      .map(r => r.getAs[Long]("variant") -> r).toMap
    // variants 0 (pure JSON) and 1 (prose-wrapped) parse: subject comes
    // from the JSON, not the fallback template
    Seq(0L, 1L).foreach { v =>
      assert(rows(v).getAs[Boolean]("parse_ok"))
      assert(rows(v).getAs[String]("email_subject").startsWith("Invite: "))
    }
    // variants 2 (malformed JSON) and 3 (no braces) fall back — and the
    // fallback email body is the RAW llm text (tools.py:146-150)
    Seq(2L, 3L).foreach { v =>
      assert(!rows(v).getAs[Boolean]("parse_ok"))
      assert(rows(v).getAs[String]("email_subject").startsWith("You're invited: "))
    }
    assert(rows(2L).getAs[String]("email_body") == "{oops: this is not valid json}")
    assert(rows(3L).getAs[String]("email_body")
      == "I am unable to generate campaign copy right now.")
    // variant 4: valid-but-partial JSON is returned AS-IS (all-or-nothing
    // like the reference) — parsed subject, null sms, no partial fallback
    assert(rows(4L).getAs[Boolean]("parse_ok"))
    assert(rows(4L).getAs[String]("email_subject").startsWith("Invite: "))
    assert(rows(4L).isNullAt(rows(4L).fieldIndex("sms_body")))
  }

  test("U1: toned copy — 3 tones per segment, distinct, within budgets") {
    val df = CampaignOps.campaignDraftsToned(spark, sf0001)
    val nSeg = Tables(spark, sf0001, "customer")
      .select("c_mktsegment").distinct().count()
    assert(df.count() == nSeg * CampaignOps.tones.length)
    // the three tones produce three different subjects per segment
    assert(df.select("c_mktsegment", "email_subject").distinct().count()
      == nSeg * CampaignOps.tones.length)
    // prompt budget rules (tools.py guidelines): all within budget here
    assert(df.filter(!$"subject_in_budget" || !$"sms_in_budget").count() == 0)
  }

  test("S1+: catalog-resolved revenue query equals the path form, registration idempotent") {
    val viaCatalog = Joins.revenueByNationCatalog(spark, sf0001).collect()
    val viaPaths = Joins.revenueByNation(spark, sf0001).collect()
    assert(viaCatalog.sameElements(viaPaths),
      "spark.table resolution changed the graded result")
    // second call must reuse the registered tables, not re-register
    val again = Joins.revenueByNationCatalog(spark, sf0001).collect()
    assert(again.sameElements(viaPaths))
  }

  test("T1 EWMA: the fixed-point series satisfies the truncated " +
      "recursion and tracks the raw series' mass") {
    val rows = graft.operators.EventOps.hourlyEwma(spark, sf0001)
      .collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, series) =>
      val xs = series.map(_._2)
      val es = series.map(_._3)
      // recursion: e_t = 32768·x_t + (e_{t-1} − x_{t-16}) div 2,
      // with zero padding before the series start
      es.indices.foreach { t =>
        val prev = if (t == 0) 0L else es(t - 1)
        val dropped = if (t >= 16) xs(t - 16) else 0L
        assert(es(t) == 32768L * xs(t) + (prev - dropped) / 2,
          s"recursion broken at t=$t")
      }
      // bounds: the smoother never exceeds the window max
      val cap = xs.max * 65536L
      assert(es.forall(e => e >= 0 && e <= cap))
    }
  }

  test("debounce: island heads match a sequential driver-side fold; " +
      "chained bursts keep only their head") {
    val got = graft.operators.EventOps.eventsDebounced(spark, sf0001)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // sequential ground truth per user
    val ev = Tables(spark, sf0001, "events")
      .select(col("user_id"), col("event_id"),
        expr("unix_micros(ts)").as("us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val mod = BigInt(2).pow(61) - 1
    val truth = ev.groupBy(_._1).map { case (k, rows) =>
      val sorted = rows.sortBy(t => (t._3, t._2))
      var lastUs = Long.MinValue
      var kept = 0L
      var sum = BigInt(0)
      var chained = false
      sorted.foreach { t =>
        if (lastUs == Long.MinValue || t._3 - lastUs > 300000000L) {
          kept += 1; sum += t._2
        } else chained = true
        lastUs = t._3 // distance to the previous RAW event
      }
      k -> ((kept, sorted.size.toLong, (sum.mod(mod)).toLong))
    }
    assert(got == truth && got.nonEmpty)
    // the operator actually debounced something
    assert(got.values.exists { case (k, r, _) => k < r },
      "no burst collapsed — the gate is vacuous on this corpus")
  }

  test("J4 naaj: null-polluted NOT IN is pinned empty; NOT EXISTS is not") {
    val r = Joins.notInNullSemantics(spark, sf0001).collect().head
    val (n, ne, ni) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(ni == 0L, "three-valued NOT IN must yield zero rows")
    assert(ne > 0 && ne < n, "NOT EXISTS should keep a real subset")
  }

  test("P8: impossible filter still yields the one zero-struct row") {
    val r = Segmentation.emptyStatsQuery(spark, sf0001).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("fan_count") == 0L)
    assert(r(0).getAs[Double]("avg_spent") == 0.0)
    assert(r(0).getAs[Double]("avg_acctbal") == 0.0)
    assert(r(0).getAs[String]("segment_id").startsWith("seg_"))
  }

  test("growth accounting: both conservation laws hold on every row, and " +
      "every class is live somewhere") {
    val rows = graft.operators.EventOps
      .dailyGrowthAccounting(spark, sf0001).collect()
    assert(rows.length > 2)
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2) + r.getLong(3) + r.getLong(4),
        s"${r.get(0)}: active != new + retained + resurrected")
    }
    rows.sliding(2).foreach { pair =>
      if (pair.length == 2 && !pair(1).isNullAt(5)) {
        assert(pair(1).getLong(5) == pair(0).getLong(1) - pair(1).getLong(3),
          s"${pair(1).get(0)}: churned != lag(active) - retained")
      }
    }
    assert(rows.head.isNullAt(5), "first day's churn must be NULL")
    assert(rows.exists(r => r.getLong(4) > 0), "no resurrection observed")
    assert(rows.exists(r => !r.isNullAt(5) && r.getLong(5) > 0),
      "no churn observed")
  }
}

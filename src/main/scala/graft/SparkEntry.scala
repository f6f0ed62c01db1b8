package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries`: one entry per implemented operator from SURVEY.md §2.
  * `oracleSql`: equivalent DuckDB SQL per query (omitted only for
  * non-SQL-expressible ops → weaker rows-only check).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Segment stats for the canonical demo filter (SURVEY.md §7.2) —
    * always returns exactly one row (P8 zero-struct on empty match). */
  def entry(spark: SparkSession): DataFrame =
    Segmentation.statsQuery(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "segment_stats"   -> (Segmentation.statsQuery _),
    "segment_preview" -> (Segmentation.previewQuery _),
    "genre_overlap"   -> (Segmentation.genreOverlapQuery _),
    "segment_active_stats" -> (Segmentation.activeStatsQuery _),
    "segment_stats_empty"  -> (Segmentation.emptyStatsQuery _),
    // S6: same stats routed through the TTL result cache — the key
    // captures session, directory and the full filter descriptor, so a
    // hit can never serve another scale factor's (or session's) result
    "segment_stats_cached" -> ((s: SparkSession, dir: String) =>
      graft.sources.ResultCache.getOrCompute(
        s"${graft.sources.ResultCache.sessionId(s)}|segment_stats|$dir|${Segmentation.canonical.descriptor}",
        ttlSeconds = 300)(Segmentation.statsQuery(s, dir))),
    // observability-as-data: executed-plan numOutputRows per node
    // graded vs semantic SQL counts (the reference's fan_count logs)
    "segment_metrics_observed" -> (Segmentation.segmentMetricsObserved _),
    // S1 partition pruning on the graded path (see Tables.scala)
    "orders_pruned_priority" -> (Tables.ordersPrunedPriority _),
    // bucketed co-located join on the graded path (see Tables.scala)
    "revenue_bucketed" -> (Tables.revenueBucketed _),
    // bucket pruning: point lookup opening 1 of 8 buckets (plan-asserted)
    "order_lookup_bucketed" -> (Tables.orderLookupBucketed _),
    // dynamic partition pruning: dim-filtered star join (plan-asserted)
    "orders_dpp_join" -> (Tables.ordersDppJoin _),
  ) ++ Joins.queries ++ Aggregates.queries ++ Windows.queries ++
    EventOps.queries ++ CampaignOps.queries ++ TextOps.queries ++
    Similarity.queries ++ SetJoin.queries ++ EditJoin.queries ++ DupSpans.queries ++ Curation.queries ++ TextSignals.queries ++
    IncrementalDedup.queries ++ RpSketch.queries ++ Scd.queries ++
    Compaction.queries ++ ZOrder.queries ++ BloomIndex.queries ++ Vacuum.queries ++ Attribution.queries ++ Wap.queries ++ IvfMaintained.queries ++ SemDedupMaintained.queries ++
    RangeJoin.queries ++ Integrity.queries ++ Formats.queries ++
    MergeOnRead.queries ++ Ivm.queries ++ JoinIvm.queries ++ MergeInto.queries ++ MvServe.queries ++ Packing.queries ++
    Pii.queries ++ Baskets.queries ++ GraphOps.queries ++ Cohorts.queries ++
    Skyline.queries ++ Concentration.queries ++ Erasure.queries ++
    Stats.queries ++ RankTest.queries ++ Membership.queries ++
    BitmapOps.queries ++ Sweepline.queries ++ Cep.queries ++
    Cusum.queries ++ Subqueries.queries ++ TpchShapes.queries ++ Cbo.queries ++ Sq8.queries ++ Governance.queries ++ KmvOps.queries ++ Dsir.queries ++ Chunking.queries ++ Paging.queries ++ Sharding.queries ++ Hybrid.queries ++ MarkovAttribution.queries ++ Coreset.queries ++ LangId.queries ++ ChunkRetrieval.queries ++ CurationPipeline.queries ++
    Bootstrap.queries ++ Rfm.queries ++
    graft.functions.TypedAggs.queries ++
    Multimodal.queries ++ Skew.queries ++ graft.streaming.StreamReplay.queries

  /** `approx_users` intentionally has NO oracle (HLL sketches are not
    * cross-engine comparable) → driver rows-only check. */
  def oracleSql: Map[String, String] = Map(
    "segment_stats"   -> Segmentation.statsOracle,
    "segment_preview" -> Segmentation.previewOracle,
    "genre_overlap"   -> Segmentation.genreOverlapOracle,
    "segment_active_stats" -> Segmentation.activeStatsOracle,
    "segment_stats_empty"  -> Segmentation.emptyStatsOracle,
    "segment_stats_cached" -> Segmentation.statsOracle,
    "segment_metrics_observed" -> Segmentation.segmentMetricsOracle,
    "orders_pruned_priority" -> Tables.ordersPrunedOracle,
    "revenue_bucketed" -> Tables.revenueBucketedOracle,
    "order_lookup_bucketed" -> Tables.orderLookupBucketedOracle,
    "orders_dpp_join" -> Tables.ordersDppOracle,
  ) ++ Joins.oracles ++ Aggregates.oracles ++ Windows.oracles ++
    EventOps.oracles ++ CampaignOps.oracles ++ TextOps.oracles ++
    Similarity.oracles ++ SetJoin.oracles ++ EditJoin.oracles ++ DupSpans.oracles ++ Curation.oracles ++ TextSignals.oracles ++
    IncrementalDedup.oracles ++ RpSketch.oracles ++ Scd.oracles ++
    Compaction.oracles ++ ZOrder.oracles ++ BloomIndex.oracles ++ Vacuum.oracles ++ Attribution.oracles ++ Wap.oracles ++ IvfMaintained.oracles ++ SemDedupMaintained.oracles ++
    RangeJoin.oracles ++ Integrity.oracles ++ Formats.oracles ++
    MergeOnRead.oracles ++ Ivm.oracles ++ JoinIvm.oracles ++ MergeInto.oracles ++ MvServe.oracles ++ Packing.oracles ++
    Pii.oracles ++ Baskets.oracles ++ GraphOps.oracles ++ Cohorts.oracles ++
    Skyline.oracles ++ Concentration.oracles ++ Erasure.oracles ++
    Stats.oracles ++ RankTest.oracles ++ Membership.oracles ++
    BitmapOps.oracles ++ Sweepline.oracles ++ Cep.oracles ++
    Cusum.oracles ++ Subqueries.oracles ++ TpchShapes.oracles ++ Cbo.oracles ++ Sq8.oracles ++ Governance.oracles ++ KmvOps.oracles ++ Dsir.oracles ++ Chunking.oracles ++ Paging.oracles ++ Sharding.oracles ++ Hybrid.oracles ++ MarkovAttribution.oracles ++ Coreset.oracles ++ LangId.oracles ++ ChunkRetrieval.oracles ++ CurationPipeline.oracles ++
    Bootstrap.oracles ++ Rfm.oracles ++
    graft.functions.TypedAggs.oracles ++
    Multimodal.oracles ++ Skew.oracles ++ graft.streaming.StreamReplay.oracles
}

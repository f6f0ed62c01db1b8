package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Regenerate PLANS.md: final (AQE-resolved) physical plans for the
  * headline queries — the "is this the plan you'd want" artifact.
  * Run: `sbt "runMain graft.PlanDump"` */
object PlanDump {
  val headline = Seq("segment_stats", "pricing_summary", "revenue_by_nation",
    "neardup_pairs", "neardup_pairs_char", "cosine_topk", "cosine_topk_ivf",
    "cosine_topk_ivf2", "cosine_topk_batch", "cosine_topk_kmeans",
    "asof_order_before_event", "asof_daily_order_gap",
    "sliding_rate_limit", "copy_parse", "approx_median_acctbal", "hll_users",
    "neardup_clusters", "embedding_clusters", "quality_funnel",
    "hash_sample", "decontam_stats", "token_budget_mix",
    "bm25_search", "bloom_prefilter", "corr_stats", "chi2_stat",
    "priority_sample", "rep_signals", "neardup_triangles",
    "fuzzy_name_match", "session_transitions",
    "kmeans_rounds", "kmeans_converged_assign", "revenue_by_nation_catalog",
    "pq_topk", "ivfpq_topk", "split_audit",
    "pq_codebook_learned", "pq_topk_learned", "kmeans_converged_rounds",
    "orders_pruned_priority", "hourly_event_stats_streamed",
    "revenue_bucketed", "order_lookup_bucketed", "simhash_neighbors_r2",
    "hourly_event_stats_updatemode", "pq_recall", "neardup_clusters_loop",
    "incremental_dedup", "incremental_dedup_indexed", "rp_topk",
    "rp_topk_banded", "scd2_dim", "orders_compacted_agg",
    "orders_zorder_box", "order_lookup_bloom", "range_join_binned",
    "event_funnel", "stratified_sample_k", "orders_integrity_diff",
    "hourly_counts_gapfilled", "incremental_dedup_maintained",
    "orders_merge_on_read", "orders_mor_compacted", "session_stats_fmgws",
    "zorder_prune_ratio", "orders_evolved_agg", "value_drift_tv",
    "source_mix_apportion", "orders_column_stats", "join_card_estimate",
    "orders_agg_ivm", "doc_pack_chunks", "pii_redaction",
    "value_trend_ols", "neardup_pagerank", "orders_dpp_join",
    "basket_pairs", "orders_repair_audit", "revenue_shuffle_hash",
    "incremental_dedup_compacted", "phrase_search",
    "daily_users_rolling_hll", "knn_bfs_hops", "cohort_retention",
    "k_anonymity_audit", "hourly_volume_anomaly", "part_skyline",
    "lineitem_bloom_join", "spend_deciles", "spend_gini",
    "orders_cdc_extract", "pit_revenue_by_segment", "ngram_lm_quality",
    "contrastive_pairs", "phrase_search_indexed", "orders_federated_agg",
    "heavy_hitters_exact", "survival_risk_table", "hourly_anomaly_streamed",
    "events_position_delete", "events_erasure_compacted",
    "graph_ann_topk", "graph_ann_recall", "graph_ann_topk_d4",
    "phrase_search_maintained", "phrase_search_compacted",
    "orders_column_stats_sketched", "heavy_hitters_streamed",
    "revenue_aqe_skew", "order_lookup_zbloom", "orders_vacuumed_agg",
    "attribution_linear", "attribution_position", "orders_agg_ivm_delta",
    "lineitem_corr_matrix", "knn_bfs_hops_maintained",
    "orders_zorder_maintained_box", "orders_wap_audit_log",
    "segment_metrics_observed", "hash_sample_streamed",
    "orders_agg_mv_served", "similarity_join_exact", "lsh_recall_audit",
    "dup_spans_maximal", "containment_join",
    "phrase_search_erased", "phrase_search_erased_folded",
    "boolean_search_erased", "knn_bfs_hops_erased",
    "cosine_topk_ivf_erased", "incremental_dedup_erased",
    "graph_ann_topk_erased", "graph_ann_recall_erased",
    "orders_join_ivm", "orders_merge_into", "banded_brand_revenue",
    "large_volume_customers", "top_supplier_revenue", "revenue_cbo_reordered",
    "shipping_priority", "priority_order_check", "forecast_revenue",
    "market_share", "product_profit", "returned_items", "important_parts",
    "ship_buckets", "order_count_distribution", "promo_share",
    "supplier_census", "growth_suppliers",
    "orders_json_dlq_streamed",
    "orders_mor_checkpointed", "orders_mor_ckpt_asof", "segment_rank_sum",
    "media_phash_index", "orders_spec_evolved_agg", "fuzzy_join_qgram",
    "hourly_ewma", "events_debounced", "events_debounced_streamed",
    "top_orders_per_status", "revenue_joinelim", "customer_distinct_elim",
    "not_in_null_semantics", "bitmap_distinct_users",
    "daily_users_rolling_bitmap", "weekly_churn_bitmap",
    "open_orders_peak", "open_orders_twa", "cep_funnel_matches",
    "bitemporal_revenue", "local_supplier_revenue", "hourly_volume_cusum",
    "range_vs_rows_frames", "rolling_price_quantiles_hist",
    "boolean_search_indexed", "benford_digit_audit",
    "orders_count_metadata", "small_qty_revenue", "min_price_per_part",
    "waiting_suppliers", "sq8_topk", "sq8_recall",
    "price_percentile_semantics", "top_customers_listagg",
    "ivfsq8_topk", "ivfsq8_recall", "shard_manifest",
    "shard_manifest_erased", "knn_triangles", "semantic_dedup_pairs",
    "semantic_dedup_survivors", "orders_join_ivm_erased",
    "orders_join_ivm_streamed", "orders_merge_into_erased",
    "orders_merge_into_streamed", "revenue_cbo_broadcast",
    "fuzzy_join_passjoin", "knn_bfs_hops_lifecycle",
    "semantic_dedup_pairs_maintained", "semantic_dedup_survivors_lifecycle",
    "price_outliers_mad", "hourly_forecast_backtest", "knn_sssp", "shard_manifest_appended",
    "rls_tenant_revenue", "masked_customer_preview",
    "neardup_survivors", "orders_mor_vacuumed", "bootstrap_price_means",
    "bootstrap_price_ci", "neardup_coreness", "item_recs_cooccur",
    "pq_ndcg", "knn_label_confusion", "doc_keywords_tfidf",
    "left_join_filter_semantics", "doc_shuffle_order", "segment_ks_test",
    "embedding_centroid_drift", "bootstrap_group_ci",
    "customer_rfm_segments", "dormant_rich_customers", "volume_shipping",
    "kmv_users_by_type", "kmv_monthly_from_weekly", "kmv_type_overlap",
    "dsir_bucket_model", "dsir_selected_docs", "dsir_auc",
    "doc_chunks_index", "dup_chunks_cross_doc", "chunk_store_erased",
    "hard_negatives", "silhouette_by_cell", "view_purchase_full_streamed",
    "kmv_users_streamed", "dsir_decile_lift", "chunk_store_streamed",
    "orders_page_keyset", "kmv_users_erased_rebuild",
    "daily_users_rolling_kmv", "label_prototypes", "source_overlap_matrix",
    "price_winsorized_mean", "daily_growth_accounting", "hrw_shard_load",
    "hybrid_search_rrf", "hybrid_search_fused", "mmr_rerank_batch",
    "attribution_timedecay", "attribution_markov", "dq_referential_audit",
    "term_autocomplete", "temperature_mix", "quantile_normalize_sources",
    "fuzzy_join_symspell", "label_propagation", "coreset_kcenter",
    "knn_f1_by_class", "funnel_latency_quartiles", "mutual_knn_margin",
    "proximity_search", "ab_cuped_lift", "prefix_dup_groups",
    "ab_conversion_ztest",
    "langid_confusion", "langid_f1_by_class", "source_cap_sample",
    "chunk_retrieval_recall", "langid_model_maintained",
    "langid_model_erased", "langid_confusion_streamed",
    "source_cap_maintained", "token_diversity_by_source",
    "chunk_retrieval_recall_banded", "chunk_retrieval_ndcg",
    "langid_mix_by_source",
    "source_cap_topk", "dsir_selected_streamed",
    "curation_pipeline_account", "chunk_retrieval_recall_ivf",
    "graph_ann_topk_hnsw", "graph_ann_recall_hnsw",
    "curation_pipeline_erased",
    "graph_ann_topk_hnsw_maintained", "graph_ann_recall_hnsw_maintained")
  def main(args: Array[String]): Unit = {
    ToolLogging.init()
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val sb = new StringBuilder(
      "# PLANS — final physical plans of headline queries (sf0.01, AQE final)\n\n" +
      "Regenerate with `sbt \"runMain graft.PlanDump\"`. Things to check per\n" +
      "plan: `PushedFilters`/`ReadSchema` on scans, `BroadcastHashJoin` for\n" +
      "dims, partial+final `HashAggregate`, `TakeOrderedAndProject` for\n" +
      "top-k, `*(n)` whole-stage-codegen spans, no `CartesianProduct`.\n" +
      "The EXECUTABLE plan contracts live in `PlanAuditSpec.scala` (no\n" +
      "cartesian products over every graded plan, pushdown/broadcast/\n" +
      "bucket/codegen pins, the overflow walk); this dump is the\n" +
      "human-readable companion and MUST be regenerated in any round\n" +
      "that adds headline queries — a stale dump is worse than none.\n")
    headline.foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      df.collect() // resolve AQE to the final plan
      sb.append(s"\n## $name\n\n```\n")
      sb.append(df.queryExecution.executedPlan.toString.take(6000))
      sb.append("\n```\n")
    }
    Files.writeString(Paths.get("PLANS.md"), sb.toString)
    println(s"wrote PLANS.md (${headline.size} plans)")
    spark.stop()
  }
}

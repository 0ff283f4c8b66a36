package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Plan-audit artifact: dumps `explain("formatted")` for the headline
  * queries into PLANS.md so pushdown / broadcast / top-k physical choices
  * are inspectable without running Spark.
  *
  * Usage: runMain graft.Plans <sfDir> [outFile]
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val out = if (args.length > 1) args(1) else "PLANS.md"
    // same extensions as the Verify/Bench sessions: the injected rules
    // (manifest pruning, metadata aggregates) are PART of the plans this
    // artifact exists to audit, and the SQL-DDL lanes need the parser
    val spark = GraftSession.tune(SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.extensions",
        "org.apache.spark.sql.graft.GraftSessionExtensions"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val headliners = Seq(
      "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier_volume",
      "t1_top10_authors_per_venue", "t2_consecutive_years",
      "dedup_minhash_lsh", "dedup_embedding_lsh", "dedup_fuzzy_names",
      "dedup_simhash", "dedup_contamination", "sim_topk_bruteforce",
      "sim_topk_ivf", "sim_topk_quantized", "q_correlated_cheapest_order",
      "q_grouping_sets", "q_range_join_price_tiers", "q_merge_upsert",
      "q_window_functions", "events_range_frame", "events_sessions",
      "dedup_clusters", "text_bm25", "text_tfidf_keywords",
      "text_stratified_sample", "pii_scrub", "url_domains",
      "dedup_incremental", "events_funnel", "text_profile",
      "q_full_outer_reconcile", "q_unpivot_status", "sim_label_centroids",
      "coauthor_pagerank", "q_integrity_audit",
      "dedup_contamination_bloom", "text_compression_ratio",
      "coauthor_triangles", "q_range_join_binned", "q_histogram_equidepth",
      "text_weighted_sample", "dedup_containment", "events_mad_outliers",
      "events_session_window", "events_scd2",
      "q4_order_priority", "q13_order_distribution", "q18_large_orders",
      "q22_lapsed_customers", "dedup_substring", "dedup_semantic",
      "text_boilerplate_strip", "text_token_budget_mix",
      "text_heavy_hitters", "text_unigram_logprob", "text_char_entropy",
      "events_cohort_retention", "events_daily_ohlc",
      "events_asof_custom", "coauthor_clustering_coeff", "multimodal_route",
      "q7_nation_volume", "q14_promo_revenue", "q19_disjunctive_branches",
      "q21_only_late_supplier", "multimodal_resize",
      "q2_min_cost_supplier", "q8_market_share", "q9_product_profit",
      "q11_important_parts", "q15_top_supplier", "q16_supplier_diversity",
      "q17_small_qty_revenue", "q20_excess_shippers",
      "events_transitions", "events_hourly_topk", "events_ewma",
      "coauthor_kcore", "sim_topk_pq", "text_bpe_encode",
      "dedup_lines_global", "sim_knn_graph", "events_sliding_dau",
      "events_asof_tolerance", "text_quality_classifier", "text_vocab_coverage",
      "coauthor_neighbor_jaccard", "events_dedup_window", "events_pit_join",
      "text_chunk_overlap", "text_bigram_logprob", "text_cluster_split",
      "sim_rerank", "sim_random_projection", "privacy_erasure",
      "q_market_basket", "events_rfm", "events_cusum_drift",
      "text_chi2", "text_zipf_slope", "events_trigram_paths",
      "pipeline_corpus_build", "events_incremental_agg",
      "events_time_to_convert", "multimodal_integrity",
      "q_skew_report", "events_purchase_sessions", "text_langid_confusion",
      "events_calendar_gaps", "multimodal_fusion_centroids",
      "dedup_verbatim_prefix", "dedup_novelty_curve", "q_bootstrap_ci",
      "sim_vector_integrity", "events_weekday_seasonality",
      "coauthor_local_bridges", "dedup_source_overlap",
      "events_ab_lift", "coauthor_communities", "events_trend_slope",
      "multimodal_decode_image", "multimodal_decode_audio",
      "multimodal_decode_jpeg",
      "events_sliding_dau_approx", "coauthor_bfs_hops",
      "lake_format_renamed",
      "events_rolling_median", "events_weekday_anomaly",
      "multimodal_ahash", "multimodal_image_neardup",
      "multimodal_audio_fingerprint", "multimodal_audio_neardup",
      "multimodal_video_neardup", "privacy_k_anonymity",
      "multimodal_media_curation", "multimodal_curation_incremental",
      "multimodal_audio_shingle_neardup", "privacy_k_suppression",
      "multimodal_decode_gif", "multimodal_decode_mulaw",
      "multimodal_decode_flac",
      "multimodal_decode_av", "multimodal_decode_video",
      "multimodal_video_neardup_real", "archive_ingest",
      "archive_ingest_nested", "media_ingest_files",
      "lake_merge_cow", "lake_delete_erasure",
      "privacy_l_diversity", "privacy_t_closeness",
      "lake_cdc_changes", "lake_mv_incremental", "lake_schema_evolution",
      "lake_time_travel", "lake_range_slice", "lake_mor_delete",
      "dq_constraints_orders", "dq_referential", "dq_drift_psi",
      "multimodal_phash", "multimodal_phash_neardup", "sim_index_cdc",
      "lake_date_pruning", "lake_partition_pruning",
      "lake_string_pruning", "lake_merge_conditional",
      "lake_mor_changes", "lake_merge_nmbs_update", "lake_constraints",
      "lake_sink_aggregate", "text_mix_corpus", "text_pii_redact",
      "lake_keyless", "lake_partition_evolution",
      "pipeline_corpus_build_incremental",
      "lake_sql_view", "lake_sql_mv", "lake_string_key",
      "text_lm_stupid_backoff",
      "lake_sql_mv_minmax", "sim_topk_ivf_hires", "lake_sql_mv_distinct",
      "lake_sql_mv_join", "sim_topk_ivf_q8", "lake_sql_mv_view",
      "lake_sql_mv_starview", "lake_sql_mv_cascade")

    val sb = new StringBuilder
    sb.append("# Physical plans (generated by `runMain graft.Plans`)\n\n")
    sb.append(s"Scale dir: `$sfDir`. Things to look for: `PushedFilters` and pruned\n")
    sb.append("`ReadSchema` on every scan, partial+final `HashAggregate` pairs,\n")
    sb.append("`BroadcastHashJoin` for dimensions, `TakeOrderedAndProject` for global\n")
    sb.append("top-k, and `WholeStageCodegen` spans covering the hot operators.\n")
    headliners.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      sb.append(s"\n## $name\n\n```\n$plan```\n")
    }
    Files.writeString(Paths.get(out), sb.toString)
    println(s"[plans] wrote $out")
    spark.stop()
  }
}

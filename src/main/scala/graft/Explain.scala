package graft

/** Plan-audit main: prints `explain("formatted")` for the given query
  * keys (default: the plan-shape-critical set) so pushdown, codegen
  * spans, and join strategies can be reviewed and committed as
  * evidence (PLANS.md). */
object Explain {
  val defaults: Seq[String] = Seq(
    "q_scan_filter", "q_knn_filtered", "q_knn_ivf", "q_similarity_join",
    "q_join_broadcast", "q_join_shuffle", "q_join_theta_range", "q_join_asof",
    "q_agg_hash", "q_vector_centroid_agg", "q_dedup_near", "q_dedup_minhash",
    "q_tfidf", "q_embed_text", "q_knn_ivf_rule", "q_join_bucketed",
    "q_join_salted", "q_pivot",
    // round-3 additions
    "q_knn_pq", "q_decontaminate", "q_repetition", "q_text_redact",
    "q_ts_gapfill", "q_sample_hash", "q_zorder_layout", "q_dup_clusters",
    "q_source_csv", "q_agg_approx_quantile",
    // round-4 additions
    "q_sessionize", "q_merge_scd2", "q_compact_plan", "q_winsorize",
    "q_bm25", "q_span_dedup", "q_semdedup", "q_partition_pruned",
    "q_agg_cms", "q_analyze_stats", "q_agg_bitmap_distinct", "q_ts_decay", "q_mixture_apply", "q_doc_entropy",
    // round-7 additions
    "q_funnel", "q_retention", "q_ts_anomaly", "q_ngram_counts",
    "q_hard_negatives", "q_chunk_overlap", "q_cdc_apply", "q_expectations",
    "q_incremental_agg", "q_bpe_pairs", "q_compaction_exec",
    "q_knn_ivf_rule_l2", "q_table_commit",
    // round-8 additions (the documented round-7 snapshot wave)
    "q_pagerank", "q_lm_score", "q_bpe_merges", "q_sample_weighted",
    "q_skyline", "q_anomaly_mad", "q_embed_outlier",
    // round-8 second wave
    "q_ohlc_resample", "q_group_regression", "q_kanon_audit",
    "q_butterfly", "q_kl_drift", "q_tfidf_pairs", "q_vector_pca",
    "q_dp_counts", "q_rank_calibrate", "q_knn_recall", "q_split_assign",
    "q_source_binary", "q_maxsim", "q_encode_ids",
    // round-8 third wave
    "q_abtest", "q_chi2_indep", "q_markov_transitions",
    "q_attribution", "q_changepoint", "q_random_projection",
    "q_triangle_count", "q_assortativity", "q_path_ngrams",
    "q_retrieval_eval", "q_index_stats", "q_vocab_coverage",
    "q_minhash_recall", "q_join_asof_nearest", "q_discretize",
    "q_hybrid_search", "q_hits", "q_seasonality",
    // round-8 fourth wave
    "q_assoc_rules", "q_gini", "q_survival", "q_rfm",
    // round-8 fifth wave
    "q_fuzzy_match", "q_benford", "q_cohort_ltv", "q_naive_bayes",
    // round-8 sixth wave
    "q_kmeans", "q_precedence", "q_bootstrap_ci",
    // round-8 seventh wave
    "q_ols_multi", "q_seasonal_decompose", "q_inverted_index",
    // round-8 eighth wave
    "q_target_encoding", "q_window_funnel", "q_lof",
    // round-8 ninth wave
    "q_dbscan", "q_mutual_info", "q_permutation_test",
    // round-8 tenth wave
    "q_auc", "q_hll_registers", "q_kcore",
    // round-8 eleventh wave
    "q_psi", "q_als_rank1", "q_modularity",
    // round-8 twelfth wave
    "q_zipf_alpha", "q_ks_test", "q_bloom_probe",
    // round-8 thirteenth wave
    "q_acf", "q_info_gain", "q_clustering_coeff",
    // round-8 fourteenth wave
    "q_power_analysis", "q_conformal_interval", "q_gains_curve",
    // round-8 fifteenth wave
    "q_kmv_sketch", "q_quantile_sketch", "q_greedy_cover",
    // round-8 sixteenth wave
    "q_ewma_forecast", "q_eb_shrinkage", "q_feature_hashing",
    // round-8 seventeenth wave
    "q_ate_strata", "q_item_cf", "q_mutual_knn",
    // round-8 eighteenth wave
    "q_bfs_hops", "q_lsh_embed", "q_rolling_corr",
    // round-8 nineteenth wave
    "q_pareto_mass", "q_mmr_rerank", "q_skew_audit",
    // round-12 wave
    "q_manifest_prune", "q_quantile_normalize", "q_robust_scale",
    "q_ab_srm", "q_calibration_bins", "q_pack_efficiency", "q_ttr",
    "q_emd_drift",
    // round-12 second wave
    "q_cusum_alarms", "q_burstiness", "q_confusion_metrics",
    "q_embed_drift", "q_contrastive_pairs", "q_sssp",
    // round-12 third wave
    "q_knn_classifier", "q_class_balance", "q_pacf",
    // round-12 fourth wave
    "q_spearman", "q_tukey_hsd", "q_gmm_1d", "q_textrank", "q_crossval", "q_match_att", "q_cuped", "q_seq_ab", "q_did")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = Sessions.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    val names = if (args.nonEmpty) args.toSeq else defaults
    names.foreach { n =>
      println(s"\n===== $n =====")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}

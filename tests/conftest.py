import os
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

# Keep local test runs snappy; bench/driver use their own settings.
os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "8g")

from data_pipeline_project_spark.session import get_spark  # noqa: E402

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"

# Oracle-checked queries OUTSIDE the driver's 50-slot registry window
# (module, query fn, oracle SQL constant — all in
# data_pipeline_project_spark.plans). Consumed by the deregistered
# parity test AND the plan-quality sweep.
EXTRA_ORACLE_QUERIES = [
    ("relational_queries", "window_running_sum", "WINDOW_RUNNING_SUM_ORACLE"),
    ("relational_queries", "subquery_in_uncorrelated", "SUBQUERY_IN_ORACLE"),
    ("llmops_queries", "domain_balanced_cap", "DOMAIN_CAP_ORACLE"),
    ("llmops_queries", "stratified_sample_by_source", "STRATIFIED_SAMPLE_ORACLE"),
    ("relational_queries", "scd2_customer_priority_history", "SCD2_ORACLE"),
    ("llmops_queries", "heavy_hitter_terms", "HEAVY_HITTER_ORACLE"),
    ("relational_queries", "window_range_frame", "WINDOW_RANGE_FRAME_ORACLE"),
    ("llmops_queries", "reservoir_per_source", "RESERVOIR_PER_SOURCE_ORACLE"),
    ("llmops_queries", "document_chunks", "DOCUMENT_CHUNKS_ORACLE"),
    ("relational_queries", "referential_integrity_audit", "REFERENTIAL_AUDIT_ORACLE"),
    ("llmops_queries", "pii_scrub", "PII_SCRUB_ORACLE"),
    ("relational_queries", "feature_zscore", "FEATURE_ZSCORE_ORACLE"),
    ("relational_queries", "winsorize_values", "WINSORIZE_ORACLE"),
    ("llmops_queries", "ivf_ann_recall", "IVF_ANN_RECALL_ORACLE"),
    ("llmops_queries", "repetition_quality_flags", "REPETITION_ORACLE"),
    ("llmops_queries", "unigram_logprob_score", "UNIGRAM_LOGPROB_ORACLE"),
    ("llmops_queries", "sequence_packing", "SEQUENCE_PACKING_ORACLE"),
    ("relational_queries", "approx_quantile_accuracy", "APPROX_QUANTILE_ORACLE"),
    ("llmops_queries", "embedding_int8_quantization", "EMBEDDING_QUANTIZE_ORACLE"),
    ("llmops_queries", "vocab_oov_rate", "VOCAB_OOV_ORACLE"),
    ("llmops_queries", "count_min_term_counts", "COUNT_MIN_ORACLE"),
    ("relational_queries", "skew_salted_agg", "SKEW_SALTED_AGG_ORACLE"),
    ("relational_queries", "table_profile", "TABLE_PROFILE_ORACLE"),
    ("relational_queries", "data_expectations", "DATA_EXPECTATIONS_ORACLE"),
    ("llmops_queries", "corpus_mixture_sample", "CORPUS_MIXTURE_ORACLE"),
    ("temporal_queries", "interval_overlap_windows", "INTERVAL_OVERLAP_ORACLE"),
    ("relational_queries", "incremental_agg_retract", "INCREMENTAL_RETRACT_ORACLE"),
    ("relational_queries", "feature_rank_normalize", "FEATURE_RANK_ORACLE"),
    ("llmops_queries", "weighted_sample_docs", "WEIGHTED_SAMPLE_ORACLE"),
    # Round-6 registry swap: these three ceded their driver-board slots
    # to the corpus tier (duplicate_passages, incremental_agg_merge,
    # decontamination_overlap) and keep full parity here instead.
    ("llmops_queries", "dedup_ngram_jaccard", "NGRAM_JACCARD_ORACLE"),
    # Round-11 swap-out (slot ceded to stats_catalog_parity):
    ("llmops_queries", "train_val_test_split", "TRAIN_VAL_TEST_ORACLE"),
    ("llmops_queries", "training_shard_assignment", "TRAINING_SHARD_ORACLE"),
    # Round-13 swap-out (slot ceded to advised_join_parity; still
    # exercised end-to-end by clean_corpus_pipeline):
    ("llmops_queries", "dedup_exact", "DEDUP_EXACT_ORACLE"),
    ("relational_queries", "preprocess_rename_project_dropna", "PREPROCESS_RENAME_ORACLE"),
    ("relational_queries", "round_robin_synthetic_key", "ROUND_ROBIN_KEY_ORACLE"),
    ("relational_queries", "subquery_scalar_avg", "SUBQUERY_SCALAR_AVG_ORACLE"),
    ("llmops_queries", "leakage_safe_split", "LEAKAGE_SPLIT_ORACLE"),
    ("llmops_queries", "embedding_random_projection", "RANDOM_PROJECTION_ORACLE"),
    ("llmops_queries", "shard_mixing_quality", "SHARD_MIXING_ORACLE"),
    ("llmops_queries", "text_normalization_stats", "TEXT_NORMALIZATION_ORACLE"),
    ("llmops_queries", "temperature_mixture_budgets", "TEMPERATURE_MIXTURE_ORACLE"),
    ("llmops_queries", "dedup_keep_best_quality", "KEEP_BEST_QUALITY_ORACLE"),
    ("llmops_queries", "embedding_centroid_stats", "EMBEDDING_CENTROID_ORACLE"),
    ("relational_queries", "cohort_retention", "COHORT_RETENTION_ORACLE"),
    ("relational_queries", "funnel_conversion", "FUNNEL_ORACLE"),
    ("relational_queries", "event_anomaly_zscore", "ANOMALY_ZSCORE_ORACLE"),
    ("relational_queries", "join_skew_report", "JOIN_SKEW_ORACLE"),
    ("llmops_queries", "distribution_drift_psi", "DRIFT_PSI_ORACLE"),
    ("relational_queries", "q8_market_share", "Q8_MARKET_SHARE_ORACLE"),
    ("relational_queries", "q19_disjunctive_predicates", "Q19_DISJUNCTIVE_ORACLE"),
    ("temporal_queries", "resample_forward_fill", "RESAMPLE_FFILL_ORACLE"),
    ("llmops_queries", "hard_negatives_topk", "HARD_NEGATIVES_ORACLE"),
    ("llmops_queries", "pii_pseudonymize", "PSEUDONYMIZE_ORACLE"),
    # TPC-H completion tier (round 6): the remaining classic shapes,
    # adapted to the synthetic schema (see the section comment in
    # plans/relational_queries.py).
    ("relational_queries", "q2_min_cost_supplier", "Q2_MIN_COST_SUPPLIER_ORACLE"),
    ("relational_queries", "q4_order_priority", "Q4_ORDER_PRIORITY_ORACLE"),
    ("relational_queries", "q6_forecast_revenue", "Q6_FORECAST_REVENUE_ORACLE"),
    ("relational_queries", "q7_volume_shipping", "Q7_VOLUME_SHIPPING_ORACLE"),
    ("relational_queries", "q9_product_profit", "Q9_PRODUCT_PROFIT_ORACLE"),
    ("relational_queries", "q11_important_stock", "Q11_IMPORTANT_STOCK_ORACLE"),
    ("relational_queries", "q12_late_shipments", "Q12_LATE_SHIPMENTS_ORACLE"),
    ("relational_queries", "q13_customer_distribution", "Q13_CUSTOMER_DISTRIBUTION_ORACLE"),
    ("relational_queries", "q15_top_supplier", "Q15_TOP_SUPPLIER_ORACLE"),
    ("relational_queries", "q16_supplier_part_count", "Q16_SUPPLIER_PART_COUNT_ORACLE"),
    ("relational_queries", "q17_small_qty_revenue", "Q17_SMALL_QTY_REVENUE_ORACLE"),
    ("relational_queries", "q18_large_volume_customer", "Q18_LARGE_VOLUME_CUSTOMER_ORACLE"),
    ("relational_queries", "q20_excess_suppliers", "Q20_EXCESS_SUPPLIERS_ORACLE"),
    ("relational_queries", "q21_waiting_suppliers", "Q21_WAITING_SUPPLIERS_ORACLE"),
    ("relational_queries", "q22_global_sales", "Q22_GLOBAL_SALES_ORACLE"),
    # Round-6 second extension batch.
    ("llmops_queries", "inverted_index_postings", "INVERTED_INDEX_ORACLE"),
    ("relational_queries", "set_ops_all_variants", "SET_OPS_ALL_ORACLE"),
    ("temporal_queries", "sensor_gap_report", "SENSOR_GAP_ORACLE"),
    ("temporal_queries", "state_change_compress", "STATE_CHANGE_ORACLE"),
    ("relational_queries", "window_value_functions", "WINDOW_VALUE_FUNCTIONS_ORACLE"),
    ("relational_queries", "array_functions_suite", "ARRAY_FUNCTIONS_ORACLE"),
    ("relational_queries", "null_semantics", "NULL_SEMANTICS_ORACLE"),
    ("llmops_queries", "minhash_lsh_recall", "MINHASH_LSH_RECALL_ORACLE"),
    ("temporal_queries", "ohlc_bars", "OHLC_BARS_ORACLE"),
    ("relational_queries", "stat_moments", "STAT_MOMENTS_ORACLE"),
    # Round-6 second registry swap: these three ceded their driver-board
    # slots to boilerplate_line_dedup / bigram_logprob_score / cdc_chunking.
    ("relational_queries", "pivot_event_values", "PIVOT_EVENT_VALUES_ORACLE"),
    ("relational_queries", "scalar_functions", "SCALAR_FUNCTIONS_ORACLE"),
    ("relational_queries", "json_extraction", "JSON_EXTRACTION_ORACLE"),
    ("temporal_queries", "resample_linear_interp", "RESAMPLE_INTERP_ORACLE"),
    ("relational_queries", "explode_outer_semantics", "EXPLODE_OUTER_ORACLE"),
    ("relational_queries", "try_arithmetic", "TRY_ARITHMETIC_ORACLE"),
    ("llmops_queries", "token_entropy", "TOKEN_ENTROPY_ORACLE"),
    ("llmops_queries", "zipf_fit", "ZIPF_FIT_ORACLE"),
    ("relational_queries", "histogram_quantiles", "HISTOGRAM_QUANTILES_ORACLE"),
    # Round-8 registry swap: table_checksum_digest took map_explode_props'
    # driver-board slot (64 digest rows hash harder than a 3-row key agg).
    ("relational_queries", "map_explode_props", "MAP_EXPLODE_PROPS_ORACLE"),
    ("relational_queries", "time_functions", "TIME_FUNCTIONS_ORACLE"),
    # Round-8 additions.
    ("llmops_queries", "pii_redaction", "PII_REDACTION_ORACLE"),
    ("relational_queries", "variant_json_path", "VARIANT_JSON_PATH_ORACLE"),
    # Round-9 registry swap: stat_correlations took q14_promo_revenue's
    # driver-board slot (3 groups x 8 float stats hash harder than one
    # scalar ratio row).
    ("relational_queries", "q14_promo_revenue", "Q14_PROMO_REVENUE_ORACLE"),
]


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    yield con
    con.close()

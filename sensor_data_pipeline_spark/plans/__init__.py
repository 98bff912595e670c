from sensor_data_pipeline_spark.plans.registry import REGISTRY, QuerySpec, all_oracle_sql, all_queries  # noqa: F401

# importing the modules populates REGISTRY
from sensor_data_pipeline_spark.plans import relational  # noqa: F401,E402
from sensor_data_pipeline_spark.plans import sensor  # noqa: F401,E402
from sensor_data_pipeline_spark.plans import northstar  # noqa: F401,E402
from sensor_data_pipeline_spark.plans import multimodal  # noqa: F401,E402
from sensor_data_pipeline_spark.plans import advanced  # noqa: F401,E402
from sensor_data_pipeline_spark.plans import streaming_queries  # noqa: F401,E402
from sensor_data_pipeline_spark.plans import storage  # noqa: F401,E402
from sensor_data_pipeline_spark.plans import warehouse  # noqa: F401,E402
from sensor_data_pipeline_spark.plans import tpch_shapes  # noqa: F401,E402
from sensor_data_pipeline_spark.plans import corpus_quality  # noqa: F401,E402
from sensor_data_pipeline_spark.plans import sql_interface  # noqa: F401,E402
from sensor_data_pipeline_spark.plans import api_surface  # noqa: F401,E402
from sensor_data_pipeline_spark.plans import pipeline_v2  # noqa: F401,E402
from sensor_data_pipeline_spark.plans import scale_ops  # noqa: F401,E402
from sensor_data_pipeline_spark.plans import layout  # noqa: F401,E402
from sensor_data_pipeline_spark.plans import iterative  # noqa: F401,E402
from sensor_data_pipeline_spark.plans import curation  # noqa: F401,E402
from sensor_data_pipeline_spark.plans import behavior  # noqa: F401,E402
from sensor_data_pipeline_spark.plans import inference  # noqa: F401,E402
from sensor_data_pipeline_spark.plans import frontier  # noqa: F401,E402
from sensor_data_pipeline_spark.plans import frontier2  # noqa: F401,E402
from sensor_data_pipeline_spark.plans import frontier3  # noqa: F401,E402

# Driver-window ordering: the driver's CORRECTNESS check covers the
# FIRST 50 registered queries, so the first 50 must span every
# SURVEY.md §2 family and every LLM-pipeline operator — one or more
# representatives each — rather than whatever import order produced.
# Everything else follows in original registration order.
_DRIVER_WINDOW = [
    # ROUND-8 ROTATION: the COVERAGE-CLOSING window. 42/50 fresh =
    # exactly the 42 rows never driver-checked in r1-r7 (the set the
    # round-7 window comment enumerated, verified against the union of
    # CORRECTNESS_r01..r07 green rows), + the same 8 forced family reps
    # (streaming/multimodal/cdc/source/stateful/time/udf/functions have
    # no never-checked members). When this window lands green,
    # cumulative driver coverage is 339/339 — every declared query
    # driver-verified at least once (VERDICT r7 item 1).
    #
    # ROUND-9+ ROTATION POLICY (VERDICT r7 item 5): with coverage
    # closed, the window becomes a STALENESS-ORDERED regression
    # rotation. Each round, the 42 fresh slots re-verify the queries
    # whose most recent green driver row is OLDEST (primary key: round
    # of last green row ascending; tie-break: registration order), so
    # r1/r2-vintage evidence — checked before ANSI mode and the exact
    # integer-division discipline existed — is refreshed first. New
    # frontier queries added in round N enter the window in round N+1
    # ahead of the staleness queue (never-checked beats stale). The 8
    # family-rep slots stay forced so every SURVEY §2.9 family keeps a
    # same-round canary.
    # --- forced family repeats (proven canaries) ---
    "q114_custom_source",  # source rep (r3-r7 green)
    "q215_media_phash_neardup",  # multimodal rep (r4-r7 green)
    "q243_disorder_profile",  # time rep (r4-r7 green)
    "q287_stream_nearest_match",  # streaming rep (r4/r6/r7 green)
    "q260_stream_tws_delta",  # stateful rep (r4/r6/r7 green)
    "q117_group_zscore",  # udf rep (r3/r5/r6/r7 green)
    "q65_array_map_funcs",  # functions rep (r5/r6/r7 green)
    "q194_incremental_rollup",  # cdc rep (r6/r7 green)
    # --- fresh: the final 42 never-checked rows (r1-era shapes) ---
    "q58_unpivot",
    "q60_percentiles",
    "q61_histogram",
    "q64_hierarchical_rollup",
    "q78_hash_sample",
    "q85_stratified_sample",
    "q87_rank_suite",
    "q108_pattern_scan",
    "q115_arrow_norms",
    "q120_file_provenance",
    "q123_source_capped_sample",
    "q129_user_event_sequences",
    "q132_robust_outlier_stats",
    "q135_nested_schema_surgery",
    "q157_token_chunking",
    "q160_weighted_sample",
    "q169_compaction_audit",
    "q177_embedding_drift",
    "q179_table_checksum",
    "q184_argmax_single_pass",
    "q185_dup_provenance_matrix",
    "q187_wilson_quality_gate",
    "q188_schema_drift_audit",
    "q189_log2_histogram",
    "q190_group_quantiles_by_counting",
    "q193_replica_bucket_diff",
    "q196_first_touch_attribution",
    "q201_sql_scripting",
    "q202_dynamic_partition_overwrite",
    "q206_skew_gini",
    "q209_collated_grouping",
    "q227_negative_sampling",
    "q228_mad_anomaly_gate",
    "q230_simpson_diversity_gate",
    "q231_gopher_rules_gate",
    "q239_mixture_allocation",
    "q245_rank_normalize",
    "q249_vocab_growth",
    "q264_rendezvous_shards",
    "q280_decay_attribution",
    "q286_calibration_bins",
    "q320_event_path_mining",
]


def _apply_driver_window() -> None:
    missing = [n for n in _DRIVER_WINDOW if n not in REGISTRY]
    if missing:
        raise RuntimeError(f"driver-window names not registered: {missing}")
    head = set(_DRIVER_WINDOW)
    ordered = {n: REGISTRY[n] for n in _DRIVER_WINDOW}
    ordered.update({n: s for n, s in REGISTRY.items() if n not in head})
    REGISTRY.clear()
    REGISTRY.update(ordered)


_apply_driver_window()

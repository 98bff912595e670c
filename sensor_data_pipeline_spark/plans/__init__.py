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

# Driver-window ordering: the driver's CORRECTNESS check covers the
# FIRST 50 registered queries, so the first 50 must span every
# SURVEY.md §2 family and every LLM-pipeline operator — one or more
# representatives each — rather than whatever import order produced.
# Everything else follows in original registration order.
_DRIVER_WINDOW = [
    # ROUND-5 ROTATION: 43/50 fresh (never driver-checked in r1-r4) —
    # the maximum reachable: 4 slots are the VERDICT-mandated canaries
    # for the scale-0-decimal fix (q237/q279 changed, q281/q287 nearby
    # hashing-sensitive patterns), and 3 families (source, multimodal,
    # time) have no never-checked members left, so q114/q215/q243
    # repeat as their representatives. The 43 fresh rows prioritize
    # the r4 additions (q261-q323) plus the r1-era relational/window
    # mid-range, per VERDICT r4 item 3. Cumulative driver-verified
    # target: >=214/315.
    # --- canaries: changed by the r5 decimal fix or hashing-adjacent ---
    "q237_correlation_moments",  # cov_num now a digit string
    "q279_revenue_bridge",  # price/volume_effect_num now strings
    "q281_gram_matrix",  # mapInArrow numpy partials (r4 green)
    "q287_stream_nearest_match",  # two-sided-band join (r4 green)
    # --- forced family repeats (no never-checked members remain) ---
    "q114_custom_source",  # source-family representative
    "q215_media_phash_neardup",  # multimodal representative (r4 green)
    "q243_disorder_profile",  # time-family representative (r4 green)
    # --- changed this round (never checked): md5 gram keys / global_ntile ---
    "q314_ngram_novelty",
    "q318_rfm_segmentation",
    # --- fresh: streaming / stateful / cdc ---
    "q301_stream_hopping_distinct",
    "q171_stream_complete_topk",
    "q180_stream_dlq_routing",
    "q283_bounded_inventory",
    "q274_bitemporal_snapshot",
    "q268_join_view_maintenance",
    # --- fresh: dedup / similarity / text / corpus ---
    "q205_canonical_selection",
    "q267_random_projection",
    "q295_rrf_fusion",
    "q240_conjunctive_search",
    "q308_normalize_idempotent",
    "q182_zipf_slope",
    "q186_char_trigram_profile",
    "q321_feature_hashing_census",
    # --- fresh: quality / analytics / aggregation ---
    "q244_k_anonymity_audit",
    "q323_data_contract_validation",
    "q317_centile_normalization",
    "q311_grouped_ols_trend",
    "q292_weighted_quantiles",
    "q306_abc_classification",
    "q309_winsorized_mean",
    # --- fresh: join / window / udf / functions / json / sql ---
    "q261_bloom_semijoin",
    "q284_asof_nearest",
    "q116_lateral_topk",
    "q63_gap_islands",
    "q117_group_zscore",
    "q65_array_map_funcs",
    "q154_jsonl_roundtrip",
    "q210_parameterized_sql",
    # --- fresh: profile / inference family (r4 additions) ---
    "q288_benford_digit_audit",
    "q312_chi2_independence",
    "q315_bh_fdr_control",
    "q319_psi_drift_audit",
    # --- fresh: timeseries / graph / sampling ---
    "q282_time_weighted_average",  # r5 fragile_cells fix: area -> string
    "q278_sax_motifs",
    "q302_bellman_ford",
    "q316_poisson_bootstrap_ci",
    # --- fresh: storage / reshape / layout / audit ---
    "q322_erasure_cascade_audit",
    "q304_transpose_metrics",
    "q310_zonemap_prune_audit",
    "q250_referential_integrity",
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

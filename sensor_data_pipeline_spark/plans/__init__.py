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

# Driver-window ordering: the driver's CORRECTNESS check covers the
# FIRST 50 registered queries, so the first 50 must span every
# SURVEY.md §2 family and every LLM-pipeline operator — one or more
# representatives each — rather than whatever import order produced.
# Everything else follows in original registration order.
_DRIVER_WINDOW = [
    # ROUND-7 ROTATION: 42/50 fresh (never driver-checked in r1-r6),
    # per VERDICT r6 items 1 and 4. Lead with the round-6 frontier
    # family q333-q339 (zero driver rows, newest portability surface:
    # adaptive-width bin() arithmetic, 63-bits/word signed packing,
    # segment-partial cosine) and the brand-new round-7 family
    # q340-q347 (repetition gate, budget selection, migration matrix,
    # split leakage, decontamination curve, padding audit,
    # water-filling caps, IVF probe curve), then the r1-era TPC-H
    # stragglers and the analytics/aggregation mass. 8 repeat slots
    # are forced family reps (streaming/multimodal/cdc/source/
    # stateful/time/udf/functions have no never-checked members).
    #
    # TWO-ROUND PLAN TO 339/339 (VERDICT r6 item 4): after this
    # window lands green, cumulative driver coverage is 297/339 and
    # EXACTLY 42 never-checked rows remain (q58 q60 q61 q64 q78 q85
    # q87 q108 q115 q120 q123 q129 q132 q135 q157 q160 q169
    # q177 q179 q184 q185 q187 q188 q189 q190 q193 q196 q201 q202
    # q206 q209 q227 q228 q230 q231 q239 q245 q249 q264 q280 q286
    # q320) —
    # the round-8 window is those 42 fresh + the same 8 family reps,
    # closing cumulative coverage at 339/339.
    # --- forced family repeats (proven canaries) ---
    "q114_custom_source",  # source rep (r3/r4/r5/r6 green)
    "q215_media_phash_neardup",  # multimodal rep (r4/r5/r6 green)
    "q243_disorder_profile",  # time rep (r4/r5/r6 green)
    "q287_stream_nearest_match",  # streaming rep (r4/r6 green)
    "q260_stream_tws_delta",  # stateful rep (r4/r6 green)
    "q117_group_zscore",  # udf rep (r3/r5/r6 green)
    "q65_array_map_funcs",  # functions rep (r5/r6 green)
    "q194_incremental_rollup",  # cdc rep (r6 green)
    # --- fresh: round-6 frontier family (never driver-checked) ---
    "q333_hard_negative_mining",
    "q334_packing_efficiency_curve",
    "q335_rouge_candidate_f1",
    "q336_matryoshka_recall",
    "q337_curriculum_interleave",
    "q338_bloom_dedup_fpr_audit",
    "q339_reciprocal_nn_pairs",
    # --- fresh: round-7 frontier family (new this round) ---
    "q340_repetition_signals",
    "q341_token_budget_selection",
    "q342_centroid_migration",
    "q343_split_leakage_audit",
    "q344_decontamination_curve",
    "q345_padding_waste_audit",
    "q346_waterfill_source_caps",
    "q347_ivf_probe_recall_curve",
    # --- fresh: r1-era TPC-H stragglers ---
    "q105_dominant_part_suppliers",
    "q106_market_share",
    "q118_sole_late_supplier",
    "q146_top_revenue_supplier",
    "q147_part_supplier_breadth",
    # --- fresh: analytics / aggregation / timeseries mass ---
    "q88_stats_exact",
    "q156_kmv_distinct_sketch",
    "q178_median_twopass",
    "q246_ols_moments_by_key",
    "q247_transition_matrix",
    "q248_frequency_drift",
    "q262_decayed_engagement",
    "q263_supplier_skyline",
    "q265_funnel_conversion",
    "q266_peak_concurrency",  # re-shaped this round (single-scan explode + pinned boundaries)
    "q269_bfs_khop",
    "q273_linear_interp_resample",
    "q276_cusum_shift_detector",
    "q285_exact_auc",
    "q289_welch_ttest",
    "q296_mutual_information",
    "q299_autocorrelation",
    "q300_largest_remainder_alloc",
    "q305_seasonal_dow_index",
    "q307_join_skew_report",
    "q313_markov_transitions",
    # --- fresh: json family (q155 is its only never-checked member) ---
    "q155_csv_roundtrip",
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

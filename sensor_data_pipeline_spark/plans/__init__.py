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
from sensor_data_pipeline_spark.plans import frontier4  # noqa: F401,E402
from sensor_data_pipeline_spark.plans import frontier5  # noqa: F401,E402
from sensor_data_pipeline_spark.plans import frontier6  # noqa: F401,E402
from sensor_data_pipeline_spark.plans import frontier7  # noqa: F401,E402

# Driver-window ordering: the driver's CORRECTNESS check covers the
# FIRST 50 registered queries, so the first 50 must span every
# SURVEY.md §2 family and every LLM-pipeline operator — one or more
# representatives each — rather than whatever import order produced.
# Everything else follows in original registration order.
_DRIVER_WINDOW = [
    # ROUND-12 ROTATION (policy: VERDICT r7 item 5, unchanged): 8
    # forced family reps + 42 fresh slots. Fresh slots regenerated
    # with `python tools/window_rotation.py 42` at r12 start against
    # the 50/50-green CORRECTNESS_r11 artifact (all r11 rows landed
    # green, so the output matches the r11 enumerate-ahead plan with
    # the 7 never-checked r11 entrants q387-q393 jumping the queue,
    # then the r3-vintage staleness queue through q232). When this
    # window lands green, cumulative driver coverage closes at
    # 385/385 (every registered query has at least one green driver
    # row) and the oldest remaining evidence is r3.
    #
    # R13 WINDOW PLAN (enumerate-ahead discipline, VERDICT r9 item
    # 7): assuming this window lands green, the next 42 fresh slots
    # are pure staleness queue — any round-12 entrants (none are
    # planned; this is an optimization round) would jump it first.
    # Generated via `python tools/window_rotation.py 84 | tail -42`
    # at r12 start:
    #   q222, q220, q221, q297, q218, q219, q271, q233, q259, q303,
    #   q242, q122, q195, q212, q270, q277, q213, q214, q216, q217,
    #   q224, q225, q229, q234, q235, q236, q238, q251, q252, q253,
    #   q254, q255, q256, q257, q258, q272, q275, q290, q291, q293,
    #   q294, q298 (all r4 vintage).
    # Regenerate with `python tools/window_rotation.py 42` at r13
    # start in case any r12 row comes back red (a red row keeps its
    # old last-green round and re-enters by staleness).
    # --- forced family repeats (proven canaries) ---
    "q114_custom_source",  # source rep (r3-r10 green, 8-round canary)
    "q215_media_phash_neardup",  # multimodal rep (r4-r10 green)
    "q243_disorder_profile",  # time rep (r4-r10 green)
    "q287_stream_nearest_match",  # streaming rep (r4/r6-r10 green)
    "q260_stream_tws_delta",  # stateful rep (r4/r6-r10 green)
    "q117_group_zscore",  # udf rep (r3/r5-r10 green)
    "q65_array_map_funcs",  # functions rep (r5-r10 green)
    "q194_incremental_rollup",  # cdc rep (r6-r10 green)
    # --- never-checked: the 7 r11 entrants ---
    "q387_source_entropy_typicality",
    "q388_bigram_pmi_topk",
    "q389_multiprobe_lsh_recall",
    "q390_pretokenizer_fidelity",
    "q391_dedup_keeper_manifest",
    "q392_langid_ece_calibration",
    "q393_epoch_order_audit",
    # --- staleness queue: the r3 block ---
    "q100_gap_fill",
    "q112_sliding_window",
    "q68_stream_sessionize",
    "q162_stream_left_outer",
    "q170_stream_session_window",
    "q183_stream_observe_audit",
    "q200_stream_recursive_ewma",
    "q71_partition_pruning",
    "q72_bucketed_join",
    "q144_latency_priority_matrix",
    "q107_repetition_gate",
    "q109_cohort_retention",
    "q110_cluster_representatives",
    "q152_incremental_dedup",
    "q153_leakage_free_split",
    "q111_sql_text_interface",
    "q203_recursive_cte_rollup",
    "q204_polymorphic_udtf",
    "q158_sequence_packing",
    "q161_orc_roundtrip",
    "q163_pii_redaction",
    "q164_rolling_median",
    "q166_cdc_compaction",
    "q168_countmin_calibration",
    "q173_corrupt_file_skip",
    "q174_filter_funnel",
    "q175_cdc_chunk_dedup",
    "q176_kmv_sketch_merge",
    "q181_interval_overlap_join",
    "q192_heavy_hitters_mg",
    "q208_pipeline_end_to_end",
    "q211_pq_ann_recall",
    "q223_bm25_retrieval",
    "q226_semdedup",
    "q232_tfidf_cosine_pairs",
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

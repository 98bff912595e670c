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
    # ROUND-11 ROTATION (policy: VERDICT r7 item 5, unchanged): 8
    # forced family reps + 42 fresh slots. Fresh slots regenerated
    # with `python tools/window_rotation.py 42` at r11 start against
    # the 50/50-green CORRECTNESS_r10 artifact and match the r10
    # enumerate-ahead plan: the 9 never-checked r10 entrants
    # (q378-q386) jump the queue, then the staleness queue in
    # (last-green-round, query-number) order — the r2 block, then
    # the front of the r3 block through q95. When this window lands
    # green, cumulative driver coverage closes at 378/378 (every
    # registered query has at least one green driver row) and the
    # oldest remaining evidence is r3.
    #
    # R12 WINDOW PLAN (enumerate-ahead discipline, VERDICT r9 item
    # 7): assuming this window lands green, the next 42 fresh slots
    # are pure staleness queue — any round-11 entrants registered
    # below (q387+) jump it first, exactly as the r10 entrants did
    # here. Generated via `python tools/window_rotation.py 84 |
    # tail -42` at r11 start:
    #   q100, q112, q68, q162, q170, q183, q200, q71, q72, q144,
    #   q107, q109, q110, q152, q153, q111, q203, q204, q158, q161,
    #   q163, q164, q166, q168, q173, q174, q175, q176, q181, q192,
    #   q208, q211, q223, q226, q232 (r3 vintage), then q222, q220,
    #   q221, q297, q218, q219, q271 (r4 vintage).
    # Regenerate with `python tools/window_rotation.py 42` at r12
    # start in case any r11 row comes back red (a red row keeps its
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
    # --- never-checked: the 9 r10 entrants ---
    "q378_hll_error_calibration",
    "q379_temperature_mixture",
    "q380_unseen_mass_estimate",
    "q381_salting_plan",
    "q382_partition_sizing_advisor",
    "q383_vocab_coverage_curve",
    "q384_neyman_allocation",
    "q385_hdr_quantile_sketch",
    "q386_kish_design_effect",
    # --- staleness queue: the r2 block, then the r3 front ---
    "q49_lsh_bucket_ann",
    "q50_embedding_neardup",
    "q66_ivf_ann",
    "q74_dedup_components",
    "q83_token_shards",
    "q86_minhash_calibration",
    "q51_media_decode_stats",
    "q52_image_resize_plan",
    "q53_video_frame_sample",
    "q80_grouped_agg_udf",
    "q94_udtf_expand",
    "q67_stream_watermark_window",
    "q69_stream_dedup",
    "q70_stream_static_join",
    "q96_stream_stream_join",
    "q89_profile",
    "q90_merge_upsert",
    "q91_scd2_history",
    "q92_funnel",
    "q93_ann_recall",
    "q136_stable_id_assignment",
    "q137_block_dedup_audit",
    "q151_http_poll_source",
    "q199_custom_stream_drain",
    "q207_stream_cdc_apply",
    "q150_neardup_lsh_recall",
    "q191_banded_dedup_clusters",
    "q54_audio_features",
    "q56_salted_join",
    "q62_approx_aggs",
    "q73_subtokens_map_lookup",
    "q76_range_frame_window",
    "q95_variant_json",
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

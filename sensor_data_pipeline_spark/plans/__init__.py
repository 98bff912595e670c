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

# Driver-window ordering: the driver's CORRECTNESS check covers the
# FIRST 50 registered queries, so the first 50 must span every
# SURVEY.md §2 family and every LLM-pipeline operator — one or more
# representatives each — rather than whatever import order produced.
# Everything else follows in original registration order.
_DRIVER_WINDOW = [
    # ROUND-9 ROTATION (the committed r9+ policy below, first
    # application): 8 forced family reps + 17 never-checked rows
    # (q129 — reshaped this round to emit first_events as a delimited
    # STRING after its r8 canonicalizer error — plus the 16 r8-era
    # q348-q363 registered after the r8 window was set) + 25
    # staleness-queue rows. The staleness queue is computed from the
    # committed CORRECTNESS_r01..r08 artifacts: queries whose most
    # recent green driver row is OLDEST first (primary key: round of
    # last green row ascending; tie-break: query number), which makes
    # the front of the queue exactly the r1-vintage rows — evidence
    # gathered before ANSI mode and the exact integer-division
    # discipline existed. When this window lands green, cumulative
    # driver coverage closes at 355/355 AND the 25 oldest evidence rows
    # are refreshed to r9.
    #
    # ROUND-10+ ROTATION POLICY (unchanged, VERDICT r7 item 5): each
    # round the non-rep slots re-verify never-checked queries first
    # (new round-N queries enter the round-N+1 window), then the
    # staleness queue in (last-green-round, query-number) order. The 8
    # family-rep slots stay forced so every SURVEY §2.9 family keeps a
    # same-round canary.
    #
    # R10 WINDOW PLAN (VERDICT r8 item 5, enumerated via
    # tools/window_rotation.py assuming this r9 window lands green):
    # 8 reps + 13 never-checked r9 entrants (q364 calibration split +
    # frontier4 q365-q372 minus q368, which took this window's
    # similarity-canary slot, + frontier5 q373-q377) + the 29-row
    # staleness front: q130 (displaced by q368 here), q131, q133,
    # q134 (the last r1-vintage rows), then the r2 block q01, q12,
    # q20-q31, q40-q48 in query-number order.
    # Regenerate with `python tools/window_rotation.py 42` at r10
    # start in case any r9 row comes back red (a red row keeps its
    # old last-green round and re-enters by staleness, while the
    # never-checked set shrinks/grows accordingly).
    # --- forced family repeats (proven canaries) ---
    "q114_custom_source",  # source rep (r3-r8 green)
    "q215_media_phash_neardup",  # multimodal rep (r4-r8 green)
    "q243_disorder_profile",  # time rep (r4-r8 green)
    "q287_stream_nearest_match",  # streaming rep (r4/r6/r7/r8 green)
    "q260_stream_tws_delta",  # stateful rep (r4/r6/r7/r8 green)
    "q117_group_zscore",  # udf rep (r3/r5-r8 green)
    "q65_array_map_funcs",  # functions rep (r5-r8 green)
    "q194_incremental_rollup",  # cdc rep (r6/r7/r8 green)
    # --- never-checked: q129 (r8 canonicalizer error, now reshaped)
    # --- + the 16 corpus-governance queries registered in r8 ---
    "q129_user_event_sequences",
    "q348_template_skeleton_mining",
    "q349_zipf_octave_profile",
    "q350_kanonymity_audit",
    "q351_rater_agreement_kappa",
    "q352_epoch_repeat_budget",
    "q353_gate_cofire_matrix",
    "q354_oov_rate_audit",
    "q355_split_balance_chisq",
    "q356_lsh_s_curve_audit",
    "q357_source_tv_divergence",
    "q358_quality_auc_ranksum",
    "q359_rater_error_triangulation",
    "q360_dedup_yield_forecast",
    "q361_context_overflow_audit",
    "q362_datacard_census",
    "q363_eval_sample_sizing",
    # --- staleness queue: the 25 oldest green rows (all r1-vintage) ---
    "q02_join_customer_orders",
    "q03_broadcast_dim_chain",
    "q04_semi_join",
    "q05_anti_join",
    "q06_outer_join_counts",
    "q07_agg_stats",
    "q08_rollup",
    "q09_cube",
    "q10_distinct",
    "q11_window_rank",
    "q13_window_running_sum",
    "q14_global_topk",
    "q15_set_ops",
    "q16_string_funcs",
    "q17_date_funcs",
    "q18_case_bucketing",
    "q19_correlated_scalar",
    "q97_shipping_priority",
    "q98_local_supplier_volume",
    "q99_decimal_exact",
    "q125_asof_tolerance",
    "q126_schema_evolution_union",
    "q127_grouping_indicators",
    "q128_error_safe_math",
    # similarity-family canary: the r9 frontier additions put a
    # never-checked member (q368) into the similarity family, whose
    # members were otherwise all green but absent from this window —
    # the family-coverage invariant (test_driver_window_spans_all_
    # families) takes the last staleness slot (q130, r1) and q368
    # enters one round early; q130 leads the r10 staleness front.
    "q368_source_minhash_matrix",
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

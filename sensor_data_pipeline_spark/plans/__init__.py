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

# Driver-window ordering: the driver's CORRECTNESS check covers the
# FIRST 50 registered queries, so the first 50 must span every
# SURVEY.md §2 family and every LLM-pipeline operator — one or more
# representatives each — rather than whatever import order produced.
# Everything else follows in original registration order.
_DRIVER_WINDOW = [
    # ROUND-4 ROTATION (revised in-round, twice): 46/50 (92%) never
    # driver-checked in rounds 1-3. Eight stable never-checked slots
    # (q227/q230/q231/q249/q197, then q245/q247/q248 — all plain
    # integer-algebra shapes) were swapped for the eight riskiest
    # round-4 additions (q270/q271/q272/q275/q277, then q279 symmetric
    # decimal, q281 mapInArrow, q287 streaming band join) so the
    # newest code and newest PATTERNS get hard verification first —
    # fresh-for-fresh, cumulative coverage unchanged.
    # prioritizing the newest, least-verified work (q236-q260 curation/
    # streaming additions, q213-q222 layout/multimodal/iterative,
    # q196-q198/q205-q206-adjacent scale ops). The 4 previously-green
    # slots are canaries for code that CHANGED this round: q229
    # (degree-ordered wedge join), q233 (chunk-concat + refill clamp),
    # q235 (prefix-scan localCheckpoint pin), and q114 as the source-
    # family canary. Cumulative driver-verified target: >=171/252.
    # --- changed this round (previously checked — canaries) ---
    "q229_triangle_count",  # degree-ordered orientation landed r4
    "q233_stream_token_bucket",  # cross-chunk sort + refill clamp r4
    "q235_equidepth_histogram",  # prefix scan now localCheckpoint-pinned
    "q114_custom_source",  # source-family canary (r2 red -> r3 green)
    # --- changed this round (never checked) ---
    "q224_phrase_search",  # one-tokenization fix r4
    "q236_span_dedup_audit",  # one-tokenization fix r4
    "q225_lm_fluency_gate",
    # --- declared this round ---
    "q260_stream_tws_delta",  # transformWithStateInPandas w/ E3 fallback
    # --- never checked: newest curation/streaming (q237-q259) ---
    "q237_correlation_moments",
    "q238_ann_eval_metrics",
    "q242_sql_pipe_syntax",
    "q243_disorder_profile",  # time-family representative
    # (q240/q246 — posting-list and integer-algebra shapes whose
    # families are already driver-green — swapped for the two riskiest
    # remaining inference patterns, fresh-for-fresh)
    "q297_sorted_neighborhood_dedup",  # block-keyed lead windows, list ops
    "q298_holt_linear",  # JVM fold vs recursive-CTE oracle, raw doubles
    # --- declared this round: the riskiest inference-family patterns
    # (swapped in for q239/q241/q244/q250 — plain integer-algebra
    # shapes — fresh-for-fresh, same rationale as the earlier swaps) ---
    "q290_kaplan_meier",  # absorbing-zero ln/exp product, domain window
    "q291_fd_violation_audit",  # three-way union of two-level aggs
    "q293_grid_nn_join",  # 9-cell explode equi-join, min-struct argmin
    "q294_association_rules",  # Apriori broadcast prune + ppm ranking
    "q251_refpoint_pruned_search",
    "q252_incremental_topk",
    "q253_cdc_changelog_deletes",
    "q254_bitmap_distinct",
    "q255_peak_downsample",
    "q256_hysteresis_alarm",
    "q257_ks_distribution_drift",
    "q258_pit_feature_audit",
    "q259_stream_learned_fences",
    # --- never checked: quality gates / sampling (q227-q234) ---
    "q234_domain_quota_sample",
    # (q228 — integer-fence gate, quality family still covered by q225 —
    # swapped for the state-reader pattern, the round's riskiest API)
    "q303_stream_state_audit",  # statestore source reads checkpoint state
    # --- never checked: newest round-4 additions (q270-q277) ---
    "q270_hll_rollup",  # DataSketches HLL union-of-cell-sketches
    "q271_fuzzy_join_deletion_blocking",  # FastSS candidate completeness
    "q272_fifo_matching",  # cumulative-interval-overlap identity
    "q275_sliding_distinct_actors",  # interval set-difference expansion
    "q277_kmv_intersection",  # KMV union/intersection estimator
    "q279_revenue_bridge",  # symmetric DECIMAL(38,0)/HUGEINT products
    "q281_gram_matrix",  # mapInArrow numpy partials
    "q287_stream_nearest_match",  # two-sided-band stream-stream join
    # --- never checked: layout / multimodal / iterative (q213-q222) ---
    "q213_zorder_layout",
    "q214_bloom_semijoin",
    "q215_media_phash_neardup",
    "q216_pagerank_integer",
    "q217_kmeans_quantized",
    "q218_multimodal_manifest",
    "q219_video_scene_segments",
    "q220_retrieve_rerank",
    "q221_bpe_merge_learning",
    "q222_ts_subsequence_search",
    # --- never checked: scale ops / family representatives ---
    "q195_ewma_smoothing",  # window family
    "q212_wire_key_census",  # json family
    "q122_arrow_python_udf",  # udf family
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

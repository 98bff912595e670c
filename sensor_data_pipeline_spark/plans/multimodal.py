"""Declared queries for the multimodal binary-column operators.

The differential trick: the fake container's metadata is a pure
function of ``doc_id`` (operators/multimodal.py ``_meta_from_id``), so
the DuckDB oracle recomputes what the Spark side must recover by
actually round-tripping bytes through encode (pandas_udf -> binary
column) and decode (mapInPandas header parse). A value mismatch means
the binary plumbing — not the arithmetic — broke.

Oracle SQL mirrors _meta_from_id verbatim:
  kind        = ['image','audio','video'][doc_id % 3]
  width       = 64 + (doc_id % 64) * 4      (0 for audio)
  height      = 48 + (doc_id % 48) * 4      (0 for audio)
  sample_rate = 8000 + (doc_id % 5) * 4000  (0 unless audio)
  n_frames    = image: 1, video: 16 + doc_id % 240, audio: 0
  payload_len = 256 + (doc_id % 1024)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sensor_data_pipeline_spark.operators.multimodal import (
    audio_features,
    decode_media_meta,
    resize_plan,
    sample_frames,
    synthesize_media,
)
from sensor_data_pipeline_spark.plans.registry import register
from sensor_data_pipeline_spark.sources.tables import load_table

_DUCK_META = """
  SELECT doc_id,
         CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         CASE WHEN doc_id % 3 = 1 THEN 0 ELSE 64 + (doc_id % 64) * 4 END AS width,
         CASE WHEN doc_id % 3 = 1 THEN 0 ELSE 48 + (doc_id % 48) * 4 END AS height,
         CASE WHEN doc_id % 3 = 1 THEN 8000 + (doc_id % 5) * 4000 ELSE 0 END AS sample_rate,
         CASE doc_id % 3 WHEN 0 THEN 1 WHEN 2 THEN 16 + doc_id % 240 ELSE 0 END AS n_frames,
         256 + (doc_id % 1024) AS payload_len
  FROM documents
"""


def _media_decoded(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return decode_media_meta(synthesize_media(docs))


@register(
    "q51_media_decode_stats",
    category="multimodal",
    oracle=f"""
WITH meta AS ({_DUCK_META})
SELECT kind,
       CAST(count(*) AS BIGINT) AS n_media,
       CAST(sum(width) AS BIGINT) AS sum_width,
       CAST(sum(height) AS BIGINT) AS sum_height,
       CAST(sum(sample_rate) AS BIGINT) AS sum_sample_rate,
       CAST(sum(n_frames) AS BIGINT) AS sum_frames,
       CAST(sum(payload_len) AS BIGINT) AS sum_payload
FROM meta GROUP BY kind ORDER BY kind
""",
)
def q51_media_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode every document into the fake binary container, decode the
    headers back with mapInPandas, aggregate per kind. Checks the full
    binary round trip against header values the oracle derives
    arithmetically."""
    return (
        _media_decoded(spark, sf_dir)
        .groupBy("kind")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_media"),
            F.sum("width").cast("bigint").alias("sum_width"),
            F.sum("height").cast("bigint").alias("sum_height"),
            F.sum("sample_rate").cast("bigint").alias("sum_sample_rate"),
            F.sum("n_frames").cast("bigint").alias("sum_frames"),
            F.sum("payload_len").cast("bigint").alias("sum_payload"),
        )
        .orderBy("kind")
    )


@register(
    "q52_image_resize_plan",
    category="multimodal",
    oracle=f"""
WITH meta AS ({_DUCK_META}),
img AS (SELECT doc_id AS media_id, width, height FROM meta WHERE kind = 'image'),
scaled AS (
  SELECT media_id, width, height,
         least(CAST(1.0 AS DOUBLE), CAST(256.0 AS DOUBLE) / width, CAST(192.0 AS DOUBLE) / height) AS s
  FROM img
)
SELECT media_id, width, height,
       CAST(floor(width * s) AS INT) AS out_w,
       CAST(floor(height * s) AS INT) AS out_h,
       CAST(floor(width * s) AS BIGINT) * CAST(floor(height * s) AS BIGINT) * 3 AS out_rgb_bytes
FROM scaled ORDER BY media_id
""",
)
def q52_image_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fit-within-256x192 resize arithmetic over decoded image dims
    (the pixel stage is stubbed; dims/byte-budget math is the real
    scheduling input for a media pipeline)."""
    return resize_plan(_media_decoded(spark, sf_dir)).orderBy("media_id")


@register(
    "q53_video_frame_sample",
    category="multimodal",
    oracle=f"""
WITH meta AS ({_DUCK_META}),
vid AS (SELECT doc_id AS media_id, n_frames FROM meta WHERE kind = 'video')
SELECT media_id,
       CAST(count(*) AS BIGINT) AS frames_kept,
       CAST(max(frame_idx) AS INT) AS last_frame,
       max(frame_idx / CAST(25.0 AS DOUBLE)) AS last_ts_sec
FROM (SELECT media_id, n_frames, unnest(generate_series(0, n_frames - 1, 10)) AS frame_idx FROM vid)
GROUP BY media_id ORDER BY media_id
""",
)
def q53_video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every-10th-frame sampling over decoded video containers: explode
    the kept indices, per-video kept-count and last timestamp."""
    return (
        sample_frames(_media_decoded(spark, sf_dir), every_k=10)
        .groupBy("media_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("frames_kept"),
            F.max("frame_idx").cast("int").alias("last_frame"),
            F.max("frame_ts_sec").alias("last_ts_sec"),
        )
        .orderBy("media_id")
    )


@register(
    "q54_audio_features",
    category="multimodal",
    # The payload is the UTF-8 text cycled/truncated to the
    # deterministic length (operators/multimodal.py:_meta_from_id), and
    # the fixture text is pure ASCII — so byte values equal per-char
    # code points and the blob statistics are recomputable relationally:
    # total = full_cycles * sum(chars) + sum(first rem chars). Sums stay
    # integer until one final division/sqrt, so doubles are bit-exact
    # across engines (both are single correctly-rounded IEEE ops).
    oracle="""
WITH a AS (
  SELECT doc_id, text, length(text) AS L, 256 + doc_id % 1024 AS plen
  FROM documents WHERE doc_id % 3 = 1
),
chars AS (
  SELECT doc_id, plen, L, pos,
         ord(substr(text, CAST(pos AS INT), 1)) AS v,
         plen % L AS rem
  FROM a, unnest(range(1, L + 1)) AS t(pos)
),
s AS (
  SELECT doc_id,
         any_value(plen) AS plen,
         any_value(L) AS L,
         sum(v) AS sum_all, sum(v * v) AS sumsq_all,
         sum(CASE WHEN pos <= rem THEN v ELSE 0 END) AS sum_rem,
         sum(CASE WHEN pos <= rem THEN v * v ELSE 0 END) AS sumsq_rem
  FROM chars GROUP BY doc_id
)
SELECT doc_id AS media_id,
       CAST(plen AS BIGINT) AS n_bytes,
       ((plen // L) * sum_all + sum_rem) / CAST(plen AS DOUBLE) AS mean_byte,
       sqrt(((plen // L) * sumsq_all + sumsq_rem) / CAST(plen AS DOUBLE)) AS rms_byte
FROM s ORDER BY media_id
""",
)
def q54_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched per-clip byte statistics (mean/RMS) over audio
    payloads — the feature-extract stage shape for real waveforms. The
    oracle recomputes every byte statistic from the container's
    generative formula (cycled ASCII text), turning the former
    rows-only check into a full value-hash audit of encode + decode +
    feature extraction end-to-end."""
    docs = load_table(spark, "documents", sf_dir)
    return audio_features(synthesize_media(docs)).orderBy("media_id")

"""Multimodal (image/audio/video) columns as opaque binary + typed
metadata (north-star: training-data pipeline).

Media travels as a ``binary`` content column plus a typed header; all
per-byte work happens in Arrow-batched ``mapInPandas``/``pandas_udf``
stages so a 100 TB media table streams through executors batch-by-batch
(never one driver-side blob), and the binary column itself is never
shuffled except by explicit repartition — downstream metadata
operators select only the decoded columns, so Parquet column pruning
keeps the blobs on disk when the query doesn't need them.

The container format here is a deterministic fake (magic + big-endian
header + padded payload) because no image/audio codec libraries exist
in this environment. The *plumbing* — binary schema, Arrow batch
shape, UDF signatures, partitioning — is real and differentially
tested: the decoder must recover exactly the values the encoder packed,
and the DuckDB oracle recomputes those values from doc_id arithmetic.
Real decoders (PIL/librosa/ffmpeg) drop into ``decode_media_real``,
which raises ``NotImplementedError`` until the libraries are present.

Reference basis: the engine treats media exactly like the reference
treats sensor registers — opaque bytes decoded by a fixed header
layout (two's-complement register decode,
reference src/modules/module_rpi_ups_hat.c:130-180); the 16-byte
header is the media analog of the INA219 register block.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

#: magic tags, 4 bytes each
MAGIC = {"image": b"IMG0", "audio": b"AUD0", "video": b"VID0"}
_KINDS = ("image", "audio", "video")
_HEADER_FMT = ">IIII"  # width, height, sample_rate, n_frames (big-endian)
_HEADER_LEN = 4 + struct.calcsize(_HEADER_FMT)
VIDEO_FPS = 25.0

DECODED_META = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("payload_len", T.LongType()),
    ]
)

AUDIO_FEATURES = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("mean_byte", T.DoubleType()),
        T.StructField("rms_byte", T.DoubleType()),
    ]
)


# ---------------------------------------------------------------------------
# deterministic synthesis (doc -> media row)
# ---------------------------------------------------------------------------

def _meta_from_id(doc_id: int) -> tuple[str, int, int, int, int, int]:
    """The single source of truth for the fake metadata — mirrored
    verbatim in the DuckDB oracles (plans/multimodal.py)."""
    kind = _KINDS[doc_id % 3]
    width = 64 + (doc_id % 64) * 4 if kind != "audio" else 0
    height = 48 + (doc_id % 48) * 4 if kind != "audio" else 0
    sample_rate = 8000 + (doc_id % 5) * 4000 if kind == "audio" else 0
    n_frames = 1 if kind == "image" else (16 + doc_id % 240 if kind == "video" else 0)
    payload_len = 256 + (doc_id % 1024)
    return kind, width, height, sample_rate, n_frames, payload_len


@pandas_udf(T.BinaryType())
def fake_media_encode(doc_id: pd.Series, text: pd.Series) -> pd.Series:
    """Build the fake container: magic + packed header + text payload
    cycled/zero-padded to the deterministic payload length. Arrow hands
    this UDF columnar batches; the loop is per-row because each output
    is a distinct bytes object (binary construction is not
    vectorizable), but stays inside one Arrow batch round trip."""
    out = []
    for i, t in zip(doc_id.astype("int64"), text):
        kind, w, h, sr, nf, plen = _meta_from_id(int(i))
        raw = (t or "").encode("utf-8")
        if len(raw) >= plen:
            payload = raw[:plen]
        else:
            reps = plen // max(len(raw), 1) + 1 if raw else 0
            payload = (raw * reps)[:plen] if raw else b"\x00" * plen
        out.append(MAGIC[kind] + struct.pack(_HEADER_FMT, w, h, sr, nf) + payload)
    return pd.Series(out)


def synthesize_media(documents: DataFrame) -> DataFrame:
    """documents -> (media_id, kind, content binary). The kind column
    is carried alongside the blob as the typed metadata the scan can
    filter on WITHOUT decoding (partition/predicate pruning at scale);
    everything else lives inside the binary."""
    kind = F.element_at(F.array(*[F.lit(k) for k in _KINDS]), (F.col("doc_id") % 3 + 1).cast("int"))
    return documents.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        fake_media_encode(F.col("doc_id"), F.col("text")).alias("content"),
    )


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------

def decode_media_meta(media: DataFrame) -> DataFrame:
    """Parse each blob's header back into typed columns via
    ``mapInPandas``: batch in, batch out, no driver involvement.
    Rows whose magic doesn't match any known kind are DROPPED (the
    malformed-payload reject path E2, consumer.cpp:116-122)."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        magic_to_kind = {v: k for k, v in MAGIC.items()}
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf["media_id"].astype("int64"), pdf["content"]):
                b = bytes(blob)
                kind = magic_to_kind.get(b[:4])
                if kind is None or len(b) < _HEADER_LEN:
                    continue
                w, h, sr, nf = struct.unpack(_HEADER_FMT, b[4:_HEADER_LEN])
                rows.append((int(mid), kind, w, h, sr, nf, len(b) - _HEADER_LEN))
            yield pd.DataFrame(rows, columns=[f.name for f in DECODED_META.fields])

    return media.select("media_id", "content").mapInPandas(_decode, DECODED_META)


def decode_media_real(media: DataFrame) -> DataFrame:
    """Real-codec decode path. Requires PIL/librosa/av, none of which
    are in this container — the wiring is identical to
    :func:`decode_media_meta` (mapInPandas, same output schema)."""
    try:
        import PIL  # type: ignore[import-not-found]  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "real media decoding needs PIL/librosa/av; use decode_media_meta "
            "(deterministic fake container) in this environment"
        ) from e
    raise NotImplementedError("real decoder wiring lands when codec libs are available")


# ---------------------------------------------------------------------------
# derived operators (compose on the decoded metadata)
# ---------------------------------------------------------------------------

def resize_plan(decoded: DataFrame, max_w: int = 256, max_h: int = 192) -> DataFrame:
    """Fit-within-box resize arithmetic on decoded dims — pure Catalyst
    (the pixel work itself would ride mapInPandas next to the decoder).
    Scale factor and floors are double-precision and bit-identical in
    the DuckDB oracle."""
    scale = F.least(F.lit(1.0), F.lit(float(max_w)) / F.col("width"), F.lit(float(max_h)) / F.col("height"))
    out_w = F.floor(F.col("width") * scale).cast("int")
    out_h = F.floor(F.col("height") * scale).cast("int")
    return (
        decoded.filter(F.col("kind") == "image")
        .select(
            "media_id",
            "width",
            "height",
            out_w.alias("out_w"),
            out_h.alias("out_h"),
            (out_w.cast("bigint") * out_h.cast("bigint") * 3).alias("out_rgb_bytes"),
        )
    )


def sample_frames(decoded: DataFrame, every_k: int = 10) -> DataFrame:
    """Frame sampling for videos: one output row per kept frame index
    (0, k, 2k, ...), with its timestamp at the container frame rate.
    Explode of a generated sequence — fan-out happens executor-side,
    proportional to frames kept, never materializing unsampled frames."""
    idx = F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_k))).alias("frame_idx")
    return (
        decoded.filter(F.col("kind") == "video")
        .select("media_id", "n_frames", idx)
        .withColumn("frame_ts_sec", F.col("frame_idx") / F.lit(VIDEO_FPS))
    )


def audio_features(media: DataFrame) -> DataFrame:
    """Per-clip byte statistics over the payload (the feature-extract
    stage a real pipeline would run per decoded waveform): numpy over
    the Arrow batch, one pass per blob."""

    def _features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf["media_id"].astype("int64"), pdf["content"]):
                b = bytes(blob)
                if b[:4] != MAGIC["audio"]:
                    continue
                payload = np.frombuffer(b, dtype=np.uint8, offset=_HEADER_LEN).astype(np.float64)
                rows.append(
                    (
                        int(mid),
                        len(payload),
                        float(payload.mean()) if len(payload) else 0.0,
                        float(np.sqrt((payload**2).mean())) if len(payload) else 0.0,
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in AUDIO_FEATURES.fields])

    return media.select("media_id", "content").mapInPandas(_features, AUDIO_FEATURES)


PHASH_BLOCKS = 48  # 48-bit signature: 4 bands x 12 bits, top bit never set
PHASH_BANDS = 4
_PHASH_BAND_BITS = PHASH_BLOCKS // PHASH_BANDS

PHASH_SCHEMA = T.StructType(
    [T.StructField("media_id", T.LongType())]
    + [T.StructField(f"band{i}", T.LongType()) for i in range(PHASH_BANDS)]
)


def phash_signature(media: DataFrame) -> DataFrame:
    """Perceptual-hash-style signature over image payload bytes.

    The payload is split into ``PHASH_BLOCKS`` contiguous blocks
    (byte p -> block p*BLOCKS // payload_len); block bit = 1 iff the
    block's byte sum exceeds the payload mean (integer-exact compare:
    sum*BLOCKS > total). The 48-bit signature is emitted as 4 x 12-bit
    band integers — the LSH-banding representation — so the full
    signature is never materialized and band joins need no bit
    slicing. With a real image codec this becomes mean-threshold aHash
    over an 8x8 downsample; the banding/verify plumbing is identical.

    Scale: one Arrow pass per blob (mapInPandas), signatures are 4
    ints/image — the blob column never reaches a shuffle.
    """

    def _sig(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf["media_id"].astype("int64"), pdf["content"]):
                b = bytes(blob)
                if b[:4] != MAGIC["image"]:
                    continue
                payload = np.frombuffer(b, dtype=np.uint8, offset=_HEADER_LEN).astype(np.int64)
                plen = len(payload)
                blocks = np.arange(plen, dtype=np.int64) * PHASH_BLOCKS // plen
                bsum = np.bincount(blocks, weights=payload, minlength=PHASH_BLOCKS).astype(np.int64)
                bits = (bsum * PHASH_BLOCKS > int(payload.sum())).astype(np.int64)
                bands = [
                    int((bits[i * _PHASH_BAND_BITS : (i + 1) * _PHASH_BAND_BITS] << np.arange(_PHASH_BAND_BITS)).sum())
                    for i in range(PHASH_BANDS)
                ]
                rows.append((int(mid), *bands))
            yield pd.DataFrame(rows, columns=[f.name for f in PHASH_SCHEMA.fields])

    return media.select("media_id", "content").mapInPandas(_sig, PHASH_SCHEMA)


FRAME_SIG_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("fsum", T.LongType()),
        T.StructField("total", T.LongType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)


def frame_signatures(media: DataFrame) -> DataFrame:
    """Per-frame byte-sum signatures for videos: byte p belongs to
    frame p*n_frames // payload_len, its frame's signature is the
    block byte sum (the same deterministic stand-in for a decoded
    frame statistic that phash uses for images). One Arrow pass per
    blob; the output is n_frames small integer rows per video, so
    everything downstream (scene-cut windows, segment islands) runs
    JVM-side on signature-sized data — the blob never leaves the scan.
    """

    def _sig(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {f.name: [] for f in FRAME_SIG_SCHEMA.fields}
            for mid, blob in zip(pdf["media_id"].astype("int64"), pdf["content"]):
                b = bytes(blob)
                if b[:4] != MAGIC["video"]:
                    continue
                nf = struct.unpack(_HEADER_FMT, b[4:_HEADER_LEN])[3]
                payload = np.frombuffer(b, dtype=np.uint8, offset=_HEADER_LEN).astype(np.int64)
                plen = len(payload)
                frames = np.arange(plen, dtype=np.int64) * nf // plen
                fsum = np.bincount(frames, weights=payload, minlength=nf).astype(np.int64)
                total = int(payload.sum())
                out["media_id"].extend([int(mid)] * nf)
                out["frame_idx"].extend(range(nf))
                out["fsum"].extend(int(x) for x in fsum)
                out["total"].extend([total] * nf)
                out["n_frames"].extend([nf] * nf)
            yield pd.DataFrame(out)

    return media.select("media_id", "content").mapInPandas(_sig, FRAME_SIG_SCHEMA)

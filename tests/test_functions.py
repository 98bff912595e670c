"""Unit tests for the scalar/text/vector/time column-function library
on small literal DataFrames — fast invariants independent of the
DuckDB oracle."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from sensor_data_pipeline_spark.functions.scalar import (
    clamp,
    linear_derive,
    pack_bytes,
    rescale,
    round_fixed,
    sentinel_default,
    shift_scale,
    twos_complement,
)
from sensor_data_pipeline_spark.functions.text import (
    doc_fingerprint,
    quality_score,
    token_count,
    word_shingles,
    tokenize,
)
from sensor_data_pipeline_spark.functions.timefn import iso8601_format, iso8601_parse
from sensor_data_pipeline_spark.functions.vector import cosine, cosine_arrow, sign_lsh_bucket


def test_scalar_transforms(spark):
    df = spark.createDataFrame([(215, 0x8001, 0x12, 0x34)], "deci int, reg int, hi int, lo int")
    row = df.select(
        rescale(F.col("deci"), 0.1).alias("celsius"),
        twos_complement(F.col("reg")).alias("signed"),
        pack_bytes(F.col("hi"), F.col("lo")).alias("packed"),
        shift_scale(F.col("reg"), 3, 0.004).alias("busv"),
        clamp(F.lit(123.0), 0, 100).alias("hi_clamp"),
        clamp(F.lit(-5.0), 0, 100).alias("lo_clamp"),
        linear_derive(F.lit(7.2), 6.0, 2.4).alias("pct"),
        sentinel_default(F.lit(None).cast("double"), 888.8).alias("sent"),
        round_fixed(F.lit(1.26), 1).alias("rounded"),
    ).first()
    assert abs(row.celsius - 21.5) < 1e-9
    # the reference's exact arithmetic: x - 0xFFFF when x > 0x8000
    assert row.signed == 0x8001 - 0xFFFF
    assert row.packed == (0x12 << 8) | 0x34
    assert abs(row.busv - (0x8001 >> 3) * 0.004) < 1e-9
    assert row.hi_clamp == 100.0 and row.lo_clamp == 0.0
    assert abs(row.pct - 50.0) < 1e-9
    assert row.sent == 888.8
    assert row.rounded == 1.3


def test_twos_complement_boundary(spark):
    # exactly 0x8000 is NOT wrapped (reference uses strict >)
    df = spark.range(1).select(
        twos_complement(F.lit(0x8000)).alias("at"),
        twos_complement(F.lit(0x7FFF)).alias("below"),
        twos_complement(F.lit(0xFFFF)).alias("top"),
    )
    row = df.first()
    assert row.at == 0x8000
    assert row.below == 0x7FFF
    assert row.top == 0


def test_iso8601_roundtrip(spark):
    df = spark.createDataFrame([("2024-12-23 10:30:00",)], "s string").select(
        F.to_timestamp("s").alias("ts")
    )
    out = df.select(iso8601_parse(iso8601_format(F.col("ts"))).alias("back"), "ts").first()
    assert out.back == out.ts


def test_iso8601_parse_rejects_malformed(spark):
    out = spark.createDataFrame([("not-a-time",)], "s string").select(
        iso8601_parse(F.col("s")).alias("ts")
    ).first()
    assert out.ts is None


def test_text_functions(spark):
    df = spark.createDataFrame([("the quick brown fox jumps",)], "text string")
    row = df.select(
        token_count(F.col("text")).alias("n"),
        word_shingles(tokenize(F.col("text")), 3).alias("sh"),
        doc_fingerprint(F.col("text")).alias("fp"),
        quality_score(F.col("text")).alias("q"),
    ).first()
    assert row.n == 5
    assert row.sh == ["the quick brown", "quick brown fox", "brown fox jumps"]
    assert len(row.fp) == 32
    assert 0.0 <= row.q <= 1.0


def test_fingerprint_normalizes_whitespace_and_case(spark):
    df = spark.createDataFrame([("Hello  World", "hello world")], "a string, b string")
    row = df.select(
        doc_fingerprint(F.col("a")).alias("fa"), doc_fingerprint(F.col("b")).alias("fb")
    ).first()
    assert row.fa == row.fb


def test_cosine_paths_agree(spark):
    a, b = [1.0, 2.0, 3.0, 4.0], [4.0, 3.0, 2.0, 1.0]
    df = spark.createDataFrame([(a, b)], "a array<float>, b array<float>")
    row = df.select(
        cosine(F.col("a"), F.col("b")).alias("hof"),
        cosine_arrow(F.col("a"), F.col("b")).alias("arrow"),
    ).first()
    expected = sum(x * y for x, y in zip(a, b)) / (
        math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
    )
    assert row.hof == row.arrow  # bit-identical by construction
    assert abs(row.hof - expected) < 1e-12


def test_sign_lsh_bucket(spark):
    df = spark.createDataFrame(
        [([1.0, -1.0, 1.0, -1.0, 1.0, -1.0, 1.0, -1.0],)], "v array<float>"
    )
    row = df.select(sign_lsh_bucket(F.col("v"), 8).alias("b")).first()
    assert row.b == 0b01010101


def test_int_div_full_bigint_range_matches_duckdb(spark):
    """int_div must equal DuckDB's integer `//` (truncation — measured
    on 1.0.0, the r5 ADVICE premise that it floors was wrong) AND
    Spark's own DIV, on the full int64 range including both extremes
    and values past 2^53 where a double round-trip goes inexact."""
    import duckdb

    from sensor_data_pipeline_spark.functions.scalar import int_div

    vals = [
        -(2**63), -(2**63) + 1, -(2**53) - 1, -1234567890123456789,
        -11, -10, -9, -1, 0, 1, 9, 10, 11,
        2**53 + 1, 1234567890123456789, 2**63 - 1,
    ]
    df = spark.createDataFrame([(v,) for v in vals], "k long")
    got = {
        r["k"]: (r["fd"], r["dv"])
        for r in df.select(
            "k", int_div(F.col("k"), 10).alias("fd"), F.expr("k DIV 10").alias("dv")
        ).collect()
    }
    for v in vals:
        exp = duckdb.sql(f"SELECT CAST({v} AS BIGINT) // 10").fetchone()[0]
        assert got[v] == (exp, exp), (v, got[v], exp)

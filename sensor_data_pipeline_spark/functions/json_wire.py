"""JSON wire serde (SURVEY.md §1.1, §2.7 E2).

The reference's wire format is a flat JSON object per message
(serialize src/modules/dd/producer.c:136-141; parse
src/modules/dd/consumer.cpp:115-123). Parse failures are logged and
dropped without killing the stream (consumer.cpp:116-122); missing
keys default to 888.8 (consumer.cpp:124-131).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def to_wire_json(*cols: Column) -> Column:
    """Serialize columns to the wire JSON string (K1 payload shape)."""
    return F.to_json(F.struct(*cols))


def parse_wire(payload: Column, schema: T.StructType) -> Column:
    """Parse a wire payload permissively: malformed JSON -> null struct,
    missing keys -> null fields (caller applies sentinel defaults)."""
    return F.from_json(payload, schema, {"mode": "PERMISSIVE"})


def route_corrupt(df: DataFrame, payload_col: str, schema: T.StructType) -> tuple[DataFrame, DataFrame]:
    """Split a message stream into (parsed, corrupt) — the engine form of
    the consumer's parse-reject path (E2, consumer.cpp:116-122) and the
    loop's recoverable-error contract (E1, src/event_loops.c:43-49):
    bad rows are diverted, the stream stays alive.

    Uses ``columnNameOfCorruptRecord`` (from_json in PERMISSIVE mode
    yields an all-null struct for malformed input, so a plain null check
    cannot distinguish corrupt from all-keys-missing).
    """
    with_corrupt = T.StructType(list(schema.fields) + [T.StructField("_corrupt", T.StringType())])
    parsed = df.withColumn(
        "_rec",
        F.from_json(F.col(payload_col), with_corrupt, {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"}),
    )
    good = parsed.filter(F.col("_rec._corrupt").isNull()).select("*", "_rec.*").drop("_rec", "_corrupt")
    bad = parsed.filter(F.col("_rec._corrupt").isNotNull()).drop("_rec")
    return good, bad

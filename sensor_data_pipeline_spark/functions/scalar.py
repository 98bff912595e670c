"""Scalar transform library (SURVEY.md §2.2, operators P1-P9, P13).

Every function here is ``Column -> Column`` built from
``pyspark.sql.functions`` only — JVM-side, whole-stage-codegen
eligible, zero Python in the executor hot path. These are the engine
forms of the reference's per-tick C arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def rescale(col: Column, factor: float) -> Column:
    """Unit rescale, e.g. deci-°C -> °C is ``rescale(c, 0.1)``
    (reference src/modules/dd/producer.c:260, src/modules/ch/ch.c:204).
    Also covers the P1 arithmetic map (×2, src/modules/sample/sample.c:22-28)
    and P5 register scale constants (module_rpi_ups_hat.c:140-178).
    """
    return col * F.lit(factor)


def linear_derive(col: Column, offset: float, span: float, scale: float = 100.0) -> Column:
    """Linear map ``(x - offset) / span * scale`` — the battery-percentage
    derivation ``(bus_v - 6) / 2.4 * 100``
    (reference src/modules/module_rpi_ups_hat.c:252)."""
    return (col - F.lit(offset)) / F.lit(span) * F.lit(scale)


def clamp(col: Column, lo: float, hi: float) -> Column:
    """Clamp to [lo, hi] (reference src/modules/module_rpi_ups_hat.c:260-262
    clamps battery % to [0, 100])."""
    return F.least(F.lit(hi), F.greatest(F.lit(lo), col))


def twos_complement(col: Column, bits: int = 16) -> Column:
    """Two's-complement decode of an unsigned register read.

    The reference decodes INA219 registers with
    ``if (x > 0x8000) x -= 0xFFFF``
    (src/modules/module_rpi_ups_hat.c:137-139,160-162,175-177); we
    reproduce that exact arithmetic (including its off-by-one-from-
    textbook constant) so outputs match the device semantics.
    """
    threshold = 1 << (bits - 1)
    wrap = (1 << bits) - 1
    return F.when(col > F.lit(threshold), col - F.lit(wrap)).otherwise(col)


def pack_bytes(hi: Column, lo: Column) -> Column:
    """Byte packing ``(hi << 8) | lo``
    (reference src/modules/module_rpi_ups_hat.c:97)."""
    return F.shiftleft(hi, 8).bitwiseOR(lo)


def shift_scale(col: Column, shift: int, factor: float) -> Column:
    """Register decode ``(x >> shift) * factor`` — bus voltage is
    ``(reg >> 3) * 0.004`` (reference src/modules/module_rpi_ups_hat.c:150)."""
    return F.shiftright(col, shift) * F.lit(factor)


def int_div(col: Column, divisor: int) -> Column:
    """Exact integer division, truncating toward zero, over the FULL
    bigint range — the semantics BOTH engines natively share: Spark's
    ``DIV`` truncates, and (measured, DuckDB 1.0.0) DuckDB's integer
    ``//`` ALSO truncates (``-11 // 10 = -1``; its float ``//`` is
    plain division, not floor). The round-5 ADVICE asserted DuckDB
    floors and the round-6 ADVICE built a floor-matching formula on
    top — both premises were wrong, and the ``floor(a / b)`` form they
    produced diverges from the oracle on any negative dividend AND
    routes through a double (inexact past 2^53). Here the remainder
    (``%``, dividend-signed on both engines) strips in int64 — safe:
    subtracting a same-signed remainder always moves toward zero, so
    no wrap at either int64 extreme — and the decimal(38,0) division
    runs over an exact multiple of the divisor, so no rounding ever
    occurs."""
    if divisor <= 0:
        raise ValueError("int_div requires a positive divisor")
    c = col.cast("bigint")
    r = c % F.lit(divisor)
    return ((c.cast("decimal(38,0)") - r) / F.lit(divisor)).cast("bigint")


def sentinel_default(col: Column, sentinel: float) -> Column:
    """Default-on-missing: null -> sentinel (the consumer substitutes
    888.8 for absent JSON keys, reference src/modules/dd/consumer.cpp:124-131;
    ch substitutes 999 on sensor failure, src/modules/ch/ch.c:197)."""
    return F.coalesce(col, F.lit(sentinel))


def round_fixed(col: Column, digits: int = 1) -> Column:
    """Numeric rounding for payloads/displays (``%.1f`` formatting,
    reference src/modules/dd/producer.c:136-141)."""
    return F.round(col, digits)

"""Engine-exact fixed-point logarithm (r12 ADVICE item 1).

``floor(-ln(c/N)·1e6)`` computed through libm couples the oracle hash
to double-precision bit-parity between DuckDB's libm and the JVM's
``Math.log`` (specified only to 1 ulp) — a 1-ulp divergence at a floor
boundary flips downstream ntile membership. The _PGRAM_TRIG lesson
(r11: Python-computed integer trig tables) applies, but here the
argument grid (token count c vs corpus total N) is data-dependent, so
literals can't be shipped; instead the log itself becomes INTEGER
arithmetic, identical in both engines:

    ln(N/c)·1e6  ≈  ((I·2¹⁶ + f) · 693147) >> 16

* ``I = floor(log2(N/c))`` — a 63-branch integer CASE ladder
  (``N >= c·2^k``, 128-bit compares).
* ``f`` — 16 fractional bits of log2 by the classical square-and-
  compare iteration on a 30-bit fixed-point mantissa
  ``m ∈ [2³⁰, 2³¹)``: each round ``t = (m·m) >> 30``; if ``t ≥ 2³¹``
  emit 1 and halve, else emit 0. Every intermediate fits a signed
  64-bit integer (m² < 2⁶²) except the initial mantissa division,
  which runs in DECIMAL(38,0)/HUGEINT.
* 693147 = floor(ln 2 · 1e6).

Deterministic by construction (integer ops only), monotone
non-decreasing in N/c, and within ~2⁻¹⁶ log2-units (≈11 micro-nats)
of the true ln — a surrogate, not a libm emulation, and documented as
such at every call site.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

LN2_MICRO = 693147  # floor(ln 2 * 1e6)
_FRAC_BITS = 16
_MANT = 1 << 30  # 30-bit mantissa scale
_TWO31 = 1 << 31


def ln_ratio_micro_py(num: int, den: int) -> int:
    """Pure-Python reference of the shared algorithm (num >= den >= 1)."""
    assert num >= den >= 1
    lg = 0
    while (den << (lg + 1)) <= num:
        lg += 1
    m = (num << 30) // (den << lg)
    fr = 0
    for _ in range(_FRAC_BITS):
        t = (m * m) >> 30
        if t >= _TWO31:
            fr = fr * 2 + 1
            m = t >> 1
        else:
            fr = fr * 2
            m = t
    return ((lg << _FRAC_BITS) + fr) * LN2_MICRO >> _FRAC_BITS


def _ladder_sql(num: str, den: str, big: str) -> str:
    """floor(log2(num/den)) as a descending integer CASE ladder."""
    whens = " ".join(
        f"WHEN CAST({num} AS {big}) >= CAST({den} AS {big}) * {1 << k}"
        f" THEN {k}"
        for k in range(62, 0, -1)
    )
    return f"(CASE {whens} ELSE 0 END)"


def ln_ratio_micro_ctes(
    prefix: str, src: str, num: str, den: str, keep: str
) -> str:
    """DuckDB CTE chain computing ``ln_micro = ln({num}/{den})·1e6``
    per row of ``{src}`` (which must provide columns {num}, {den} and
    the pass-through columns in ``keep``). Emits CTEs ``{prefix}0`` ..
    ``{prefix}{_FRAC_BITS+1}``; the last one carries ``keep`` plus
    ``ln_micro``. Integer arithmetic only — bit-identical to the Spark
    twin :func:`ln_ratio_micro_col`.

    Precondition: ``num >= den >= 1`` per row. Violations fail LOUDLY
    (``error()`` folded into the ladder, mirroring the Spark twin's
    ``assert_true``) instead of returning a silently wrong ln_micro
    with lg = 0 and a sub-range mantissa (r13 ADVICE item 2)."""
    ladder = (
        f"CASE WHEN CAST({num} AS HUGEINT) >= CAST({den} AS HUGEINT)"
        f" AND CAST({den} AS HUGEINT) >= 1"
        f" THEN {_ladder_sql(num, den, 'HUGEINT')}"
        " ELSE CAST(error('ln_ratio_micro requires num >= den >= 1')"
        " AS INT) END"
    )
    parts = [
        f"""{prefix}0 AS (
  SELECT {keep}, lg, CAST(0 AS BIGINT) AS fr,
    CAST((CAST({num} AS HUGEINT) * {_MANT})
      // (CAST({den} AS HUGEINT) * (CAST(1 AS BIGINT) << lg))
      AS BIGINT) AS m
  FROM (SELECT {keep}, {num}, {den}, {ladder} AS lg FROM {src})
)"""
    ]
    for k in range(1, _FRAC_BITS + 1):
        parts.append(
            f"""{prefix}{k} AS (
  SELECT {keep}, lg,
    fr * 2 + (CASE WHEN t >= {_TWO31} THEN 1 ELSE 0 END) AS fr,
    CASE WHEN t >= {_TWO31} THEN t // 2 ELSE t END AS m
  FROM (SELECT {keep}, lg, fr, (m * m) // {_MANT} AS t
        FROM {prefix}{k - 1})
)"""
        )
    parts.append(
        f"""{prefix}{_FRAC_BITS + 1} AS (
  SELECT {keep},
    CAST(((lg * {1 << _FRAC_BITS} + fr) * {LN2_MICRO})
      // {1 << _FRAC_BITS} AS BIGINT) AS ln_micro
  FROM {prefix}{_FRAC_BITS}
)"""
    )
    return ",\n".join(parts)


def ln_ratio_micro_col(df: DataFrame, num: str, den: str) -> DataFrame:
    """Spark twin of :func:`ln_ratio_micro_ctes`: appends ``ln_micro``
    to ``df`` via the identical integer recurrence (a withColumn
    chain; every step is whole-stage-codegen BIGINT arithmetic).

    Precondition: ``num >= den >= 1`` per row. Violations fail LOUDLY
    (``assert_true`` folded into the ladder so column pruning cannot
    drop it) instead of returning a silently wrong ln_micro (r13
    ADVICE item 2)."""
    ladder = (
        "CASE WHEN assert_true("
        f"CAST({num} AS DECIMAL(38,0)) >= CAST({den} AS DECIMAL(38,0))"
        f" AND CAST({den} AS DECIMAL(38,0)) >= 1,"
        " 'ln_ratio_micro requires num >= den >= 1') IS NULL"
        f" THEN {_ladder_sql(num, den, 'DECIMAL(38,0)')} END"
    )
    out = df.withColumn("__lg", F.expr(ladder)).withColumn(
        "__m",
        F.expr(
            f"CAST(CAST({num} AS DECIMAL(38,0)) * {_MANT} DIV"
            f" (CAST({den} AS DECIMAL(38,0))"
            f" * shiftleft(CAST(1 AS BIGINT), CAST(__lg AS INT)))"
            " AS BIGINT)"
        ),
    ).withColumn("__fr", F.lit(0).cast("bigint"))
    for _ in range(_FRAC_BITS):
        out = (
            out.withColumn("__t", F.expr(f"(__m * __m) DIV {_MANT}"))
            .withColumn(
                "__fr",
                F.expr(
                    f"__fr * 2 + (CASE WHEN __t >= {_TWO31}"
                    " THEN 1 ELSE 0 END)"
                ),
            )
            .withColumn(
                "__m",
                F.expr(
                    f"CASE WHEN __t >= {_TWO31} THEN __t DIV 2"
                    " ELSE __t END"
                ),
            )
            .drop("__t")
        )
    return out.withColumn(
        "ln_micro",
        F.expr(
            f"CAST(((__lg * {1 << _FRAC_BITS} + __fr) * {LN2_MICRO})"
            f" DIV {1 << _FRAC_BITS} AS BIGINT)"
        ),
    ).drop("__lg", "__m", "__fr")

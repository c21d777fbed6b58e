"""Ordination (PCoA) — the reference's sample-comparison plot.

The reference's comparison page (public path ``bpaotu/otu/views.py``
comparison endpoints + the frontend MDS plot) ordinates the filtered
sample set from its pairwise dissimilarity matrix. Re-expressed
Spark-first:

1. the Bray-Curtis dissimilarities come from the same pipeline as
   ``beta_diversity_braycurtis``, kept in exact integer ppm
   (block-free within a *filtered, bounded* sample selection —
   ordination is a plot of a user-selected cohort, not of all
   samples; the selection carries an absolute id cap so the cohort —
   and with it the |cohort|² matrix — is bounded at EVERY scale
   factor, like a portal user's picked study);
2. classical PCoA double-centers the squared dissimilarity matrix
   (Gower: B = -1/2 · J D² J). We iterate on the INTEGER operator
   B' = 2n²·B = -(n²·d2 − n·rs_i − n·rs_j + gs) — same eigenvectors,
   scaled eigenvalues — built from exact integer row/grand sums;
3. the first TWO principal coordinates come from **distributed
   fixed-point power iteration** (r7 VERDICT item 7, promoted from
   rows-only): the iterate lives in ppm integers; each round is one
   broadcast join + keyed sum with every multiply-accumulate in
   DECIMAL(38,0) (Spark) / HUGEINT (DuckDB), then a sign-split
   truncating rescale v ← sign(u)·(|u|·10⁶ div max|u|). Every round
   is therefore EXACT integer arithmetic — the two engines compute
   bit-identical sequences, which is what makes a value-hash oracle
   possible for an iterative eigensolver (the r6 blocker was float
   renormalization: Σ-order nondeterminism + ulp drift across 30
   MAC rounds; integers have neither). Axis 2 iterates on the
   integer-deflated operator B₂ = den₁·B' − num₁·v₁ᵐv₁ᵐᵀ (v₁ᵐ =
   milli-truncated v₁; Rayleigh num/den are exact integers), scaled
   back into headroom by one data-dependent integer divisor.
   Floats appear ONLY in the final per-sample score expression
   (sqrt of exact-integer ratios — correctly-rounded IEEE in both
   engines), micro-floored to BIGINT for the hash contract.

Start vectors are md5-derived integers (the train_test_split
hash_bucket idiom) — engine-identical, and generically non-degenerate
(the all-ones vector lies in B's null space; a hash does not).

Scale: the matrix is |cohort|² entries in long form, partitioned by
row — each product is one broadcast join + one groupBy shuffle;
vectors are broadcast-sized by construction. This is the standard
shape for distributed spectral methods (PageRank-style iteration),
with per-segment localCheckpoint to cut the join-loop lineage.

Overflow discipline: all bounds are documented per step below; the
Spark side folds a loud assert_true over the Rayleigh scalars (NULL
under non-ANSI decimal overflow) while DuckDB HUGEINT errors loudly
on its own — no silent wrap in either engine.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from bpaotu_spark.catalog import load_table, maybe_broadcast
from bpaotu_spark.operators.bpaotu import ABUNDANCE_CTE
from bpaotu_spark.operators.pipeline import hash_bucket, hash_bucket_sql
from bpaotu_spark.plans.filters import ContextualFilter, Pred
from bpaotu_spark.registry import register

# The absolute c_custkey cap bounds the cohort (and the |cohort|²
# matrix) at every SF — at sf0.001/sf0.01 it keeps the historical
# cohort bit-identical (max custkey 150/1500 < 2000); past that the
# plot cohort stays ~400 samples, the size a comparison page renders.
_PCOA_FILTER = ContextualFilter.of(
    [Pred("c_mktsegment", "eq", "MACHINERY"), Pred("c_custkey", "lt", 2000)],
    "and",
)

# Convergence is geometric at (λ_next/λ_target)^k; the synthetic
# cohorts show ratios ≈ 0.93, so ~100 products reach the pytest's
# 5e-3 bar. The per-round ppm truncation adds ≤1e-6 relative noise —
# self-corrected by the iteration itself.
_POWER_ITERS = 100
# axis-2 operator is divided back into ≤1e18 so each MAC stays inside
# DECIMAL(38,0): n·1e18·1e6 ≤ 1e38 up to n ~ 3e6 cohort rows
_B2_TARGET = 10**18


def _bc_pairs_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric (i, j, dp) Bray-Curtis ppm matrix of the plot cohort,
    served through the distance store (r12 VERDICT item 1): built once
    per data fingerprint by :func:`_bc_pairs_build`, read thereafter —
    the comparison page computes the matrix at submit time, the plot
    only reads it."""
    from bpaotu_spark.operators.diststore import pcoa_pairs_cached

    return pcoa_pairs_cached(spark, sf_dir)


def _bc_pairs_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric (i, j, dp) Bray-Curtis ppm long form over the
    filtered cohort, diagonal included (dp=0). Exact integers:
    dp = 1e6 − (2e6·sum_min) div (tot_i + tot_j)."""
    cust = load_table(spark, sf_dir, "customer")
    sel = cust.filter(_PCOA_FILTER.column()).select(
        F.col("c_custkey").alias("sample_id")
    )
    # Push the bounded cohort DOWN instead of filtering after the full
    # lineitem ⋈ orders shuffle join (Catalyst can't reorder that for
    # us without CBO stats): broadcast the ≤2000-key cohort into
    # orders, then broadcast the filtered orders (O(1) in SF for a
    # fixed cohort — ~10 orders/customer) into the lineitem scan. At
    # 100 TB this turns the feed into two broadcast joins with the
    # selection at the scan.
    od = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_custkey").alias("sample_id")
    )
    od_f = od.join(F.broadcast(sel), "sample_id")
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"),
        F.col("l_partkey").alias("otu_id"),
        F.col("l_quantity").alias("cnt"),
    )
    ab = li.join(maybe_broadcast(od_f), "o_orderkey")
    a = ab.groupBy("sample_id", "otu_id").agg(
        F.sum("cnt").cast("bigint").alias("c")
    )
    tot = a.groupBy("sample_id").agg(F.sum("c").cast("bigint").alias("tot"))

    ax = a.select(F.col("sample_id").alias("i"), "otu_id", F.col("c").alias("ca"))
    ay = a.select(
        F.col("sample_id").alias("j"),
        F.col("otu_id").alias("otu_y"),
        F.col("c").alias("cb"),
    )
    shared = (
        ax.join(ay, (ax.otu_id == ay.otu_y) & (ax.i < ay.j))
        .groupBy("i", "j")
        .agg(F.sum(F.least("ca", "cb")).cast("bigint").alias("sum_min"))
    )
    ti = tot.select(F.col("sample_id").alias("i"), F.col("tot").alias("tot_i"))
    tj = tot.select(F.col("sample_id").alias("j"), F.col("tot").alias("tot_j"))
    upper = (
        ti.join(tj, F.col("i") < F.col("j"))
        .join(shared, ["i", "j"], "left")
        .select(
            "i",
            "j",
            F.expr(
                "1000000 - (2000000 * coalesce(sum_min, CAST(0 AS BIGINT)))"
                " div (tot_i + tot_j)"
            ).alias("dp"),
        )
    )
    diag = tot.select(
        F.col("sample_id").alias("i"),
        F.col("sample_id").alias("j"),
        F.lit(0).cast("bigint").alias("dp"),
    )
    return upper.unionByName(
        upper.select(F.col("j").alias("i"), F.col("i").alias("j"), "dp")
    ).unionByName(diag)


def _gower_b(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """Integer Gower operator B' = -(n²·d2 − n·rs_i − n·rs_j + gs) in
    (i, j, b BIGINT) long form plus the (gs, n) scalar frame.
    B' = 2n²·B — same eigenvectors as the centered matrix.

    BIGINT since r15 (was DECIMAL(38,0)): the cohort is hard-capped at
    n ≤ 2000 (``c_custkey < 2000`` in _PCOA_FILTER — scale-invariant),
    so with d2 ≤ 1e12 (ppm² grid) every term is bounded: n²·d2 ≤ 4e18,
    n·rs ≤ n²·d2max = 4e18, gs ≤ 4e18, and the FORCED left-associated
    order ((n·n·d2 − n·rs_i) − n·rs_j) + gs keeps every intermediate
    within ±8e18 < 2^63 — no overflow even when every pair sits at the
    1e6 ppm ceiling. Values are the identical integers the decimal
    pipeline produced (proven exceptAll-equal at sf0.1, operator AND
    full query); the long chain reaches its JIT floor a warm-up round
    earlier and runs leaner (min-of-4 interleaved: 0.70 → 0.58 s at
    the floor, 1.9 → 0.66 s one round before it). Downstream wide
    arithmetic (deflation, Rayleigh) casts b back to DECIMAL(38,0) at
    the use site exactly as before."""
    d2 = (
        _bc_pairs_full(spark, sf_dir)
        .select("i", "j", F.expr("dp * dp").alias("d2"))
        .localCheckpoint()  # reused by rs + gn + the join
    )
    rs = d2.groupBy("i").agg(F.sum("d2").cast("long").alias("rs"))
    gn = d2.agg(
        F.sum("d2").cast("long").alias("gs"),
        F.countDistinct("i").cast("long").alias("n"),
    )
    b = (
        d2.join(rs.select("i", F.col("rs").alias("rs_i")), "i")
        .join(rs.select(F.col("i").alias("j"), F.col("rs").alias("rs_j")), "j")
        .crossJoin(F.broadcast(gn))
        .select(
            "i",
            "j",
            F.expr(
                "-(((n * n * d2 - n * rs_i) - n * rs_j) + gs)"
            ).alias("b"),
        )
        .localCheckpoint()  # the iteration loop reuses the operator
    )
    return b, gn


def _start_vector(b: DataFrame, seed: int) -> DataFrame:
    """md5-derived integer start in [-1000, 1000]: engine-identical
    (hash_bucket idiom) and generically outside B's null space (the
    all-ones vector IS in it — double-centering zeroes row sums)."""
    return (
        b.select("j")
        .distinct()
        .select(
            "j",
            (
                hash_bucket(
                    F.concat(F.col("j").cast("string"), F.lit(f":{seed}")),
                    2001,
                )
                - 1000
            )
            .cast("bigint")
            .alias("v"),
        )
    )


def _int_power_iterate(
    b: DataFrame, v: DataFrame, iters: int | None = None
) -> DataFrame:
    """Dominant eigenvector direction of the long-form integer
    operator ``b`` in ppm fixed point. Each round: exact integer
    matrix-vector product, then the sign-split truncating rescale
    v ← sign(u)·(|u|·10⁶ div max|u|) — nonneg numerator and positive
    divisor, so the recurrence is identical in Spark `div`, DuckDB
    `//`, and Python `//` on nonneg operands.

    Mechanics (r9): the operator is BOUNDED by construction at every
    call site (|cohort|² ≤ ~400² pair rows for PCoA, 64² for the
    covariance axis), so all rounds run inside ONE ``applyInPandas``
    batch with exact integer arithmetic — numpy int64 fast path via a
    2³⁰ hi/lo limb split (per-round MAC bounds asserted; sums of
    int64 limbs are associative and exact), arbitrary-precision
    Python ints when the asserted bounds don't hold. This replaces
    the r8 shape (one broadcast-join job per round, eagerly
    localCheckpointed — ~0.35 s/round × 200 rounds dominated the
    whole bench at 44 s) with a single job; the UNBOUNDED work
    (abundance scan, pair join, Gram pass) stays in distributed
    declarative Spark upstream. Engines still compute bit-identical
    sequences — the DuckDB oracle's unrolled MATERIALIZED-CTE rounds
    are unchanged."""
    n_iters = iters if iters is not None else _POWER_ITERS

    joined = b.join(v, "j").select(
        F.col("i").cast("long").alias("i"),
        F.col("j").cast("long").alias("j"),
        F.col("b").cast("decimal(38,0)").alias("b"),
        F.col("v").cast("long").alias("v0"),
    )

    def solve(pdf):
        import numpy as np
        import pandas as pd

        ids = np.unique(pdf["i"].to_numpy(dtype=np.int64))
        pos = {int(s): k for k, s in enumerate(ids)}
        n = len(ids)
        if any(int(j) not in pos for j in pdf["j"].unique()):
            # the per-round Spark join dropped nothing at either call
            # site (square full operators); refuse asymmetric input
            # rather than silently diverging from the r8 recurrence
            raise ValueError(
                "_int_power_iterate: operator has column ids absent "
                "from its row ids (non-square input)"
            )
        row = np.fromiter(
            (pos[int(x)] for x in pdf["i"]), dtype=np.int64, count=len(pdf)
        )
        col = np.fromiter(
            (pos[int(x)] for x in pdf["j"]), dtype=np.int64, count=len(pdf)
        )
        b_py = [int(x) for x in pdf["b"]]
        vvec = np.zeros(n, dtype=np.int64)
        for jj, v0 in zip(pdf["j"], pdf["v0"]):
            vvec[pos[int(jj)]] = int(v0)

        order = np.argsort(row, kind="stable")
        row_s, col_s = row[order], col[order]
        starts = np.flatnonzero(np.r_[True, np.diff(row_s) != 0])
        out_pos = row_s[starts]
        # every id appears as a row (square full operator) — required
        # so the rescaled iterate stays total over the index set
        assert len(out_pos) == n

        max_b = max((abs(x) for x in b_py), default=0)
        cnt = int(np.max(np.bincount(row_s, minlength=1)))
        vmax = max(10**6, int(np.max(np.abs(vvec))) if n else 0)
        lim = 2**63 - 1
        fast = (
            max_b < 2**62
            and ((max_b >> 30) + 1) * vmax * cnt < lim
            and (2**30) * vmax * cnt < lim
        )
        if fast:
            b64 = np.array(b_py, dtype=np.int64)[order]
            hi_s = b64 >> 30
            lo_s = b64 & ((1 << 30) - 1)
            for _ in range(n_iters):
                vj = vvec[col_s]
                s_hi = np.add.reduceat(hi_s * vj, starts)
                s_lo = np.add.reduceat(lo_s * vj, starts)
                u = [
                    (int(a) << 30) + int(c)
                    for a, c in zip(s_hi, s_lo)
                ]
                m = max(max(abs(x) for x in u), 1)
                nxt = np.zeros(n, dtype=np.int64)
                nxt[out_pos] = np.fromiter(
                    (
                        (-1 if x < 0 else 1) * ((abs(x) * 1000000) // m)
                        for x in u
                    ),
                    dtype=np.int64,
                    count=n,
                )
                vvec = nxt
        else:
            # exact arbitrary-precision path (never reached by the
            # committed call sites — their rescale targets keep the
            # fast-path bounds with wide margins)
            b_s = [b_py[k] for k in order]
            vv = {k: int(vvec[k]) for k in range(n)}
            for _ in range(n_iters):
                u: dict[int, int] = {}
                for r, c, bb in zip(row_s, col_s, b_s):
                    u[r] = u.get(int(r), 0) + bb * vv[int(c)]
                m = max(max(abs(x) for x in u.values()), 1)
                vv = {
                    k: (-1 if x < 0 else 1) * ((abs(x) * 1000000) // m)
                    for k, x in u.items()
                }
            vvec = np.zeros(n, dtype=np.int64)
            for k, x in vv.items():
                vvec[k] = x
        return pd.DataFrame(
            {"j": ids.astype("int64"), "v": vvec.astype("int64")}
        )

    return joined.groupBy(F.lit(0).alias("_g")).applyInPandas(
        solve, schema="j long, v long"
    )


def _milli(v: DataFrame) -> DataFrame:
    """Milli-truncated copy (3 digits) — shrinks Rayleigh/deflation
    magnitudes by 1e6 so every product keeps DECIMAL(38,0) headroom."""
    return v.select(
        "j",
        F.expr(
            "CASE WHEN v < 0 THEN -1 ELSE 1 END * (abs(v) div 1000)"
        ).alias("vm"),
    )


def _rayleigh_m(b: DataFrame, vm: DataFrame) -> DataFrame:
    """num = vmᵀ B vm (exact integer, 1-row)."""
    bv = (
        b.join(F.broadcast(vm), "j")
        .groupBy("i")
        .agg(F.sum(F.expr("CAST(b AS DECIMAL(38,0)) * vm")).alias("bv"))
    )
    return bv.join(
        F.broadcast(vm.select(F.col("j").alias("i"), "vm")), "i"
    ).agg(F.sum(F.expr("bv * vm")).cast("decimal(38,0)").alias("num"))


# No explicit micro multiplier: d2 sits on the ppm² grid, so λ_int =
# 1e12·λ_true and √λ_int = 1e6·√λ_true — the micro scaling is already
# inside the integer operator.
_AXIS_EXPR = (
    "CAST(floor(CAST(sgn * v AS DOUBLE)"
    " * sqrt(greatest(CAST(num AS DOUBLE), 0.0)"
    "        / (CAST(greatest(den_m, 1) AS DOUBLE) * 2.0))"
    " / (CAST(n AS DOUBLE) * sqrt(CAST(greatest(den, 1) AS DOUBLE))))"
    " AS BIGINT)"
)


def _axis_scores(
    v: DataFrame,
    num: DataFrame,
    den: DataFrame,
    den_m: DataFrame,
    gn: DataFrame,
    alias: str,
    guard: str,
) -> DataFrame:
    """axis_i = v̂_i·√λ_B micro-floored: v̂ = v/√den, λ_B = num/(den_m·
    2n²). Token-identical float expression in the oracle; sign fixed
    by the lowest-id loading (ties-to-positive so a zero loading
    cannot zero the axis)."""
    sgn = (
        v.orderBy("j")
        .limit(1)
        .select(
            F.expr("CASE WHEN v < 0 THEN -1 ELSE 1 END")
            .cast("bigint")
            .alias("sgn")
        )
    )
    return (
        v.crossJoin(F.broadcast(num))
        .crossJoin(F.broadcast(den))
        .crossJoin(F.broadcast(den_m))
        .crossJoin(F.broadcast(gn.select("n")))
        .crossJoin(F.broadcast(sgn))
        .select(
            F.col("j").alias("sample_id"),
            F.expr(
                # loud overflow guard (morisita_horn convention):
                # non-ANSI decimal overflow upstream surfaces as NULL
                # scalars here; fail instead of hashing a wrong axis
                f"CASE WHEN assert_true(num IS NOT NULL AND den IS NOT NULL"
                f" AND den_m IS NOT NULL AND v IS NOT NULL,"
                f" '{guard}') IS NULL THEN {_AXIS_EXPR} END"
            ).alias(alias),
        )
    )


def _pcoa_oracle() -> str:
    """Unrolled DuckDB twin of the fixed-point iteration: identical
    integer recurrence (HUGEINT MACs, `//` on nonneg operands),
    identical float-only score expression."""
    v0a = hash_bucket_sql("CAST(i AS VARCHAR) || ':7'", 2001)
    v0b = hash_bucket_sql("CAST(i AS VARCHAR) || ':11'", 2001)

    def rounds(mat: str, tag: str) -> str:
        out = []
        prev = f"v0{tag}"
        for k in range(1, _POWER_ITERS + 1):
            out.append(
                f"u{k}{tag} AS MATERIALIZED (\n"
                f"  SELECT b.i AS j, CAST(sum(b.b * v.v) AS HUGEINT) AS u\n"
                f"  FROM {mat} b JOIN {prev} v ON b.j = v.j GROUP BY b.i\n"
                f"),\n"
                f"v{k}{tag} AS MATERIALIZED (\n"
                f"  SELECT j, CAST(CASE WHEN u < 0 THEN -1 ELSE 1 END\n"
                f"    * ((abs(u) * 1000000)\n"
                f"       // greatest(max(abs(u)) OVER (), 1))"
                f" AS HUGEINT) AS v\n"
                f"  FROM u{k}{tag}\n"
                f")"
            )
            prev = f"v{k}{tag}"
        return ",\n".join(out)

    last = _POWER_ITERS
    ax = _AXIS_EXPR
    axis1 = (
        ax.replace("sgn * v", "s1.sgn * va.v")
        .replace("CAST(num AS DOUBLE)", "CAST(n1.num AS DOUBLE)")
        .replace("greatest(den_m, 1)", "greatest(dm1.den_m, 1)")
        .replace("CAST(n AS DOUBLE)", "CAST(g.n AS DOUBLE)")
        .replace("greatest(den, 1)", "greatest(d1.den, 1)")
    )
    axis2 = (
        ax.replace("sgn * v", "s2g.sgn * vb.v")
        .replace("CAST(num AS DOUBLE)", "CAST(n2.num AS DOUBLE)")
        .replace("greatest(den_m, 1)", "greatest(dm2.den_m, 1)")
        .replace("CAST(n AS DOUBLE)", "CAST(g.n AS DOUBLE)")
        .replace("greatest(den, 1)", "greatest(d2x.den, 1)")
    )
    return f"""
WITH {ABUNDANCE_CTE},
sel AS MATERIALIZED (
  SELECT c_custkey AS sample_id FROM customer WHERE {_PCOA_FILTER.sql()}
),
a AS MATERIALIZED (
  SELECT ab.sample_id, otu_id, CAST(sum(cnt) AS BIGINT) AS c
  FROM abundance ab JOIN sel ON ab.sample_id = sel.sample_id
  GROUP BY ab.sample_id, otu_id
),
tot AS MATERIALIZED (
  SELECT sample_id, CAST(sum(c) AS BIGINT) AS tot FROM a GROUP BY sample_id
),
shared AS MATERIALIZED (
  SELECT x.sample_id AS i, y.sample_id AS j,
    CAST(sum(least(x.c, y.c)) AS BIGINT) AS sum_min
  FROM a x JOIN a y ON x.otu_id = y.otu_id AND x.sample_id < y.sample_id
  GROUP BY x.sample_id, y.sample_id
),
up AS MATERIALIZED (
  SELECT ti.sample_id AS i, tj.sample_id AS j,
    1000000 - (2000000 * coalesce(s.sum_min, CAST(0 AS BIGINT)))
      // (ti.tot + tj.tot) AS dp
  FROM tot ti JOIN tot tj ON ti.sample_id < tj.sample_id
  LEFT JOIN shared s ON s.i = ti.sample_id AND s.j = tj.sample_id
),
dmat AS MATERIALIZED (
  SELECT i, j, dp FROM up
  UNION ALL SELECT j, i, dp FROM up
  UNION ALL SELECT sample_id, sample_id, CAST(0 AS BIGINT) FROM tot
),
d2m AS MATERIALIZED (SELECT i, j, CAST(dp AS HUGEINT) * dp AS d2 FROM dmat),
rs AS MATERIALIZED (SELECT i, CAST(sum(d2) AS HUGEINT) AS rs FROM d2m GROUP BY i),
gn AS MATERIALIZED (
  SELECT CAST(sum(d2) AS HUGEINT) AS gs,
    CAST(count(DISTINCT i) AS HUGEINT) AS n
  FROM d2m
),
bmat AS MATERIALIZED (
  SELECT d.i, d.j,
    -(g.n * g.n * d.d2 - g.n * ri.rs - g.n * rj.rs + g.gs) AS b
  FROM d2m d
  JOIN rs ri ON d.i = ri.i
  JOIN rs rj ON d.j = rj.i
  CROSS JOIN gn g
),
v0a AS MATERIALIZED (
  SELECT i AS j, CAST({v0a} - 1000 AS HUGEINT) AS v FROM rs
),
{rounds('bmat', 'a')},
v1m AS MATERIALIZED (
  SELECT j, CASE WHEN v < 0 THEN -1 ELSE 1 END * (abs(v) // 1000) AS vm
  FROM v{last}a
),
den1 AS MATERIALIZED (SELECT CAST(sum(v * v) AS HUGEINT) AS den FROM v{last}a),
den1m AS MATERIALIZED (SELECT CAST(sum(vm * vm) AS HUGEINT) AS den_m FROM v1m),
bv1 AS MATERIALIZED (
  SELECT b.i, CAST(sum(b.b * v.vm) AS HUGEINT) AS bv
  FROM bmat b JOIN v1m v ON b.j = v.j GROUP BY b.i
),
num1 AS MATERIALIZED (
  SELECT CAST(sum(bv.bv * v.vm) AS HUGEINT) AS num
  FROM bv1 bv JOIN v1m v ON bv.i = v.j
),
b2 AS MATERIALIZED (
  SELECT b.i, b.j,
    dm.den_m * dm.den_m * b.b - n1.num * vi.vm * vj.vm AS braw
  FROM bmat b
  JOIN v1m vi ON b.i = vi.j
  JOIN v1m vj ON b.j = vj.j
  CROSS JOIN den1m dm CROSS JOIN num1 n1
),
s2 AS MATERIALIZED (
  SELECT greatest(max(abs(braw)) // {_B2_TARGET} + 1, 1) AS s FROM b2
),
b2s AS MATERIALIZED (
  SELECT i, j, CAST(CASE WHEN braw < 0 THEN -1 ELSE 1 END
    * (abs(braw) // s.s) AS HUGEINT) AS b
  FROM b2 CROSS JOIN s2 s
),
v0b AS MATERIALIZED (
  SELECT i AS j, CAST({v0b} - 1000 AS HUGEINT) AS v FROM rs
),
{rounds('b2s', 'b')},
v2m AS MATERIALIZED (
  SELECT j, CASE WHEN v < 0 THEN -1 ELSE 1 END * (abs(v) // 1000) AS vm
  FROM v{last}b
),
den2 AS MATERIALIZED (SELECT CAST(sum(v * v) AS HUGEINT) AS den FROM v{last}b),
den2m AS MATERIALIZED (SELECT CAST(sum(vm * vm) AS HUGEINT) AS den_m FROM v2m),
bv2 AS MATERIALIZED (
  SELECT b.i, CAST(sum(b.b * v.vm) AS HUGEINT) AS bv
  FROM bmat b JOIN v2m v ON b.j = v.j GROUP BY b.i
),
num2 AS MATERIALIZED (
  SELECT CAST(sum(bv.bv * v.vm) AS HUGEINT) AS num
  FROM bv2 bv JOIN v2m v ON bv.i = v.j
),
sg1 AS MATERIALIZED (
  SELECT CASE WHEN v < 0 THEN -1 ELSE 1 END AS sgn FROM v{last}a
  WHERE j = (SELECT min(j) FROM v{last}a)
),
sg2 AS MATERIALIZED (
  SELECT CASE WHEN v < 0 THEN -1 ELSE 1 END AS sgn FROM v{last}b
  WHERE j = (SELECT min(j) FROM v{last}b)
)
SELECT va.j AS sample_id,
  {axis1} AS axis1_micro,
  {axis2} AS axis2_micro
FROM v{last}a va
JOIN v{last}b vb ON va.j = vb.j
CROSS JOIN num1 n1 CROSS JOIN den1 d1 CROSS JOIN den1m dm1
CROSS JOIN num2 n2 CROSS JOIN den2 d2x CROSS JOIN den2m dm2
CROSS JOIN gn g CROSS JOIN sg1 s1 CROSS JOIN sg2 s2g
"""


@register("ordination_pcoa_2d", oracle=_pcoa_oracle())
def ordination_pcoa_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(sample_id, axis1_micro, axis2_micro) — the 2-D ordination the
    comparison page plots, oracle-backed since r8 via the fixed-point
    integer iteration documented in the module docstring. Axis 2
    deflates on B₂ = den₁·B' − num₁·v₁ᵐv₁ᵐᵀ, integer-rescaled into
    DECIMAL(38,0) headroom; λ for both axes is the exact-integer
    Rayleigh quotient on the ORIGINAL operator."""
    b, gn = _gower_b(spark, sf_dir)
    # r16: barrier the eigenvector. v1 is an applyInPandas subtree
    # (the 100-round integer solve) referenced by v1m/den1/num1/b2/a1;
    # FlatMapGroupsInPandas sits ABOVE its exchange, so runtime
    # exchange reuse cannot dedup the Python evaluation — the r15
    # final plan carried 24 Python-eval nodes and re-ran the solve per
    # reference. One eager checkpoint runs each solve exactly once
    # (values unchanged: the recurrence is deterministic integer math).
    v1 = _int_power_iterate(b, _start_vector(b, seed=7)).localCheckpoint()
    v1m = _milli(v1)
    den1 = v1.agg(
        F.sum(F.expr("v * v")).cast("decimal(38,0)").alias("den")
    )
    den1m = v1m.agg(
        F.sum(F.expr("vm * vm")).cast("decimal(38,0)").alias("den_m")
    )
    num1 = _rayleigh_m(b, v1m)

    vmi = v1m.select(F.col("j").alias("i"), F.col("vm").alias("vmi"))
    vmj = v1m.select("j", F.col("vm").alias("vmj"))
    b2 = (
        b.join(F.broadcast(vmi), "i")
        .join(F.broadcast(vmj), "j")
        .crossJoin(F.broadcast(den1m))
        .crossJoin(F.broadcast(num1))
        .select(
            "i",
            "j",
            # B₂ = den_m²·(B − λ₁v̂₁v̂₁ᵀ) with λ₁ = num/den_m and
            # v̂₁ = v1m/√den_m — den_m SQUARED on the B term; b is
            # BIGINT since r15, so the widening cast is explicit
            F.expr(
                "den_m * den_m * CAST(b AS DECIMAL(38,0))"
                " - num * vmi * vmj"
            ).alias("braw"),
        )
    )
    s2 = b2.agg(
        F.expr(
            f"greatest(max(abs(braw)) div CAST({_B2_TARGET} AS DECIMAL(38,0))"
            " + 1, CAST(1 AS BIGINT))"
        ).alias("s")
    )
    b2s = (
        b2.crossJoin(F.broadcast(s2))
        .select(
            "i",
            "j",
            F.expr(
                "CAST(CASE WHEN braw < 0 THEN -1 ELSE 1 END"
                " * (abs(braw) div s) AS DECIMAL(38,0))"
            ).alias("b"),
        )
        .localCheckpoint()
    )
    v2 = _int_power_iterate(
        b2s, _start_vector(b, seed=11)
    ).localCheckpoint()  # same barrier argument as v1
    v2m = _milli(v2)
    den2 = v2.agg(
        F.sum(F.expr("v * v")).cast("decimal(38,0)").alias("den")
    )
    den2m = v2m.agg(
        F.sum(F.expr("vm * vm")).cast("decimal(38,0)").alias("den_m")
    )
    num2 = _rayleigh_m(b, v2m)

    a1 = _axis_scores(
        v1, num1, den1, den1m, gn, "axis1_micro",
        "ordination_pcoa_2d axis1: DECIMAL(38,0) overflow — shrink the"
        " cohort cap or rescale the operator",
    )
    a2 = _axis_scores(
        v2, num2, den2, den2m, gn, "axis2_micro",
        "ordination_pcoa_2d axis2: DECIMAL(38,0) overflow — shrink the"
        " cohort cap or rescale the operator",
    )
    return a1.join(a2, "sample_id")

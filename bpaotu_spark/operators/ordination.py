"""Ordination (PCoA) — the reference's sample-comparison plot.

The reference's comparison page (public path ``bpaotu/otu/views.py``
comparison endpoints + the frontend MDS plot) ordinates the filtered
sample set from its pairwise dissimilarity matrix. Re-expressed
Spark-first:

1. the Bray-Curtis dissimilarity pairs come from the same blocked
   pipeline as ``beta_diversity_braycurtis`` (here block-free within a
   *filtered, bounded* sample selection — ordination is a plot of a
   user-selected cohort, not of all samples);
2. classical PCoA double-centers the squared dissimilarity matrix
   (Gower: B = -1/2 · J D² J) — expressed as DataFrame ops over the
   (i, j, d) long form: row means, column means, grand mean are three
   aggregates joined back;
3. the first principal coordinate is the dominant eigenvector of B,
   extracted by **distributed power iteration**: repeated
   matrix-vector products (join on j, groupBy i) with normalization,
   lineage cut per round. Deterministic: fixed iteration count, fixed
   all-ones start, sign fixed by the lowest-id sample's loading.

Scale: the matrix is |cohort|² entries in long form, partitioned by
row — each product is one join + one groupBy shuffle; the vector is
broadcast-sized by construction. This is the standard shape for
distributed spectral methods (e.g. PageRank-style iterations).

No SQL oracle (iterative; DuckDB has no fixpoint linear algebra) —
driver records the rows-only check; the pytest cross-checks axis
scores against numpy eigendecomposition at sf0.001.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from bpaotu_spark.catalog import load_table
from bpaotu_spark.operators.bpaotu import abundance
from bpaotu_spark.plans.filters import ContextualFilter, Pred
from bpaotu_spark.registry import register

_PCOA_FILTER = ContextualFilter.of([Pred("c_mktsegment", "eq", "MACHINERY")], "and")
# Convergence is geometric at (λ2/λ1)^k; the synthetic cohorts show
# λ2/λ1 ≈ 0.93, so ~100 products reach ~1e-3 relative error.
_POWER_ITERS = 100
_RESCALE_EVERY = 10


def _bc_pairs_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric (i, j, d) Bray-Curtis long form over the filtered
    cohort, diagonal included (d=0)."""
    cust = load_table(spark, sf_dir, "customer")
    sel = cust.filter(_PCOA_FILTER.column()).select(
        F.col("c_custkey").alias("sample_id")
    )
    ab = abundance(spark, sf_dir).join(F.broadcast(sel), "sample_id")
    a = ab.groupBy("sample_id", "otu_id").agg(F.sum("cnt").alias("c"))
    tot = a.groupBy("sample_id").agg(F.sum("c").alias("tot"))

    ax = a.select(
        F.col("sample_id").alias("i"), "otu_id", F.col("c").alias("ca")
    )
    ay = a.select(
        F.col("sample_id").alias("j"),
        F.col("otu_id").alias("otu_y"),
        F.col("c").alias("cb"),
    )
    shared = (
        ax.join(ay, (ax.otu_id == ay.otu_y) & (ax.i < ay.j))
        .groupBy("i", "j")
        .agg(F.sum(F.least("ca", "cb")).alias("sum_min"))
    )
    ti = tot.select(F.col("sample_id").alias("i"), F.col("tot").alias("tot_i"))
    tj = tot.select(F.col("sample_id").alias("j"), F.col("tot").alias("tot_j"))
    upper = (
        ti.join(tj, F.col("i") < F.col("j"))
        .join(shared, ["i", "j"], "left")
        .select(
            "i",
            "j",
            (
                1.0
                - 2.0 * F.coalesce(F.col("sum_min"), F.lit(0.0))
                / (F.col("tot_i") + F.col("tot_j"))
            ).alias("d"),
        )
    )
    diag = tot.select(
        F.col("sample_id").alias("i"),
        F.col("sample_id").alias("j"),
        F.lit(0.0).alias("d"),
    )
    return upper.unionByName(
        upper.select(F.col("j").alias("i"), F.col("i").alias("j"), "d")
    ).unionByName(diag)


@register("ordination_pcoa_axis1")  # rows-only: iterative, no SQL fixpoint
def ordination_pcoa_axis1(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _bc_pairs_full(spark, sf_dir).select(
        "i", "j", (F.col("d") * F.col("d")).alias("d2")
    )
    d = d.localCheckpoint()  # D² is reused by three aggregates + the join

    row_m = d.groupBy("i").agg(F.avg("d2").alias("rm"))
    col_m = d.groupBy("j").agg(F.avg("d2").alias("cm"))
    grand = d.agg(F.avg("d2").alias("gm"))
    b = (
        d.join(row_m, "i")
        .join(col_m, "j")
        .crossJoin(F.broadcast(grand))
        .select(
            "i",
            "j",
            (-0.5 * (F.col("d2") - F.col("rm") - F.col("cm") + F.col("gm"))).alias(
                "b"
            ),
        )
        .localCheckpoint()  # the iteration loop reuses B every round
    )

    # Start vector must not lie in B's null space — and the all-ones
    # vector DOES (double-centering zeroes every row sum). A
    # deterministic hash of the sample id is generic: non-degenerate
    # projection onto the dominant eigenvector with probability 1.
    v = (
        b.select("j")
        .distinct()
        .select(
            "j",
            (
                F.pmod(F.xxhash64("j", F.lit(7)), F.lit(1000)).cast("double") / 500.0
                - 1.0
            ).alias("v"),
        )
    )
    # No per-product normalization: the scale drifts as λ1^k, which a
    # periodic rescale absorbs — two extra stages every _RESCALE_EVERY
    # products instead of every product.
    for it in range(_POWER_ITERS):
        v = (
            b.join(v, "j")
            .groupBy("i")
            .agg(F.sum(F.col("b") * F.col("v")).alias("v"))
            .select(F.col("i").alias("j"), "v")
        )
        if it % _RESCALE_EVERY == _RESCALE_EVERY - 1 or it == _POWER_ITERS - 1:
            nrm = v.agg(F.sqrt(F.sum(F.col("v") * F.col("v"))).alias("n"))
            v = (
                v.crossJoin(F.broadcast(nrm))
                .select("j", (F.col("v") / F.col("n")).alias("v"))
                .localCheckpoint()  # cut the join-loop lineage
            )

    # eigenvalue estimate λ = vᵀBv; sign convention: loading of the
    # lowest sample id is non-negative.
    bv = (
        b.join(v, "j")
        .groupBy("i")
        .agg(F.sum(F.col("b") * F.col("v")).alias("bv"))
    )
    lam = (
        bv.join(v.select(F.col("j").alias("i"), "v"), "i")
        .agg(F.sum(F.col("bv") * F.col("v")).alias("lam"))
    )
    first = v.orderBy("j").limit(1).select(F.signum(F.col("v")).alias("sgn"))
    return (
        v.crossJoin(F.broadcast(lam))
        .crossJoin(F.broadcast(first))
        .select(
            F.col("j").alias("sample_id"),
            F.round(
                F.col("v") * F.col("sgn") * F.sqrt(F.greatest(F.col("lam"), F.lit(0.0))),
                4,
            )
            .cast("double")
            .alias("axis1"),
        )
    )

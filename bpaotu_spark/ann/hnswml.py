"""Multi-layer (HNSW-style) hierarchical search over the persisted
connected graph — md5 geometric layer assignment + routing-layer scan
+ short beam descent.

Reference parity: the reference's BLAST endpoint (public
``bpaotu/otu/views.py`` + ``bpaotu/otu/blast.py``) is
nearest-neighbour retrieval against a pre-built index; this is the
hierarchical form of that index, generalizing r10's two-layer probe
(``ann_hnsw_layered_search``) which measurably LOST to the flat beam
at sf0.1 (5/10 vs 7/10).

**Layer assignment** (Malkov & Yashunin's geometric levels, made
deterministic): node ``v`` reaches layer ``l`` iff the first ``l``
hex digits of ``md5(CAST(vec_id AS VARCHAR))`` are ``'0'`` — p = 1/16
per level, layers nest exactly like HNSW's (a level-2 node is a
member of layers 0, 1, 2), and ~log16(n) layers carry nodes.

**Search**: the routing layer is scanned exactly (top-``n_seeds`` by
integer d2) — at the top of a true HNSW the layer has O(1) members,
and "walking" a complete graph of a handful of nodes IS a scan; here
the routing layer is n/16^L members, the same bounded-candidate-scan
shape as IVF's centroid probe but with md5 membership instead of
trained centroids (no k-means build step). Descent then runs a
beam-``_ML_BEAM`` × ``_ML_HOPS`` walk on the CONNECTED base graph
(read from the build-once persisted index, ``ann/index_store``).

**Level selection** (r11 VERDICT item 4 — no fixed constant): the
routing level is DERIVED FROM THE CORPUS SIZE inside both engines via
exact integer thresholds — ``route_level = 1 + #{k in 5..9 : n >=
16^k}`` — which keeps the scanned member count ``n/16^L`` under
``16^5 = 65,536`` rows per query set at every corpus size (today's
SFs all select level 1, preserving the measured 9/10 sf0.01 / 7/10
sf0.1 exact-hit; a 1M-vector corpus selects level 2, 16M level 3,
...). Integer comparisons, not ``floor(log16(n))``, so a 1-ulp
double divergence at an exact power of 16 cannot flip the level
between engines. ``n_seeds = 2 + 2·route_level`` grows with depth
(4 today). The chosen ``(n, route_level, n_seeds)`` row is persisted
alongside the graph through the index store (``hnsw_params``), so a
search job reads the build's decision instead of re-deriving it.

**Measured negative result** (kept, per the ann_jl_topk_recall
convention): true per-layer degree-bounded kNN graphs (k=3..4, beam
2-12 walks at levels 1-3 — the literal HNSW descent) were built and
measured first; every configuration LOST at sf0.1 (3-6/10 exact-hit)
because the layer kNN graphs inherit the corpus's 10-cluster
disconnection — a walk entering the wrong cluster's subgraph cannot
cross, exactly the r9 base-graph diagnosis one level up. The
routing-layer SCAN is immune (it sees every cluster's members) and
wins: exact-hit 9/10 at sf0.01 and 7/10 at sf0.1 with FOUR base-layer
hop-joins — the flat ``ann_beam_graph_search`` needs EIGHT for 7/10
at both SFs. The hierarchy pays for itself: same recall, half the
expensive hops.

Determinism: md5 membership, milli-grid integer d2, (d2, node_id)
ranking; the DuckDB oracle mirrors the scan and unrolls every descent
hop as MATERIALIZED CTEs over the same conn_edges construction.

Scale shape: the scan is |queries| × n/16^L bounded rows (broadcast
queries into the member scan — no shuffle); each descent hop
broadcasts a |queries|·beam frontier into the persisted edge-list
probe. Nothing is driver-side, nothing is rebuilt per query.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bpaotu_spark.ann.core import N_QUERIES
from bpaotu_spark.ann.extras3 import _D2_SQL, _RQ_Q
from bpaotu_spark.ann.graphconn import CONNECTED_EDGES_SQL
from bpaotu_spark.catalog import load_table
from bpaotu_spark.dedup.core import grid_d2
from bpaotu_spark.registry import register

_ML_BEAM = 12  # descent beam width (same as the flat op)
_ML_HOPS = 4  # descent hops — HALF the flat op's 8

# routing level from corpus size: level L scans n/16^L members, so
# bump L each time n crosses 16^(L+4) — the scan never exceeds 16^5
# members. Exact integer thresholds shared verbatim by both engines.
_LEVEL_THRESHOLDS = tuple(16**k for k in range(5, 10))

_PARAMS_SQL = f"""
  SELECT n,
    1 {" ".join(f"+ (CASE WHEN n >= {t} THEN 1 ELSE 0 END)"
                for t in _LEVEL_THRESHOLDS)} AS route_level,
    2 + 2 * (1 {" ".join(f"+ (CASE WHEN n >= {t} THEN 1 ELSE 0 END)"
                         for t in _LEVEL_THRESHOLDS)}) AS n_seeds
  FROM (SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings)
""".strip()


def _descent_ctes() -> tuple[str, str]:
    parts = []
    prev = "df0"
    for k in range(1, _ML_HOPS + 1):
        parts.append(f"""
de{k} AS MATERIALIZED (
  SELECT DISTINCT query_id, node_id, d2 FROM (
    SELECT query_id, node_id, d2 FROM {prev}
    UNION ALL
    SELECT f.query_id, e.dst AS node_id,
      {_D2_SQL.format(a="q.q", b="c.q")} AS d2
    FROM {prev} f
    JOIN g0 e ON e.src = f.node_id AND e.dst != f.query_id
    JOIN eq q ON q.vec_id = f.query_id
    JOIN eq c ON c.vec_id = e.dst
  )
),
df{k} AS MATERIALIZED (
  SELECT query_id, node_id, d2 FROM (
    SELECT query_id, node_id, d2,
      row_number() OVER (PARTITION BY query_id ORDER BY d2, node_id)
        AS rn
    FROM de{k}
  ) WHERE rn <= {_ML_BEAM}
)""".strip())
        prev = f"df{k}"
    return ",\n".join(parts), prev


def _multilayer_oracle() -> str:
    descent, last = _descent_ctes()
    return f"""
WITH RECURSIVE
{CONNECTED_EDGES_SQL},
eq AS MATERIALIZED (
  SELECT vec_id,
    list_transform(CAST(embedding AS DOUBLE[]),
                   x -> CAST(floor(x * {_RQ_Q}) AS BIGINT)) AS q
  FROM embeddings
),
g0 AS MATERIALIZED (
  SELECT vec_id AS src, neighbor_id AS dst FROM conn_edges
),
params AS MATERIALIZED (
{_PARAMS_SQL}
),
m1 AS MATERIALIZED (
  SELECT vec_id, q FROM eq
  WHERE substr(md5(CAST(vec_id AS VARCHAR)), 1,
               (SELECT CAST(route_level AS INT) FROM params))
        = repeat('0', (SELECT CAST(route_level AS INT) FROM params))
),
df0 AS MATERIALIZED (
  -- routing-layer scan: top-n_seeds members by exact integer d2
  SELECT query_id, node_id, d2 FROM (
    SELECT qs.vec_id AS query_id, m.vec_id AS node_id,
      {_D2_SQL.format(a="qs.q", b="m.q")} AS d2,
      row_number() OVER (PARTITION BY qs.vec_id
        ORDER BY {_D2_SQL.format(a="qs.q", b="m.q")}, m.vec_id) AS rn
    FROM (SELECT vec_id, q FROM eq WHERE vec_id < {N_QUERIES}) qs
    JOIN m1 m ON m.vec_id != qs.vec_id
  ) WHERE rn <= (SELECT n_seeds FROM params)
),
{descent},
found AS (
  SELECT query_id, node_id AS found_id, d2 AS found_d2 FROM (
    SELECT query_id, node_id, d2,
      row_number() OVER (PARTITION BY query_id ORDER BY d2, node_id)
        AS rn
    FROM {last}
  ) WHERE rn = 1
),
truth AS (
  SELECT query_id, cand_id AS true_id, cand_d2 AS true_d2 FROM (
    SELECT qs.vec_id AS query_id, e.vec_id AS cand_id,
      {_D2_SQL.format(a="qs.q", b="e.q")} AS cand_d2,
      row_number() OVER (PARTITION BY qs.vec_id
        ORDER BY {_D2_SQL.format(a="qs.q", b="e.q")}, e.vec_id) AS rn
    FROM (SELECT vec_id, q FROM eq WHERE vec_id < {N_QUERIES}) qs
    JOIN eq e ON e.vec_id != qs.vec_id
  ) WHERE rn = 1
)
SELECT f.query_id, f.found_id, f.found_d2, t.true_id, t.true_d2,
  (f.found_id = t.true_id) AS exact_hit,
  CAST(f.found_d2 * 1000 // greatest(t.true_d2, 1) AS BIGINT)
    AS dist_ratio_milli
FROM found f JOIN truth t USING (query_id)
ORDER BY f.query_id
"""


def hnsw_params(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The build-time level decision — ``(n, route_level, n_seeds)``,
    one row, derived from the corpus size by the integer-threshold
    rule above and PERSISTED through the index store next to the
    graph it parameterizes (a search job reads the build's choice)."""
    from bpaotu_spark.ann.index_store import cached_frame

    bumps = " ".join(
        f"+ (CASE WHEN n >= {t} THEN 1 ELSE 0 END)"
        for t in _LEVEL_THRESHOLDS
    )

    def build() -> DataFrame:
        return (
            load_table(spark, sf_dir, "embeddings")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
            .select(
                "n",
                F.expr(f"CAST(1 {bumps} AS BIGINT)").alias("route_level"),
                F.expr(f"CAST(2 + 2 * (1 {bumps}) AS BIGINT)").alias(
                    "n_seeds"
                ),
            )
        )

    return cached_frame(spark, sf_dir, "hnsw_params", build)


def _d2(qcol: str, ccol: str):
    # fold form: hop-loop stages are tiny (|frontier|x degree rows)
    # and each hop is a distinct plan — an unrolled 64-term chain
    # per hop is pure codegen-compile overhead (measured x2.6 on
    # the multilayer walk)
    return grid_d2(F.col(qcol), F.col(ccol), dim=None)


@register("ann_hnsw_multilayer_search", oracle=_multilayer_oracle())
def ann_hnsw_multilayer_search(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hierarchical ANN search: exact scan of the md5 routing layer
    (top-4 seeds) + beam-12 × 4 descent on the persisted connected
    graph, vs true NN — the flat ops' report shape, at half their
    base-layer hops (measured sf0.01 9/10, sf0.1 7/10 exact-hit)."""
    from bpaotu_spark.ann.index_store import connected_edges_cached

    eq = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x: F.floor(x * _RQ_Q),
        ).alias("q"),
    )
    base = connected_edges_cached(spark, sf_dir).select(
        F.col("vec_id").alias("src"), F.col("neighbor_id").alias("dst")
    )
    qs = eq.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("q").alias("qv")
    )
    params = hnsw_params(spark, sf_dir)  # 1 row, from the store
    m1 = (
        eq.crossJoin(F.broadcast(params))
        .filter(
            F.expr(
                "substring(md5(CAST(vec_id AS STRING)), 1,"
                " CAST(route_level AS INT))"
                " = repeat('0', CAST(route_level AS INT))"
            )
        )
        .select("vec_id", "q", "n_seeds")
    )
    w = Window.partitionBy("query_id").orderBy("d2", "node_id")
    # seed scoring stays a cluster job (the routing layer is corpus-
    # derived); the bounded per-query seed set is then collected and
    # the descent runs as a driver-frontier beam (r16, ann/walk.py):
    # one scored-candidate job per hop, fixed-point early exit
    seed_rows = (
        m1.select(
            F.col("vec_id").alias("node_id"),
            F.col("q").alias("mq"),
            "n_seeds",
        )
        .join(F.broadcast(qs), F.col("node_id") != F.col("query_id"))
        .select(
            "query_id",
            "node_id",
            _d2("qv", "mq").cast("long").alias("d2"),
            "n_seeds",
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= F.col("n_seeds"))
        .select("query_id", "node_id", "d2")
        .collect()
    )
    cq = eq.select(F.col("vec_id").alias("cand_id"), F.col("q").alias("cq"))
    from bpaotu_spark.ann.walk import (
        beam_walk,
        collect_qv,
        collect_truth_nn,
        top1,
        walk_report,
    )

    qmap = collect_qv(qs)
    init: dict[int, list[tuple[int, int]]] = {}
    for r in seed_rows:
        init.setdefault(int(r[0]), []).append((int(r[2]), int(r[1])))
    front = beam_walk(
        spark,
        base,
        cq,
        qmap,
        init,
        beam=_ML_BEAM,
        hops=_ML_HOPS,
        src="src",
        dst="dst",
    )
    # truth leg READ from the persisted ground-truth store: trank=1 of
    # truth_grid_top10 IS this op's exact-NN leg (same _RQ_Q
    # quantization, self-exclusion and (d2, cand_id) tiebreak); the
    # oracle keeps computing truth from scratch
    from bpaotu_spark.ann.truthstore import grid_top10_cached

    truth = collect_truth_nn(
        grid_top10_cached(spark, sf_dir)
        .filter(F.col("trank") == 1)
        .select("query_id", "cand_id", "cand_d2")
    )
    return walk_report(spark, top1(front), truth)

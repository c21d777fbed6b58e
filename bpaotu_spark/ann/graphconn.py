"""Connected deterministic kNN graph — the repaired substrate for
NSW-style graph search.

Reference parity: the reference's BLAST search (public path
``bpaotu/otu/views.py`` blast endpoints) is nearest-neighbour
retrieval; graph-based ANN is its index-accelerated form (SURVEY §2).

The r9 diagnosis (``knn_graph_components``): the k=5 sign-LSH kNN
graph splits into 10 connected components — one per label-cluster
pair — so ANY graph search started from one entry point is capped at
~1/10 recall by the GRAPH, not the walk. NSW/HNSW papers assume a
connected navigable graph; this module constructs one
deterministically, in three edge families:

1. **knn** — the registered ``knn_graph_lsh`` edges (top-5 in-bucket
   cosine neighbours per vector), symmetric closure.
2. **multiprobe** — for every vector and each of the 4 one-bit-flip
   probe buckets (Lv et al., VLDB'07 multiprobe applied to
   CONSTRUCTION instead of query time), the single best cross-bucket
   neighbour by (cos desc, id asc). These are exactly the
   across-one-hyperplane links sign-LSH blocking cuts — the
   semantically meaningful repairs.
3. **bridge** — whatever components remain after (1)+(2) are joined
   by edges from every component representative (its min vec_id — a
   real node) to the globally minimal representative: a deterministic
   star over component medoids, ``n_components − 1`` edges, proof of
   connectivity by construction AND by a second CC run.

Determinism: buckets are sign bits, ranking is (round(cos, 4) desc,
id asc), component ids are min-node ids — every choice is a total
order both engines reproduce; the DuckDB oracle mirrors the entire
construction including both CC passes (recursive reachability — fine
at oracle scale; the Spark side uses the O(log n)-round
large-star/small-star CC).

Scale shape: multiprobe candidates join per (probe-bucket, salt) —
the same salted-equi-join discipline as ``knn_graph_lsh`` itself,
never all-pairs; CC is the alternating-star loop (logarithmic
rounds, localCheckpoint per round); bridges are |components| rows
crossed with a 1-row global-min frame. Nothing is driver-side.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

import bpaotu_spark.ann.core  # noqa: F401  (registers knn_graph_lsh,
# whose oracle SQL this module splices into CONNECTED_EDGES_SQL at
# import time — without it a direct `import graphconn` KeyErrors)
from bpaotu_spark.catalog import load_table
from bpaotu_spark.dedup.core import (
    COSINE_SQL,
    _EMB_LSH_DIMS,
    _emb_bucket,
    _emb_bucket_sql,
    dot,
    norm,
    star_connected_components,
)
from bpaotu_spark.registry import ORACLES, QUERIES, register

_MP_SALT = 8
_MP_JOIN_PARTS = 64


def _flip_bucket_sql(col: str) -> str:
    """DuckDB: the sign bucket of ``col`` with bit ``p`` flipped
    (``p`` ranges over the probes CTE, 1-based)."""
    cases = []
    for i in range(_EMB_LSH_DIMS):
        base = f"(CASE WHEN {col}.embedding[{i + 1}] >= 0 THEN '1' ELSE '0' END)"
        flip = f"(CASE WHEN {col}.embedding[{i + 1}] >= 0 THEN '0' ELSE '1' END)"
        cases.append(f"(CASE WHEN p = {i + 1} THEN {flip} ELSE {base} END)")
    return " || ".join(cases)


def _connected_ctes() -> str:
    """The shared CTE chain (requires WITH RECURSIVE at the head):
    builds ``e2`` = canonical undirected edges (u < v) of the
    connected graph, plus the intermediate families ``e_knn`` /
    ``e_mp`` / ``bridges`` and the pre-bridge components ``comp1``."""
    return f"""
lshknn AS ({ORACLES["knn_graph_lsh"]}),
probes AS (SELECT unnest([{", ".join(str(i + 1) for i in range(_EMB_LSH_DIMS))}]) AS p),
mp_cand AS (
  SELECT a.vec_id AS src, b.vec_id AS dst, p,
    round({COSINE_SQL}, 4) AS cos_sim
  FROM embeddings a CROSS JOIN probes
  JOIN embeddings b ON {_emb_bucket_sql("b")} = {_flip_bucket_sql("a")}
),
mp_best AS (
  SELECT src, dst FROM (
    SELECT src, dst,
      row_number() OVER (PARTITION BY src, p
                         ORDER BY cos_sim DESC, dst ASC) AS rn
    FROM mp_cand
  ) WHERE rn = 1
),
e_knn AS (
  SELECT DISTINCT least(vec_id, neighbor_id) AS u,
         greatest(vec_id, neighbor_id) AS v
  FROM lshknn
),
e_mp AS (
  -- subquery wrapper: DuckDB's WITH RECURSIVE parser only allows
  -- UNION [ALL] at a CTE's top level, even for non-recursive members
  SELECT u, v FROM (
    SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
    FROM mp_best
    EXCEPT SELECT u, v FROM e_knn
  )
),
e1 AS (SELECT u, v FROM e_knn UNION SELECT u, v FROM e_mp),
sym1 AS (
  SELECT u AS src, v AS dst FROM e1
  UNION SELECT v, u FROM e1
  UNION SELECT vec_id, vec_id FROM embeddings
),
reach1(src, dst) AS (
  SELECT src, dst FROM sym1
  UNION
  SELECT r.src, e.dst FROM reach1 r JOIN sym1 e ON r.dst = e.src
),
comp1 AS (SELECT src AS node, min(dst) AS component FROM reach1 GROUP BY src),
reps AS (SELECT DISTINCT component FROM comp1),
gm AS (SELECT min(component) AS g FROM reps),
bridges AS (
  SELECT g AS u, component AS v FROM reps, gm WHERE component != g
),
e2 AS (SELECT u, v FROM e1 UNION SELECT u, v FROM bridges)
""".strip()


# Directed edge list of the connected graph (both directions), the
# drop-in replacement for the lsh kNN edges in the search oracles.
CONNECTED_EDGES_SQL = f"""
{_connected_ctes()},
conn_edges AS (
  SELECT u AS vec_id, v AS neighbor_id FROM e2
  UNION SELECT v, u FROM e2
)
""".strip()


def _connected_parts(spark: SparkSession, sf_dir: str, alive=None):
    """Spark construction; returns (all_nodes, e_knn, e_mp, bridges,
    comp1, e2) — canonical undirected (u < v) edge frames. ``alive``
    (an optional Column predicate on vec_id) restricts the corpus —
    the survivor-only consolidate REBUILD (r14) is this same
    construction over the post-takedown corpus."""
    from bpaotu_spark.ann.core import knn_graph_from

    emb = (
        load_table(spark, sf_dir, "embeddings")
        .select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        )
        .withColumn("nrm", norm(F.col("v")))
        .withColumn("bucket", _emb_bucket(F.col("v")))
    )
    if alive is not None:
        emb = emb.filter(alive)
    # the kNN layer over the SAME (possibly filtered) corpus — one
    # emb prep shared with the multiprobe layer below (previously the
    # registered op re-prepared an identical frame)
    knn = knn_graph_from(emb).select("vec_id", "neighbor_id")
    e_knn = (
        knn.select(
            F.least("vec_id", "neighbor_id").alias("u"),
            F.greatest("vec_id", "neighbor_id").alias("v"),
        )
        .distinct()
        .localCheckpoint()  # feeds the union, the census AND the CC
    )
    # probe side: 4 one-bit-flip buckets per vector, salted so the
    # 16-key equi-join keeps reduce parallelism (the knn_graph_lsh
    # salting rationale applies unchanged)
    probes = spark.range(1, _EMB_LSH_DIMS + 1).select(
        F.col("id").cast("int").alias("p")
    )
    flip_bits = []
    for i in range(_EMB_LSH_DIMS):
        base = F.when(F.col("v")[i] >= 0, F.lit("1")).otherwise(F.lit("0"))
        flip = F.when(F.col("v")[i] >= 0, F.lit("0")).otherwise(F.lit("1"))
        flip_bits.append(F.when(F.col("p") == i + 1, flip).otherwise(base))
    probe_side = (
        emb.crossJoin(F.broadcast(probes))
        .select(
            F.col("vec_id").alias("src"),
            "p",
            F.col("v").alias("va"),
            F.col("nrm").alias("na"),
            F.concat(*flip_bits).alias("pbucket"),
        )
        .withColumn(
            "salt", F.pmod(F.col("src"), F.lit(_MP_SALT)).cast("int")
        )
        .repartition(_MP_JOIN_PARTS, "pbucket", "salt")
    )
    cand_side = (
        emb.select(
            F.col("vec_id").alias("dst"),
            F.col("bucket").alias("cbucket"),
            F.col("v").alias("vb"),
            F.col("nrm").alias("nb"),
        )
        .withColumn(
            "salt_b",
            F.explode(
                F.array(*[F.lit(i).cast("int") for i in range(_MP_SALT)])
            ),
        )
        .repartition(_MP_JOIN_PARTS, "cbucket", "salt_b")
    )
    # flipped bucket != own bucket, so dst != src is structural. Every
    # Hamming-1 pair surfaces TWICE (once from each side's probe of the
    # same bit) — keep src < dst, fold the cosine ONCE, and mirror the
    # scored row: the interpreted array fold is the dominant cost here
    # and this halves it; cos and the flip position are symmetric, so
    # the per-(src, p) ranking input is identical to the two-sided join
    # (the oracle keeps the two-sided form — same values either way).
    mp_scored = (
        probe_side.join(
            cand_side,
            (F.col("pbucket") == F.col("cbucket"))
            & (F.col("salt") == F.col("salt_b"))
            & (F.col("src") < F.col("dst")),
        )
        .select(
            "src",
            "dst",
            "p",
            F.round(
                dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")),
                4,
            ).alias("cos_sim"),
        )
        # consumed twice below — without this the union duplicates the
        # fold subtree and the halving is lost
        .localCheckpoint()
    )
    mp_cand = mp_scored.unionByName(
        mp_scored.select(
            F.col("dst").alias("src"),
            F.col("src").alias("dst"),
            "p",
            "cos_sim",
        )
    )
    from pyspark.sql import Window

    wmp = Window.partitionBy("src", "p").orderBy(
        F.col("cos_sim").desc(), F.col("dst").asc()
    )
    mp_best = (
        mp_cand.withColumn("rn", F.row_number().over(wmp))
        .filter("rn = 1")
        .select("src", "dst")
    )
    e_mp = (
        mp_best.select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
        )
        .distinct()
        .subtract(e_knn)
        .localCheckpoint()
    )
    e1 = e_knn.unionByName(e_mp)
    labels1 = star_connected_components(e1, "u", "v")
    all_nodes = emb.select(F.col("vec_id").alias("node"))
    # isolated vectors (empty bucket AND empty probe buckets) are
    # their own singleton components
    comp1 = (
        all_nodes.join(labels1, "node", "left")
        .select(
            "node",
            F.coalesce("component", "node").alias("component"),
        )
        .localCheckpoint()
    )
    reps = comp1.select("component").distinct()
    gm = reps.agg(F.min("component").alias("g"))
    bridges = (
        reps.crossJoin(F.broadcast(gm))
        .filter("component != g")
        .select(F.col("g").alias("u"), F.col("component").alias("v"))
        .localCheckpoint()
    )
    e2 = e1.unionByName(bridges)
    return all_nodes, e_knn, e_mp, bridges, comp1, e2


def connected_parts_cached(spark: SparkSession, sf_dir: str):
    """(e_knn, e_mp, bridges, comp1) served through the ANN index
    store (r15): the full-corpus construction is a deterministic
    function of the embeddings table, so its four audit frames get the
    same fingerprint-keyed build-once lifecycle as ``conn_edges`` —
    the census/CC-proof query then READS the build instead of re-
    running it (its from-scratch DuckDB oracle keeps verifying the
    served values every driver round). One cold build fills all four
    artifacts (and the ``holder`` memo means a partially-warm store
    still constructs at most once)."""
    from bpaotu_spark.ann.index_store import cached_frame

    holder: dict[str, tuple] = {}

    def parts() -> tuple:
        if "p" not in holder:
            holder["p"] = _connected_parts(spark, sf_dir)
        return holder["p"]

    e_knn = cached_frame(spark, sf_dir, "conn_eknn", lambda: parts()[1])
    e_mp = cached_frame(spark, sf_dir, "conn_emp", lambda: parts()[2])
    bridges = cached_frame(
        spark, sf_dir, "conn_bridges", lambda: parts()[3]
    )
    comp1 = cached_frame(spark, sf_dir, "conn_comp1", lambda: parts()[4])
    return e_knn, e_mp, bridges, comp1


def connected_search_edges(
    spark: SparkSession, sf_dir: str, alive=None
) -> DataFrame:
    """Directed (vec_id, neighbor_id) edges of the connected graph —
    the substrate ann_greedy/beam_graph_search walk. ``alive``
    restricts the corpus (the consolidate rebuild path — built from
    scratch, never cached). The full-corpus form derives e2 from the
    store-served parts, so one construction per data fingerprint
    feeds BOTH the search substrate and the census query (r15)."""
    if alive is None:
        e_knn, e_mp, bridges, _ = connected_parts_cached(spark, sf_dir)
        e2 = e_knn.unionByName(e_mp).unionByName(bridges)
    else:
        _, _, _, _, _, e2 = _connected_parts(spark, sf_dir, alive=alive)
    return e2.select(
        F.col("u").alias("vec_id"), F.col("v").alias("neighbor_id")
    ).unionByName(
        e2.select(
            F.col("v").alias("vec_id"), F.col("u").alias("neighbor_id")
        )
    )


@register(
    "knn_graph_connected",
    oracle=f"""
WITH RECURSIVE
{_connected_ctes()},
symq AS (
  SELECT u AS src, v AS dst FROM bridges
  UNION SELECT v, u FROM bridges
  UNION SELECT component, component FROM reps
),
reachq(src, dst) AS (
  SELECT src, dst FROM symq
  UNION
  SELECT r.src, e.dst FROM reachq r JOIN symq e ON r.dst = e.src
),
compq AS (SELECT src AS node, min(dst) AS component FROM reachq GROUP BY src),
comp2 AS (
  SELECT c1.node, coalesce(cq.component, c1.component) AS component
  FROM comp1 c1 LEFT JOIN compq cq ON c1.component = cq.node
)
SELECT edge_type, n_edges,
  (SELECT CAST(count(DISTINCT component) AS BIGINT) FROM comp1)
    AS n_components_before_bridges,
  (SELECT CAST(count(DISTINCT component) AS BIGINT) FROM comp2)
    AS n_components_final
FROM (
  SELECT 'knn' AS edge_type,
    (SELECT CAST(count(*) AS BIGINT) FROM e_knn) AS n_edges
  UNION ALL SELECT 'multiprobe',
    (SELECT CAST(count(*) AS BIGINT) FROM e_mp)
  UNION ALL SELECT 'bridge',
    (SELECT CAST(count(*) AS BIGINT) FROM bridges)
)
""",
)
def knn_graph_connected(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edge-family census of the connected kNN graph + the CC proof:
    (edge_type, n_edges, n_components_before_bridges,
    n_components_final) — final must be 1.

    The final count is CC over the QUOTIENT graph (component reps +
    bridge edges, ≤|components| nodes), not a second full-graph pass:
    bridges only ever join whole comp1 components, so contracting each
    component to its rep preserves the component count exactly — the
    proof stays computed (and oracle-mirrored) at ~zero cost instead
    of a second O(log n)-round star CC over every edge.

    STORE-SERVED since r15: the four audit frames are fingerprint-
    keyed index-store artifacts (``connected_parts_cached``) — the
    census reads the persisted build while this oracle recomputes the
    whole construction from scratch, so a stale or corrupted artifact
    fails the driver's hash compare the round it appears (the
    dist_matrix_store_stats trust model)."""
    e_knn, e_mp, bridges, comp1 = connected_parts_cached(spark, sf_dir)
    qlabels = star_connected_components(bridges, "u", "v").select(
        F.col("node").alias("qnode"), F.col("component").alias("qcomp")
    )
    comp2 = comp1.join(
        qlabels, comp1.component == F.col("qnode"), "left"
    ).select(
        "node", F.coalesce("qcomp", "component").alias("component")
    )
    nc1 = comp1.agg(
        F.countDistinct("component")
        .cast("bigint")
        .alias("n_components_before_bridges")
    )
    nc2 = comp2.agg(
        F.countDistinct("component")
        .cast("bigint")
        .alias("n_components_final")
    )
    counts = None
    for name, frame in (
        ("knn", e_knn),
        ("multiprobe", e_mp),
        ("bridge", bridges),
    ):
        leg = frame.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_edges")
        ).select(F.lit(name).alias("edge_type"), "n_edges")
        counts = leg if counts is None else counts.unionByName(leg)
    return counts.crossJoin(F.broadcast(nc1)).crossJoin(F.broadcast(nc2))


# ---------------------------------------------------------------------------
# augment_connected_graph — INCREMENTAL insert into the persisted
# connected graph (index lifecycle, part 2). build_ann_index gives
# build-once/search-many; real deployments also need append-often:
# a new data drop must not re-pay the full multiprobe + CC
# construction over the whole corpus. New vectors connect through the
# SAME candidate discipline the builder used (own sign bucket + the 4
# one-bit-flip probe buckets, Lv et al. VLDB'07), top-k by
# (round(cos,4) desc, id asc), bidirectional edges; a new vector whose
# 5 buckets are all empty falls back to one edge to the global entry
# node (min base vec_id), so connectivity of the augmented graph is
# preserved BY CONSTRUCTION — the pytest re-proves it with a full CC
# run and checks search-substrate parity against a from-scratch build.
#
# Scale shape: the join is (new × probes) equi-joined on bucket
# against the base side salted _MP_SALT ways — candidate work is
# O(|new| · bucket occupancy), never O(|base|²), and the base graph
# is only UNIONED, never recomputed. At 100 TB this is the nightly
# delta job next to the weekly full build.
# ---------------------------------------------------------------------------

_INS_K = 5


def insert_edges(
    spark: SparkSession, sf_dir: str, new_emb: DataFrame, k: int = _INS_K
) -> DataFrame:
    """The INSERT step of the incremental graph build, exposed with
    ranks: ``(src, dst, rn)`` — each new vector's top-``k`` base
    neighbours by (round(cos,4) DESC, dst ASC) through the builder's
    multiprobe sign-bucket candidate discipline, plus a rank-1 edge to
    the global entry node for probe-orphans. ``augment_connected_graph``
    unions these (plus reverses) onto the persisted base edges;
    ``ann_augmented_graph_insert`` verifies THIS frame against the
    DuckDB oracle."""
    base = (
        load_table(spark, sf_dir, "embeddings")
        .select(
            F.col("vec_id").alias("dst"),
            F.col("embedding").cast("array<double>").alias("vb"),
        )
        .withColumn("nb", norm(F.col("vb")))
        .withColumn("cbucket", _emb_bucket(F.col("vb")))
        .withColumn(
            "salt_b",
            F.explode(
                F.array(*[F.lit(i).cast("int") for i in range(_MP_SALT)])
            ),
        )
        .repartition(_MP_JOIN_PARTS, "cbucket", "salt_b")
    )
    new = (
        new_emb.select(
            F.col("vec_id").alias("src"),
            F.col("embedding").cast("array<double>").alias("va"),
        )
        .withColumn("na", norm(F.col("va")))
        .localCheckpoint()
    )
    # probe 0 = the vector's own bucket; probes 1.._EMB_LSH_DIMS flip
    # one sign bit — the builder's candidate discipline, applied to
    # the insert batch only.
    probes = spark.range(0, _EMB_LSH_DIMS + 1).select(
        F.col("id").cast("int").alias("p")
    )
    bits = []
    for i in range(_EMB_LSH_DIMS):
        base_bit = F.when(F.col("va")[i] >= 0, F.lit("1")).otherwise(
            F.lit("0")
        )
        flip_bit = F.when(F.col("va")[i] >= 0, F.lit("0")).otherwise(
            F.lit("1")
        )
        bits.append(
            F.when(F.col("p") == i + 1, flip_bit).otherwise(base_bit)
        )
    new_probe = (
        new.crossJoin(F.broadcast(probes))
        .select("src", "va", "na", F.concat(*bits).alias("pbucket"))
        .distinct()  # probe collisions (own bucket == some flip) dedupe
        .withColumn(
            "salt", F.pmod(F.col("src"), F.lit(_MP_SALT)).cast("int")
        )
        .repartition(_MP_JOIN_PARTS, "pbucket", "salt")
    )
    cand = (
        new_probe.join(
            base,
            (F.col("pbucket") == F.col("cbucket"))
            & (F.col("salt") == F.col("salt_b")),
        )
        # a (src, dst) pair can surface through several probes — score
        # the interpreted fold once per distinct pair
        .select("src", "dst", "va", "na", "vb", "nb")
        .dropDuplicates(["src", "dst"])
        .select(
            "src",
            "dst",
            F.round(
                dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")),
                4,
            ).alias("cos_sim"),
        )
    )
    from pyspark.sql import Window

    wk = Window.partitionBy("src").orderBy(
        F.col("cos_sim").desc(), F.col("dst").asc()
    )
    topk = (
        cand.withColumn("rn", F.row_number().over(wk))
        .filter(F.col("rn") <= k)
        .select("src", "dst", "rn")
        .localCheckpoint()
    )
    # bucket-orphans: every probe bucket empty -> one edge to the
    # global entry node keeps the augmented graph connected
    entry = load_table(spark, sf_dir, "embeddings").agg(
        F.min("vec_id").alias("dst")
    )
    orphans = (
        new.select("src")
        .join(topk.select("src").distinct(), "src", "left_anti")
        .crossJoin(F.broadcast(entry))
        .withColumn("rn", F.lit(1))
    )
    return topk.unionByName(orphans)


def augment_connected_graph(
    spark: SparkSession, sf_dir: str, new_emb: DataFrame, k: int = _INS_K
) -> DataFrame:
    """Directed (vec_id, neighbor_id) edges of the persisted graph
    augmented with ``new_emb`` (vec_id, embedding) — base edges are
    read from the index store, never rebuilt. New vec_ids must be
    disjoint from the base table's."""
    from bpaotu_spark.ann.index_store import connected_edges_cached

    base_edges = connected_edges_cached(spark, sf_dir)
    e_new = insert_edges(spark, sf_dir, new_emb, k).select("src", "dst")
    return base_edges.unionByName(
        e_new.select(
            F.col("src").alias("vec_id"), F.col("dst").alias("neighbor_id")
        )
    ).unionByName(
        e_new.select(
            F.col("dst").alias("vec_id"), F.col("src").alias("neighbor_id")
        )
    )


# ---------------------------------------------------------------------------
# ann_augmented_graph_insert — the INCREMENTAL INSERT step as a
# driver-verified operator (r11 shipped augment_connected_graph with
# pytest evidence only). Both engines construct the same deterministic
# insert batch from the data itself — scaled copies (x0.5) of the
# vec_id < _AUG_N embeddings under shifted ids — so the oracle needs
# no side-channel input: near-duplicate inserts, the realistic nightly
# case, whose rank-1 neighbour should be the original vector
# (is_origin column measures exactly that).
#
# Scale shape: |batch| x (DIMS+1) probe buckets, each a sign-bucket
# equi-join into the base table (n/16 rows per bucket) — delta-bounded
# candidate generation, one bounded window per new node, no base-graph
# reconstruction. The output is |batch| x k rows.
# ---------------------------------------------------------------------------

_AUG_N = 40
_AUG_SHIFT = 1000000


def _aug_flip_bucket_sql() -> str:
    """Sign bucket of the scaled insert vector ``va`` with probe ``p``
    (0 = own bucket, 1..DIMS = flip that bit)."""
    cases = []
    for i in range(_EMB_LSH_DIMS):
        base = f"(CASE WHEN va[{i + 1}] >= 0 THEN '1' ELSE '0' END)"
        flip = f"(CASE WHEN va[{i + 1}] >= 0 THEN '0' ELSE '1' END)"
        cases.append(f"(CASE WHEN p = {i + 1} THEN {flip} ELSE {base} END)")
    return " || ".join(cases)


@register(
    "ann_augmented_graph_insert",
    oracle=f"""
WITH newv AS (
  SELECT vec_id + {_AUG_SHIFT} AS src,
    list_transform(CAST(embedding AS DOUBLE[]), x -> x * 0.5) AS va
  FROM embeddings WHERE vec_id < {_AUG_N}
),
probes AS (SELECT unnest([{", ".join(str(i) for i in range(_EMB_LSH_DIMS + 1))}]) AS p),
np AS (
  SELECT DISTINCT src, va, {_aug_flip_bucket_sql()} AS pbucket
  FROM newv CROSS JOIN probes
),
cand AS (
  SELECT DISTINCT np.src, b.vec_id AS dst, np.va,
    CAST(b.embedding AS DOUBLE[]) AS vb
  FROM np JOIN embeddings b ON {_emb_bucket_sql("b")} = np.pbucket
),
scored AS (
  SELECT src, dst,
    round(list_dot_product(va, vb)
      / (sqrt(list_dot_product(va, va)) * sqrt(list_dot_product(vb, vb))),
      4) AS cos_sim
  FROM cand
),
topk AS (
  SELECT src, dst, rn FROM (
    SELECT src, dst,
      row_number() OVER (PARTITION BY src
                         ORDER BY cos_sim DESC, dst ASC) AS rn
    FROM scored
  ) WHERE rn <= {_INS_K}
),
orphans AS (
  SELECT n.src, (SELECT min(vec_id) FROM embeddings) AS dst, 1 AS rn
  FROM newv n WHERE n.src NOT IN (SELECT src FROM topk)
),
ins AS (SELECT * FROM topk UNION ALL SELECT * FROM orphans)
SELECT src AS new_id, CAST(rn AS BIGINT) AS rank, dst AS neighbor_id,
  (dst = src - {_AUG_SHIFT}) AS is_origin
FROM ins ORDER BY new_id, rank
""",
)
def ann_augmented_graph_insert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental graph insert, driver-verified: scaled near-duplicate
    copies of the first {_AUG_N} vectors are inserted through the
    multiprobe candidate discipline; output (new_id, rank, neighbor_id,
    is_origin) — is_origin marks the edge landing on the insert's own
    original, the recall signal of a near-duplicate insert."""
    new_emb = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < _AUG_N)
        .select(
            (F.col("vec_id") + _AUG_SHIFT).alias("vec_id"),
            F.transform(
                F.col("embedding").cast("array<double>"),
                lambda x: x * 0.5,
            ).alias("embedding"),
        )
    )
    edges = insert_edges(spark, sf_dir, new_emb, k=_INS_K)
    return (
        edges.select(
            F.col("src").alias("new_id"),
            F.col("rn").cast("bigint").alias("rank"),
            F.col("dst").alias("neighbor_id"),
            (F.col("dst") == F.col("src") - _AUG_SHIFT).alias("is_origin"),
        )
        .orderBy("new_id", "rank")
    )

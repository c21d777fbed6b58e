"""Graph analytics over the k-NN similarity graph + event-stream audits.

* ``knn_triangle_count`` — distributed triangle counting and local
  clustering coefficients on the LSH-blocked k-NN graph (the
  community-structure signal on an embedding corpus: high clustering
  = tight semantic clusters, the input for cluster-aware sampling).
  Composes the registered ``knn_graph_lsh`` oracle so graph and
  count can never drift.
* ``species_accumulation_curve`` — gamma-diversity accumulation: how
  many distinct OTUs have appeared after the first k samples
  (collector's curve — the "have we sequenced enough samples"
  diagnostic, the across-sample sibling of rarefaction_curve).
* ``rapid_fire_users`` — burst detector: users with ≥5 events inside
  any 6-hour span (lag(ts, 4) sliding check — the bot/abuse
  rate-limit audit; thresholds sized to this stream's baseline
  cadence, where the tightest observed 5-event span is ~3.5 h, so
  the audit actually separates bursty users from the baseline).

Scale shapes: triangles = two shuffle joins over an edge list that is
≤k rows per node by construction (never quadratic); accumulation =
per-OTU min + one window over the SAMPLE dimension (bounded by the
customer dim, not the fact table); bursts = one user-partitioned
window, map-side nothing crosses users.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bpaotu_spark.catalog import load_table
from bpaotu_spark.operators.bpaotu import ABUNDANCE_CTE, abundance
from bpaotu_spark.registry import ORACLES, register

import bpaotu_spark.ann.core  # noqa: F401  (registers knn_graph_lsh's oracle)

# ---------------------------------------------------------------------------
# knn_triangle_count
# ---------------------------------------------------------------------------


def _triangle_oracle() -> str:
    return f"""
WITH knn AS ({ORACLES["knn_graph_lsh"]}),
edges AS (
  SELECT DISTINCT least(vec_id, neighbor_id) AS a,
         greatest(vec_id, neighbor_id) AS b
  FROM knn
),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM edges e1
  JOIN edges e2 ON e1.b = e2.a
  JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b
),
tri_nodes AS (
  SELECT x AS node FROM tri
  UNION ALL SELECT y FROM tri
  UNION ALL SELECT z FROM tri
),
tcnt AS (
  SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
  FROM tri_nodes GROUP BY node
),
deg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS degree FROM (
    SELECT a AS node FROM edges UNION ALL SELECT b FROM edges
  ) GROUP BY node
)
SELECT deg.node AS vec_id, degree,
  coalesce(n_triangles, 0) AS n_triangles,
  (coalesce(n_triangles, 0) * 2000000) // (degree * (degree - 1))
    AS clustering_ppm
FROM deg LEFT JOIN tcnt ON deg.node = tcnt.node
WHERE degree >= 2
"""


@register("knn_triangle_count", oracle=_triangle_oracle())
def knn_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bpaotu_spark.ann.core import knn_graph_lsh

    knn = knn_graph_lsh(spark, sf_dir)
    # canonical undirected edges; materialized once — three self-join
    # consumers below (the standard edge-list checkpoint for triangle
    # enumeration)
    edges = (
        knn.select(
            F.least("vec_id", "neighbor_id").alias("a"),
            F.greatest("vec_id", "neighbor_id").alias("b"),
        )
        .distinct()
        .localCheckpoint()
    )
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.b") == F.col("e2.a"))
        .join(
            e3,
            (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")),
        )
        .select(
            F.col("e1.a").alias("x"),
            F.col("e1.b").alias("y"),
            F.col("e2.b").alias("z"),
        )
    )
    tri_nodes = (
        tri.select(F.col("x").alias("node"))
        .unionAll(tri.select(F.col("y").alias("node")))
        .unionAll(tri.select(F.col("z").alias("node")))
    )
    tcnt = tri_nodes.groupBy("node").agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
    deg = (
        edges.select(F.col("a").alias("node"))
        .unionAll(edges.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    return (
        deg.join(tcnt, "node", "left")
        .filter(F.col("degree") >= 2)
        .select(
            F.col("node").alias("vec_id"),
            "degree",
            F.coalesce("n_triangles", F.lit(0)).alias("n_triangles"),
            F.expr(
                "(coalesce(n_triangles, 0) * 2000000)"
                " div (degree * (degree - 1))"
            ).alias("clustering_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# species_accumulation_curve
# ---------------------------------------------------------------------------


@register(
    "species_accumulation_curve",
    oracle=f"""
WITH {ABUNDANCE_CTE},
first_seen AS (
  SELECT otu_id, CAST(min(sample_id) AS BIGINT) AS first_sample
  FROM abundance GROUP BY otu_id
),
new_per_sample AS (
  SELECT first_sample AS sample_id, CAST(count(*) AS BIGINT) AS n_new_otus
  FROM first_seen GROUP BY first_sample
),
gamma AS (
  SELECT CAST(count(*) AS BIGINT) AS total_otus FROM first_seen
)
SELECT sample_id, n_new_otus,
  CAST(sum(n_new_otus) OVER (ORDER BY sample_id) AS BIGINT) AS cum_otus,
  (CAST(sum(n_new_otus) OVER (ORDER BY sample_id) AS BIGINT) * 1000000)
    // total_otus AS cum_share_ppm
FROM new_per_sample, gamma
""",
)
def species_accumulation_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    first_seen = (
        abundance(spark, sf_dir)
        .groupBy("otu_id")
        .agg(F.min("sample_id").cast("bigint").alias("first_sample"))
    )
    new_per_sample = first_seen.groupBy(
        F.col("first_sample").alias("sample_id")
    ).agg(F.count(F.lit(1)).alias("n_new_otus"))
    gamma = first_seen.agg(F.count(F.lit(1)).alias("total_otus"))
    # the cumulative window runs over ≤|samples| post-agg rows (the
    # customer dimension), the documented value-bounded window class
    w = Window.orderBy("sample_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        new_per_sample.crossJoin(F.broadcast(gamma))
        .withColumn("cum_otus", F.sum("n_new_otus").over(w).cast("bigint"))
        .select(
            "sample_id",
            "n_new_otus",
            "cum_otus",
            F.expr("(cum_otus * 1000000) div total_otus").alias(
                "cum_share_ppm"
            ),
        )
    )


# ---------------------------------------------------------------------------
# rapid_fire_users
# ---------------------------------------------------------------------------

_BURST_N = 5  # events
_BURST_SPAN_US = 21_600_000_000  # inside 6 hours


@register(
    "rapid_fire_users",
    oracle=f"""
WITH g AS (
  SELECT user_id,
    epoch_us(ts) - lag(epoch_us(ts), {_BURST_N - 1}) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
    ) AS span_us
  FROM events
)
SELECT user_id,
  CAST(count(*) AS BIGINT) AS n_events,
  CAST(sum(CASE WHEN span_us <= {_BURST_SPAN_US} THEN 1 ELSE 0 END)
    AS BIGINT) AS n_burst_windows,
  CAST(min(span_us) AS BIGINT) AS tightest_span_us
FROM g
GROUP BY user_id
HAVING sum(CASE WHEN span_us <= {_BURST_SPAN_US} THEN 1 ELSE 0 END) > 0
""",
)
def rapid_fire_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = ev.select(
        "user_id",
        (
            F.unix_micros("ts")
            - F.lag(F.unix_micros("ts"), _BURST_N - 1).over(w)
        ).alias("span_us"),
    )
    return (
        g.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.when(F.col("span_us") <= _BURST_SPAN_US, 1).otherwise(0)
            ).alias("n_burst_windows"),
            F.min("span_us").alias("tightest_span_us"),
        )
        .filter(F.col("n_burst_windows") > 0)
    )


# ---------------------------------------------------------------------------
# knn_degree_assortativity — Newman (2002) degree assortativity of the
# LSH-blocked kNN similarity graph: do well-connected vectors link to
# other well-connected vectors (r > 0, hub-clustered embedding space)
# or to sparse ones (r < 0, hub-and-spoke)? The structural health
# metric for graph-based dedup/retrieval built on the kNN edges —
# assortative hubs mean LSH buckets carry redundant near-duplicate
# mass.
#
# Composes the REGISTERED knn_graph_lsh (Spark frame and oracle CTE
# alike), collapses to undirected edges, and computes the Pearson
# correlation of endpoint degrees over both orientations. Degrees are
# small integers, so the moments are exact BIGINT; the only negative
# quantity (the covariance numerator) is split by sign before floor
# division, sidestepping the DuckDB-floor vs Spark-truncate divergence
# on negatives.
#
# Scale shape: edge table is ≤ k·|vectors| rows; degree is a
# map-combined groupBy; the moment reduce is a 1-row aggregate.
# ---------------------------------------------------------------------------


@register(
    "knn_degree_assortativity",
    oracle=f"""
WITH knn AS ({ORACLES["knn_graph_lsh"]}),
ue AS (
  SELECT DISTINCT least(vec_id, neighbor_id) AS a,
         greatest(vec_id, neighbor_id) AS b
  FROM knn
),
deg AS (
  SELECT v, CAST(count(*) AS BIGINT) AS d
  FROM (SELECT a AS v FROM ue UNION ALL SELECT b AS v FROM ue)
  GROUP BY v
),
ed AS (
  SELECT da.d AS dx, db.d AS dy
  FROM ue JOIN deg da ON da.v = ue.a JOIN deg db ON db.v = ue.b
),
sym AS (
  SELECT dx AS x, dy AS y FROM ed
  UNION ALL SELECT dy AS x, dx AS y FROM ed
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
    CAST(sum(x) AS BIGINT) AS sx,
    CAST(sum(x * x) AS BIGINT) AS sxx,
    CAST(sum(x * y) AS BIGINT) AS sxy
  FROM sym
)
SELECT n // 2 AS n_edges,
  (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_nodes,
  (sx * 1000) // n AS mean_degree_milli,
  CASE WHEN n * sxx - sx * sx = 0 THEN CAST(NULL AS BIGINT)
       WHEN n * sxy - sx * sx >= 0 THEN
         ((n * sxy - sx * sx) * 1000) // (n * sxx - sx * sx)
       ELSE -(((sx * sx - n * sxy) * 1000) // (n * sxx - sx * sx))
  END AS assortativity_milli
FROM m
""",
)
def knn_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bpaotu_spark.registry import QUERIES

    knn = QUERIES["knn_graph_lsh"](spark, sf_dir)
    ue = (
        knn.select(
            F.least("vec_id", "neighbor_id").alias("a"),
            F.greatest("vec_id", "neighbor_id").alias("b"),
        )
        .distinct()
        .localCheckpoint()  # feeds degree AND the edge join: one LSH pass
    )
    deg = (
        ue.select(F.col("a").alias("v"))
        .unionByName(ue.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    )
    da = deg.select(F.col("v").alias("a"), F.col("d").alias("dx"))
    db = deg.select(F.col("v").alias("b"), F.col("d").alias("dy"))
    ed = ue.join(da, "a").join(db, "b").select("dx", "dy")
    sym = ed.select(F.col("dx").alias("x"), F.col("dy").alias("y")).unionByName(
        ed.select(F.col("dy").alias("x"), F.col("dx").alias("y"))
    )
    m = sym.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n_nodes = deg.agg(F.count(F.lit(1)).alias("n_nodes"))
    return m.crossJoin(F.broadcast(n_nodes)).select(
        F.expr("n div 2").alias("n_edges"),
        "n_nodes",
        F.expr("(sx * 1000) div n").alias("mean_degree_milli"),
        F.expr(
            "CASE WHEN n * sxx - sx * sx = 0 THEN CAST(NULL AS BIGINT)"
            " WHEN n * sxy - sx * sx >= 0 THEN"
            "   ((n * sxy - sx * sx) * 1000) div (n * sxx - sx * sx)"
            " ELSE -(((sx * sx - n * sxy) * 1000) div (n * sxx - sx * sx))"
            " END"
        ).alias("assortativity_milli"),
    )


# ---------------------------------------------------------------------------
# knn_reciprocity — share of directed kNN edges that are MUTUAL
# (i ∈ kNN(j) and j ∈ kNN(i)). Mutual-kNN is the standard edge filter
# before density clustering / dedup on a kNN graph (one-sided edges
# are mostly hub artifacts); the reciprocity rate says how much of
# the graph survives that filter — the go/no-go number for
# mutual-kNN-based pipelines, complementing knn_degree_assortativity.
#
# Scale shape: the kNN edge table (≤ k·|vectors| rows) self-joined on
# the REVERSED key pair — an equi join on (src, dst) = (dst, src),
# shuffle-bounded by the edge table; the rollup is a 1-row aggregate.
# ---------------------------------------------------------------------------


@register(
    "knn_reciprocity",
    oracle=f"""
WITH knn AS ({ORACLES["knn_graph_lsh"]}),
e AS (SELECT vec_id AS src, neighbor_id AS dst FROM knn),
m AS (
  SELECT a.src, a.dst
  FROM e a JOIN e b ON a.src = b.dst AND a.dst = b.src
)
SELECT
  (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_directed,
  CAST(count(*) AS BIGINT) AS n_mutual_directed,
  CAST(count(*) AS BIGINT) // 2 AS n_mutual_pairs,
  CAST(count(*) AS BIGINT) * 1000000
    // (SELECT CAST(count(*) AS BIGINT) FROM e) AS reciprocity_ppm
FROM m
""",
)
def knn_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bpaotu_spark.registry import QUERIES

    e = (
        QUERIES["knn_graph_lsh"](spark, sf_dir)
        .select(F.col("vec_id").alias("src"), F.col("neighbor_id").alias("dst"))
        .localCheckpoint()  # one LSH pass feeds both join sides + count
    )
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    m = e.join(rev, ["src", "dst"])
    n_dir = e.agg(F.count(F.lit(1)).alias("n_directed"))
    return (
        m.agg(F.count(F.lit(1)).cast("bigint").alias("n_mutual_directed"))
        .crossJoin(F.broadcast(n_dir))
        .select(
            "n_directed",
            "n_mutual_directed",
            F.expr("n_mutual_directed div 2").alias("n_mutual_pairs"),
            F.expr(
                "n_mutual_directed * 1000000 div n_directed"
            ).alias("reciprocity_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# knn_graph_components — connected components of the (undirected) k-NN
# graph + component-size spectrum: the cluster census SemDeDup-style
# curation reads before sampling (a giant component means the bucket
# width is too coarse; many singletons mean it is too fine). Reuses
# the dedup family's alternating large-star/small-star CC (O(log n)
# rounds regardless of diameter) on the registered knn_graph_lsh
# edges, and the oracle embeds that operator's oracle as a CTE, so
# graph and census can never drift.
#
# Output is the SIZE SPECTRUM (component_size, n_components,
# n_vectors), not per-node labels — bounded rows, scalar columns. The
# oracle's recursive reachability is O(n·|component|) pairs, viable at
# oracle scale; the Spark side stays logarithmic at any scale.
# ---------------------------------------------------------------------------


@register(
    "knn_graph_components",
    oracle=f"""
WITH RECURSIVE knn AS ({ORACLES['knn_graph_lsh']}),
edges AS (
  SELECT vec_id AS src, neighbor_id AS dst FROM knn
  UNION SELECT neighbor_id, vec_id FROM knn
  UNION SELECT vec_id, vec_id FROM knn
  UNION SELECT neighbor_id, neighbor_id FROM knn
),
reach(src, dst) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
),
comp AS (SELECT src AS vec_id, min(dst) AS component FROM reach GROUP BY src),
sizes AS (
  SELECT component, CAST(count(*) AS BIGINT) AS component_size
  FROM comp GROUP BY component
)
SELECT component_size,
  CAST(count(*) AS BIGINT) AS n_components,
  CAST(sum(component_size) AS BIGINT) AS n_vectors
FROM sizes GROUP BY component_size
""",
)
def knn_graph_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Component-size spectrum of the undirected k-NN graph."""
    from bpaotu_spark.ann.core import knn_graph_lsh
    from bpaotu_spark.dedup.core import star_connected_components

    edges = knn_graph_lsh(spark, sf_dir).select("vec_id", "neighbor_id")
    labels = star_connected_components(edges, "vec_id", "neighbor_id")
    sizes = labels.groupBy("component").agg(
        F.count(F.lit(1)).cast("bigint").alias("component_size")
    )
    return sizes.groupBy("component_size").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_components"),
        F.sum("component_size").cast("bigint").alias("n_vectors"),
    )


# ---------------------------------------------------------------------------
# knn_vote_accuracy — leave-one-out k-NN classifier accuracy on the
# labeled embedding corpus: each vector's label is predicted by
# MAJORITY VOTE among its kNN-graph neighbors (count desc, label asc
# tie-break — a total order), scored against its own label, reported
# per true label. The embedding-quality eval that catches what
# centroid_assignment_accuracy (nearest-centroid) misses: locally
# consistent but globally smeared label regions vote correctly while
# their centroid drifts. Composes the registered knn_graph_lsh oracle.
#
# Scale shape: one broadcast label join onto the ≤k-per-node edge
# list, one (node, label) count aggregation, one node-partitioned
# argmax window — all bounded by |edges| = k·n.
# ---------------------------------------------------------------------------


@register(
    "knn_vote_accuracy",
    oracle=f"""
WITH knn AS ({ORACLES['knn_graph_lsh']}),
lab AS (SELECT vec_id, CAST(label AS BIGINT) AS label FROM embeddings),
votes AS (
  SELECT knn.vec_id, nl.label AS vote_label,
    CAST(count(*) AS BIGINT) AS n_votes
  FROM knn JOIN lab nl ON knn.neighbor_id = nl.vec_id
  GROUP BY 1, 2
),
pred AS (
  SELECT vec_id, vote_label FROM votes
  QUALIFY row_number() OVER (PARTITION BY vec_id
    ORDER BY n_votes DESC, vote_label ASC) = 1
)
SELECT ol.label AS true_label,
  CAST(count(*) AS BIGINT) AS n_vectors,
  CAST(sum(CASE WHEN pred.vote_label = ol.label THEN 1 ELSE 0 END)
    AS BIGINT) AS n_correct,
  CAST(sum(CASE WHEN pred.vote_label = ol.label THEN 1 ELSE 0 END)
    AS BIGINT) * 1000000 // count(*) AS accuracy_ppm
FROM pred JOIN lab ol ON pred.vec_id = ol.vec_id
GROUP BY ol.label
""",
)
def knn_vote_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label leave-one-out kNN majority-vote accuracy."""
    from bpaotu_spark.ann.core import knn_graph_lsh

    lab = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("label").cast("bigint").alias("label")
    )
    edges = knn_graph_lsh(spark, sf_dir).select("vec_id", "neighbor_id")
    votes = (
        edges.join(
            F.broadcast(
                lab.select(
                    F.col("vec_id").alias("neighbor_id"),
                    F.col("label").alias("vote_label"),
                )
            ),
            "neighbor_id",
        )
        .groupBy("vec_id", "vote_label")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_votes"))
    )
    wv = Window.partitionBy("vec_id").orderBy(
        F.col("n_votes").desc(), F.col("vote_label").asc()
    )
    pred = (
        votes.withColumn("rn", F.row_number().over(wv))
        .filter(F.col("rn") == 1)
        .select("vec_id", "vote_label")
    )
    return (
        pred.join(F.broadcast(lab), "vec_id")
        .groupBy(F.col("label").alias("true_label"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
            F.sum(
                F.when(F.col("vote_label") == F.col("label"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_correct"),
        )
        .withColumn(
            "accuracy_ppm", F.expr("n_correct * 1000000 div n_vectors")
        )
    )

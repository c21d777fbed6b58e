"""Spatial range search over the map plane.

Reference parity: the reference's map search (public paths
``bpaotu/otu/views.py`` map endpoints) selects samples near a point;
``map_binning_2d`` / ``map_tiles_pyramid`` already cover the raster
layer. This adds the vector layer — a radius query — as a GRID-BLOCKED
join, the canonical spatial-join shape at scale (candidates come from
the query's cell and its 8 neighbours, never a full scan per query).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bpaotu_spark.catalog import load_table
from bpaotu_spark.registry import register

# Same plane and bin widths as map_binning_2d (operators/bpaotu.py):
# x = c_acctbal / 1000, y = o_totalprice / 50000, so milli-cell
# coordinates are floor(c_acctbal) and floor(o_totalprice / 50).
_RX = 1000.0
_RY = 50000.0
_N_CENTERS = 8
_R_MILLI = 1000  # radius = 1.0 cell in normalized (elliptical) units

# ---------------------------------------------------------------------------
# map_radius_search — the densest _N_CENTERS grid cells become query
# centers (deterministic: n desc, bin_x, bin_y); every point within
# normalized radius 1.0 of a center (elliptical — each axis scaled by
# its bin width) is aggregated per center. Distances compare in
# integer MILLI-cells ((dx² + dy²) ≤ 1000²), derived from the same
# double floors both engines share, so the hit set is exact.
#
# Scale shape: one fact scan bins the points (map-side combine for
# the density census); centers are 8 rows exploded to 72 neighbour
# cells and BROADCAST into an equi-join on (cell_x, cell_y) — each
# point meets only the centers adjacent to its cell. Radius 1.0 cell
# ⇒ ±1 neighbourhood provably covers the ball (centers sit at cell
# centroids). No cross join, no per-query scan.
# ---------------------------------------------------------------------------


@register(
    "map_radius_search",
    oracle=f"""
WITH pts AS (
  SELECT
    CAST(floor(c_acctbal / {_RX}) AS BIGINT) AS bin_x,
    CAST(floor(o_totalprice / {_RY}) AS BIGINT) AS bin_y,
    CAST(floor(c_acctbal) AS BIGINT) AS nx_milli,
    CAST(floor(o_totalprice / 50.0) AS BIGINT) AS ny_milli,
    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders JOIN customer ON o_custkey = c_custkey
),
cells AS (
  SELECT bin_x, bin_y, CAST(count(*) AS BIGINT) AS n
  FROM pts GROUP BY bin_x, bin_y
),
centers AS (
  SELECT bin_x, bin_y, n,
    CAST(row_number() OVER (ORDER BY n DESC, bin_x, bin_y) AS BIGINT)
      AS center_id
  FROM cells
  QUALIFY row_number() OVER (ORDER BY n DESC, bin_x, bin_y)
    <= {_N_CENTERS}
),
neigh AS (
  SELECT c.center_id, c.bin_x, c.bin_y,
    c.bin_x * 1000 + 500 AS cnx, c.bin_y * 1000 + 500 AS cny,
    c.bin_x + dx.d AS cell_x, c.bin_y + dy.d AS cell_y
  FROM centers c
  CROSS JOIN (SELECT unnest([-1, 0, 1]) AS d) dx
  CROSS JOIN (SELECT unnest([-1, 0, 1]) AS d) dy
),
hits AS (
  SELECT n.center_id, n.bin_x, n.bin_y, p.cents
  FROM pts p JOIN neigh n
    ON p.bin_x = n.cell_x AND p.bin_y = n.cell_y
  WHERE (p.nx_milli - n.cnx) * (p.nx_milli - n.cnx)
      + (p.ny_milli - n.cny) * (p.ny_milli - n.cny)
      <= {_R_MILLI * _R_MILLI}
)
SELECT center_id, bin_x, bin_y,
  CAST(count(*) AS BIGINT) AS n_in_radius,
  CAST(sum(cents) AS BIGINT) AS cents_in_radius
FROM hits
GROUP BY center_id, bin_x, bin_y
ORDER BY center_id
""",
)
def map_radius_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius-1.0-cell query around the 8 densest grid cells:
    (center_id, bin_x, bin_y, n_in_radius, cents_in_radius) via a
    grid-blocked broadcast join — never a per-query scan."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    pts = orders.join(
        cust, orders.o_custkey == cust.c_custkey
    ).select(
        F.floor(F.col("c_acctbal") / _RX).cast("bigint").alias("bin_x"),
        F.floor(F.col("o_totalprice") / _RY).cast("bigint").alias("bin_y"),
        F.floor(F.col("c_acctbal")).cast("bigint").alias("nx_milli"),
        F.floor(F.col("o_totalprice") / 50.0)
        .cast("bigint")
        .alias("ny_milli"),
        F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    cells = pts.groupBy("bin_x", "bin_y").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    wc = Window.orderBy(
        F.col("n").desc(), F.col("bin_x").asc(), F.col("bin_y").asc()
    )
    centers = (
        cells.withColumn("center_id", F.row_number().over(wc).cast("bigint"))
        .filter(F.col("center_id") <= _N_CENTERS)
    )
    d3 = F.array(F.lit(-1), F.lit(0), F.lit(1))
    neigh = (
        centers.select(
            "center_id",
            F.col("bin_x").alias("c_bin_x"),
            F.col("bin_y").alias("c_bin_y"),
        )
        # map-only 9x fan-out — no join for the neighbour offsets
        .withColumn("dx", F.explode(d3))
        .withColumn("dy", F.explode(d3))
        .select(
            "center_id",
            "c_bin_x",
            "c_bin_y",
            (F.col("c_bin_x") * 1000 + 500).alias("cnx"),
            (F.col("c_bin_y") * 1000 + 500).alias("cny"),
            (F.col("c_bin_x") + F.col("dx")).alias("cell_x"),
            (F.col("c_bin_y") + F.col("dy")).alias("cell_y"),
        )
    )
    hits = pts.join(
        F.broadcast(neigh),
        (pts.bin_x == neigh.cell_x) & (pts.bin_y == neigh.cell_y),
    ).filter(
        (F.col("nx_milli") - F.col("cnx"))
        * (F.col("nx_milli") - F.col("cnx"))
        + (F.col("ny_milli") - F.col("cny"))
        * (F.col("ny_milli") - F.col("cny"))
        <= _R_MILLI * _R_MILLI
    )
    return (
        hits.groupBy(
            "center_id",
            F.col("c_bin_x").alias("bin_x"),
            F.col("c_bin_y").alias("bin_y"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_in_radius"),
            F.sum("cents").cast("bigint").alias("cents_in_radius"),
        )
        .orderBy("center_id")
    )

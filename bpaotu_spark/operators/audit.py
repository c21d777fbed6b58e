"""Data-quality and shuffle-health audits.

The two audits every warehouse runs before trusting a 100 TB fact
table (reference analogue: the importer's validation pass in
bpaotu/otu/importer.py, generalized to fact-vs-rollup consistency):

* ``order_price_reconciliation`` — does the denormalized
  ``o_totalprice`` equal the lineitem recomputation
  Σ extendedprice·(1−discount)·(1+tax)?  Reports the relative-error
  distribution (5 %-wide ppm buckets) plus orphan orders with no
  lineitems. On this synthetic data the invariant is deliberately
  violated — the audit's job is to SAY so, with exact counts.
* ``join_skew_audit`` — per candidate join key of the fact table:
  key multiplicity profile (max / mean / skew factor) and the hottest
  key. The pre-flight check that decides between a plain shuffle
  join, AQE skew handling, or an explicit salt.

Float determinism: every money product is floored to integer cents
PER ROW before any sum (a parallel double sum's rounding depends on
partition order; an integer sum does not).

Scale shape: one fact scan each; the reconciliation joins the orders
dim on the already-aggregated per-order cents (shuffle on o_orderkey,
both sides pre-reduced); the skew audit explodes 3 tagged keys and
aggregates with map-side combine — hottest-key extraction is a
max-of-struct, never a sort.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bpaotu_spark.catalog import load_table
from bpaotu_spark.registry import register

# ---------------------------------------------------------------------------
# order_price_reconciliation
# ---------------------------------------------------------------------------


@register(
    "order_price_reconciliation",
    oracle="""
WITH rec AS (
  SELECT l_orderkey,
    CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax)
      * 100) AS BIGINT)) AS BIGINT) AS recon_cents
  FROM lineitem GROUP BY l_orderkey
),
j AS (
  SELECT o_orderkey,
    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS o_cents,
    recon_cents
  FROM orders LEFT JOIN rec ON o_orderkey = l_orderkey
),
b AS (
  SELECT
    CASE WHEN recon_cents IS NULL THEN 999
         ELSE greatest(-10, least(10,
           ((o_cents - recon_cents) * 1000000 // o_cents) // 50000))
    END AS rel_err_bucket,
    o_cents, coalesce(recon_cents, 0) AS recon_cents
  FROM j
)
SELECT rel_err_bucket,
  CAST(count(*) AS BIGINT) AS n_orders,
  CAST(sum(o_cents) AS BIGINT) AS sum_o_cents,
  CAST(sum(o_cents - recon_cents) AS BIGINT) AS sum_diff_cents
FROM b GROUP BY rel_err_bucket
""",
)
def order_price_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    rec = (
        li.select(
            "l_orderkey",
            F.floor(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax"))
                * 100
            )
            .cast("bigint")
            .alias("line_cents"),
        )
        .groupBy("l_orderkey")
        .agg(F.sum("line_cents").alias("recon_cents"))
    )
    od = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100 + 0.5)
        .cast("bigint")
        .alias("o_cents"),
    )
    j = od.join(rec, od.o_orderkey == rec.l_orderkey, "left")
    b = j.select(
        F.when(F.col("recon_cents").isNull(), 999)
        .otherwise(
            F.greatest(
                F.lit(-10),
                F.least(
                    F.lit(10),
                    F.expr(
                        "((o_cents - recon_cents) * 1000000 div o_cents)"
                        " div 50000"
                    ),
                ),
            )
        )
        .cast("bigint")
        .alias("rel_err_bucket"),
        "o_cents",
        F.coalesce("recon_cents", F.lit(0)).alias("recon_cents"),
    )
    return b.groupBy("rel_err_bucket").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("o_cents").alias("sum_o_cents"),
        F.sum(F.col("o_cents") - F.col("recon_cents")).alias(
            "sum_diff_cents"
        ),
    )


# ---------------------------------------------------------------------------
# join_skew_audit
# ---------------------------------------------------------------------------


@register(
    "join_skew_audit",
    oracle="""
WITH tagged AS (
  SELECT 'l_orderkey' AS key_name, l_orderkey AS key_val FROM lineitem
  UNION ALL
  SELECT 'l_partkey', l_partkey FROM lineitem
  UNION ALL
  SELECT 'l_suppkey', l_suppkey FROM lineitem
),
mult AS (
  SELECT key_name, key_val, CAST(count(*) AS BIGINT) AS m
  FROM tagged GROUP BY key_name, key_val
),
st AS (
  SELECT key_name,
    CAST(sum(m) AS BIGINT) AS n_rows,
    CAST(count(*) AS BIGINT) AS n_keys,
    CAST(max(m) AS BIGINT) AS max_mult
  FROM mult GROUP BY key_name
),
hot AS (
  SELECT mult.key_name, CAST(max(key_val) AS BIGINT) AS hottest_key
  FROM mult JOIN st ON mult.key_name = st.key_name AND m = max_mult
  GROUP BY mult.key_name
)
SELECT st.key_name, n_rows, n_keys, max_mult,
  (n_rows * 1000) // n_keys AS avg_mult_milli,
  (max_mult * 1000000 * n_keys) // n_rows AS skew_factor_ppm,
  hottest_key
FROM st JOIN hot ON st.key_name = hot.key_name
""",
)
def join_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    tagged = li.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("l_orderkey").alias("key_name"),
                    F.col("l_orderkey").alias("key_val"),
                ),
                F.struct(
                    F.lit("l_partkey").alias("key_name"),
                    F.col("l_partkey").alias("key_val"),
                ),
                F.struct(
                    F.lit("l_suppkey").alias("key_name"),
                    F.col("l_suppkey").alias("key_val"),
                ),
            )
        ).alias("t")
    ).select("t.key_name", "t.key_val")
    mult = tagged.groupBy("key_name", "key_val").agg(
        F.count(F.lit(1)).alias("m")
    )
    st = mult.groupBy("key_name").agg(
        F.sum("m").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("m").alias("max_mult"),
    )
    # hottest key: max key_val among keys at max multiplicity — a
    # deterministic tie-break without sorting the multiplicity table
    hot = (
        mult.join(
            F.broadcast(st.select("key_name", "max_mult")), "key_name"
        )
        .filter(F.col("m") == F.col("max_mult"))
        .groupBy("key_name")
        .agg(F.max("key_val").cast("bigint").alias("hottest_key"))
    )
    return (
        st.join(hot, "key_name")
        .select(
            "key_name",
            "n_rows",
            "n_keys",
            "max_mult",
            F.expr("(n_rows * 1000) div n_keys").alias("avg_mult_milli"),
            F.expr("(max_mult * 1000000 * n_keys) div n_rows").alias(
                "skew_factor_ppm"
            ),
            "hottest_key",
        )
    )


# ---------------------------------------------------------------------------
# bloom_sizing_advisor — for each candidate join key of the fact
# table: the Bloom-filter geometry a runtime-filter pass should use at
# 1% target false-positive rate. m/n = ln(1/p)/ln²2 = 9.585059 bits
# per key and k = round(m/n·ln2) = 7 hashes — the two irrational
# constants enter once as integer-scaled literals, so the advisory is
# engine-exact. Pairs with bloom_semijoin_filter (the filter itself)
# and join_skew_audit (the multiplicity profile).
# ---------------------------------------------------------------------------

_BLOOM_BITS_PER_KEY_MICRO = 9_585_059  # ln(1/0.01)/ln(2)^2 * 1e6
_BLOOM_K = 7  # round(9.585059 * ln 2)


@register(
    "bloom_sizing_advisor",
    oracle=f"""
WITH keys AS (
  SELECT 'l_orderkey' AS key_name,
    CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_keys FROM lineitem
  UNION ALL
  SELECT 'l_partkey', CAST(count(DISTINCT l_partkey) AS BIGINT)
  FROM lineitem
  UNION ALL
  SELECT 'l_suppkey', CAST(count(DISTINCT l_suppkey) AS BIGINT)
  FROM lineitem
)
SELECT key_name, n_keys,
  (n_keys * {_BLOOM_BITS_PER_KEY_MICRO} + 999999) // 1000000 AS m_bits,
  ((n_keys * {_BLOOM_BITS_PER_KEY_MICRO} + 999999) // 1000000 + 8388607)
    // 8388608 AS m_mib_ceil,
  CAST({_BLOOM_K} AS BIGINT) AS k_hashes
FROM keys
""",
)
def bloom_sizing_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    keys = None
    for col in ("l_orderkey", "l_partkey", "l_suppkey"):
        part = li.agg(
            F.lit(col).alias("key_name"),
            F.countDistinct(col).alias("n_keys"),
        )
        keys = part if keys is None else keys.unionAll(part)
    return keys.select(
        "key_name",
        "n_keys",
        F.expr(
            f"(n_keys * {_BLOOM_BITS_PER_KEY_MICRO} + 999999) div 1000000"
        ).alias("m_bits"),
        F.expr(
            f"((n_keys * {_BLOOM_BITS_PER_KEY_MICRO} + 999999) div 1000000"
            f" + 8388607) div 8388608"
        ).alias("m_mib_ceil"),
        F.lit(_BLOOM_K).cast("bigint").alias("k_hashes"),
    )


# ---------------------------------------------------------------------------
# approx_distinct_kmv — a DETERMINISTIC distinct-count sketch: K Minimum
# Values (Bar-Yossef et al. 2002). Unlike HLL (engine-internal register
# layout — approx_distinct_parts stays rows-only for that reason), KMV
# is pure order statistics on a fixed hash: keep the K smallest 60-bit
# md5 values per group, estimate distinct = (K-1)·2^60 / h_(K) — every
# intermediate is reproducible bit-for-bit in any engine, so the SKETCH
# ITSELF is oracle-verified, not just its error bound. The report
# yields exact vs estimate vs error ppm per brand — the calibration a
# deployment uses to size K before trusting the sketch at 100 TB
# (where the merge is "union the K-minima, keep K smallest": map-side
# combinable like any algebraic agg).
# ---------------------------------------------------------------------------

_KMV_K = 32
_KMV_MAXH = 1 << 60  # 15 hex digits of md5
_KMV_CAP = 1 << 62  # estimate clamp (h_k=1 pathology), int64-safe

_KMV_HASH_SQL = " + ".join(
    f"(strpos('0123456789abcdef', substr(md5(CAST(p_partkey AS VARCHAR)),"
    f" {i + 1}, 1)) - 1) * {16 ** (14 - i)}"
    for i in range(15)
)


@register(
    "approx_distinct_kmv",
    oracle=f"""
WITH h AS (
  SELECT p_brand, CAST({_KMV_HASH_SQL} AS BIGINT) AS hv FROM part
),
rk AS (
  SELECT p_brand, hv,
    row_number() OVER (PARTITION BY p_brand ORDER BY hv ASC) AS rn
  FROM h
),
per AS (
  SELECT p_brand, CAST(count(*) AS BIGINT) AS n_exact,
    CAST(max(CASE WHEN rn = {_KMV_K} THEN hv END) AS BIGINT) AS h_k
  FROM rk GROUP BY p_brand
)
SELECT p_brand, n_exact,
  CASE WHEN h_k IS NULL THEN n_exact
       ELSE CAST(least(CAST({_KMV_K - 1} AS HUGEINT) * {_KMV_MAXH} // h_k,
                       {_KMV_CAP}) AS BIGINT) END AS kmv_estimate,
  CASE WHEN h_k IS NULL THEN CAST(0 AS BIGINT)
       ELSE CAST(abs(least(CAST({_KMV_K - 1} AS HUGEINT) * {_KMV_MAXH} // h_k,
                           {_KMV_CAP}) - n_exact) * 1000000 // n_exact
            AS BIGINT) END AS err_ppm
FROM per
""",
)
def approx_distinct_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand exact distinct vs the deterministic KMV estimate.

    p_partkey is the part table's key, so values are already distinct;
    the sketch math is the (K-1)·2^60/h_(K) unbiased-ish KMV estimator
    on the 60-bit md5 grid. Groups smaller than K fall back to exact
    (the sketch holds every value). Scale: one scan, one window on the
    (brand, hash) ordering — at deployment the same sketch merges
    map-side by keeping the K smallest per partition.
    """
    part = load_table(spark, sf_dir, "part")
    h = part.select(
        "p_brand",
        F.conv(
            F.substring(F.md5(F.col("p_partkey").cast("string")), 1, 15),
            16,
            10,
        )
        .cast("bigint")
        .alias("hv"),
    )
    w = Window.partitionBy("p_brand").orderBy(F.col("hv").asc())
    per = (
        h.withColumn("rn", F.row_number().over(w))
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_exact"),
            F.max(
                F.when(F.col("rn") == _KMV_K, F.col("hv"))
            )
            .cast("bigint")
            .alias("h_k"),
        )
    )
    est = (
        f"CAST(least(CAST({_KMV_K - 1} AS DECIMAL(38,0)) * {_KMV_MAXH}"
        f" div h_k, {_KMV_CAP}) AS BIGINT)"
    )
    return per.select(
        "p_brand",
        "n_exact",
        F.expr(
            f"CASE WHEN h_k IS NULL THEN n_exact ELSE {est} END"
        ).alias("kmv_estimate"),
        F.expr(
            f"CASE WHEN h_k IS NULL THEN CAST(0 AS BIGINT)"
            f" ELSE CAST(abs(CAST({est} AS DECIMAL(38,0)) - n_exact)"
            f" * 1000000 div n_exact AS BIGINT) END"
        ).alias("err_ppm"),
    )


# ---------------------------------------------------------------------------
# dim_broadcast_advisor — join-planning audit: for every dimension
# table, row count + modeled in-memory bytes (fixed widths: INT 4,
# BIGINT/DOUBLE 8, VARCHAR len+4) and whether it fits under the two
# autoBroadcastJoinThreshold settings this repo runs with (10 MB
# cluster default, 64 MB local-bench tune in session.py). The advisor
# makes the session.py tuning note auditable: which dims stop
# broadcasting when the threshold drops back to 10 MB on a cluster,
# and which survive 100× growth (region/nation are SF-constant;
# supplier/customer/part scale with SF — bytes_per_row × projected
# rows is the capacity check a 100 TB deployment runs).
#
# Scale shape: five map-side-combined 1-row aggregates unioned — no
# joins, no windows.
# ---------------------------------------------------------------------------

_DIM_SPECS: dict[str, tuple[tuple[str, str], ...]] = {
    "region": (("r_regionkey", "i4"), ("r_name", "str")),
    "nation": (("n_nationkey", "i4"), ("n_name", "str"), ("n_regionkey", "i4")),
    "supplier": (
        ("s_suppkey", "i8"),
        ("s_name", "str"),
        ("s_nationkey", "i4"),
        ("s_acctbal", "f8"),
    ),
    "customer": (
        ("c_custkey", "i8"),
        ("c_name", "str"),
        ("c_nationkey", "i4"),
        ("c_acctbal", "f8"),
        ("c_mktsegment", "str"),
    ),
    "part": (
        ("p_partkey", "i8"),
        ("p_name", "str"),
        ("p_brand", "str"),
        ("p_type", "str"),
        ("p_size", "i4"),
        ("p_retailprice", "f8"),
    ),
}

_WIDTHS = {"i4": 4, "i8": 8, "f8": 8}
_MB10 = 10 * 1024 * 1024
_MB64 = 64 * 1024 * 1024


def _dim_row_bytes_sql(spec) -> str:
    fixed = sum(_WIDTHS[t] for _, t in spec if t != "str")
    strs = " + ".join(f"(len({c}) + 4)" for c, t in spec if t == "str")
    return f"{fixed} + {strs}" if strs else str(fixed)


@register(
    "dim_broadcast_advisor",
    oracle="\nUNION ALL\n".join(
        f"""SELECT '{tbl}' AS tbl, CAST(count(*) AS BIGINT) AS n_rows,
  CAST(sum({_dim_row_bytes_sql(spec)}) AS BIGINT) AS est_bytes,
  CAST(sum({_dim_row_bytes_sql(spec)}) AS BIGINT)
    // CAST(count(*) AS BIGINT) AS bytes_per_row,
  CAST(sum({_dim_row_bytes_sql(spec)}) AS BIGINT) <= {_MB10}
    AS fits_10mb,
  CAST(sum({_dim_row_bytes_sql(spec)}) AS BIGINT) <= {_MB64}
    AS fits_64mb
FROM {tbl}"""
        for tbl, spec in _DIM_SPECS.items()
    ),
)
def dim_broadcast_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    frames = []
    for tbl, spec in _DIM_SPECS.items():
        fixed = sum(_WIDTHS[t] for _, t in spec if t != "str")
        row_bytes = F.lit(fixed).cast("bigint")
        for c, t in spec:
            if t == "str":
                row_bytes = row_bytes + F.length(c).cast("bigint") + 4
        frames.append(
            load_table(spark, sf_dir, tbl)
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(row_bytes).alias("est_bytes"),
            )
            .select(F.lit(tbl).alias("tbl"), "n_rows", "est_bytes")
        )
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionByName(fr)
    return out.select(
        "tbl",
        "n_rows",
        "est_bytes",
        F.expr("est_bytes div n_rows").alias("bytes_per_row"),
        (F.col("est_bytes") <= _MB10).alias("fits_10mb"),
        (F.col("est_bytes") <= _MB64).alias("fits_64mb"),
    )


# ---------------------------------------------------------------------------
# bloom_fpp_measured — the Bloom-filter family's closing report: BUILD
# a deterministic m=16384-bit / k=3 filter over the member keys
# (customers with orders), PROBE it with a guaranteed-disjoint key set
# (customers shifted into a different string domain), and report the
# MEASURED false-positive rate against the theoretical (bits_set/m)^k.
# bloom_sizing_advisor says what geometry to buy and
# bloom_semijoin_filter shows the plan effect; this one proves the
# geometry delivers its promised FPP on real keys — the sketch is
# oracle-verified bit-for-bit, not just trusted.
#
# Representation: the filter is the DISTINCT set of set bit positions
# (a DataFrame, not driver state) — membership tests are joins, so the
# whole pipeline is shuffle-bounded by m = 16384 regardless of member
# count; exactly how a distributed Bloom build works before the
# positions are packed into a bitmap for broadcast.
# ---------------------------------------------------------------------------

_BLOOM_M_BITS = 16384
_BLOOM_FPP_K = 3
_BLOOM_PROBE_SHIFT = 100_000_000


def _bloom_pos_sql(expr: str, seed: int) -> str:
    h = " + ".join(
        f"(strpos('0123456789abcdef', substr(md5(CAST({expr} AS VARCHAR)"
        f" || '#{seed}'), {i + 1}, 1)) - 1) * {16 ** (14 - i)}"
        for i in range(15)
    )
    return f"(CAST({h} AS BIGINT) % {_BLOOM_M_BITS})"


def _bloom_pos_spark(col: F.Column, seed: int) -> F.Column:
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(col.cast("string"), F.lit(f"#{seed}"))), 1, 15
            ),
            16,
            10,
        ).cast("bigint")
        % _BLOOM_M_BITS
    )


@register(
    "bloom_fpp_measured",
    oracle=f"""
WITH members AS (
  SELECT DISTINCT o_custkey AS key FROM orders
), bits AS (
  SELECT DISTINCT pos FROM (
    {" UNION ALL ".join(f"SELECT {_bloom_pos_sql('key', s)} AS pos FROM members" for s in range(_BLOOM_FPP_K))}
  )
), probes AS (
  SELECT DISTINCT c_custkey + {_BLOOM_PROBE_SHIFT} AS pkey FROM customer
), ppos AS (
  {" UNION ALL ".join(f"SELECT pkey, {_bloom_pos_sql('pkey', s)} AS pos FROM probes" for s in range(_BLOOM_FPP_K))}
), hits AS (
  SELECT pkey,
    CAST(count(*) AS BIGINT) AS n_pos,
    CAST(count(bits.pos) AS BIGINT) AS n_hit
  FROM ppos LEFT JOIN bits USING (pos)
  GROUP BY pkey
), st AS (
  SELECT
    (SELECT CAST(count(*) AS BIGINT) FROM members) AS n_members,
    (SELECT CAST(count(*) AS BIGINT) FROM bits) AS bits_set,
    CAST(count(*) AS BIGINT) AS n_probes,
    CAST(count(CASE WHEN n_hit = n_pos THEN 1 END) AS BIGINT) AS fp_count
  FROM hits
)
SELECT CAST({_BLOOM_M_BITS} AS BIGINT) AS m_bits,
  CAST({_BLOOM_FPP_K} AS BIGINT) AS k_hashes,
  n_members, bits_set,
  bits_set * 1000000 // {_BLOOM_M_BITS} AS load_ppm,
  n_probes, fp_count,
  fp_count * 1000000 // n_probes AS fpp_measured_ppm,
  CAST(floor(
    (CAST(bits_set AS DOUBLE) / {_BLOOM_M_BITS})
    * (CAST(bits_set AS DOUBLE) / {_BLOOM_M_BITS})
    * (CAST(bits_set AS DOUBLE) / {_BLOOM_M_BITS}) * 1000000
  ) AS BIGINT) AS fpp_theoretical_ppm
FROM st
""",
)
def bloom_fpp_measured(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured vs theoretical Bloom FPP, one row.

    Probe keys live in a shifted integer domain, so their key STRINGS
    are disjoint from every member's — zero true positives by
    construction, hence every full-hit probe is a false positive.
    """
    members = (
        load_table(spark, sf_dir, "orders")
        .select(F.col("o_custkey").alias("key"))
        .distinct()
    )
    bits = None
    for s in range(_BLOOM_FPP_K):
        part = members.select(_bloom_pos_spark(F.col("key"), s).alias("pos"))
        bits = part if bits is None else bits.unionByName(part)
    bits = bits.distinct().localCheckpoint()  # feeds count + probe join
    probes = (
        load_table(spark, sf_dir, "customer")
        .select((F.col("c_custkey") + _BLOOM_PROBE_SHIFT).alias("pkey"))
        .distinct()
    )
    ppos = None
    for s in range(_BLOOM_FPP_K):
        part = probes.select(
            "pkey", _bloom_pos_spark(F.col("pkey"), s).alias("pos")
        )
        ppos = part if ppos is None else ppos.unionByName(part)
    hit_bits = bits.withColumn("hit", F.lit(1))
    hits = (
        ppos.join(F.broadcast(hit_bits), "pos", "left")
        .groupBy("pkey")
        .agg(
            F.count(F.lit(1)).alias("n_pos"),
            F.count("hit").alias("n_hit"),
        )
    )
    st = hits.agg(
        F.count(F.lit(1)).alias("n_probes"),
        F.count(F.when(F.col("n_hit") == F.col("n_pos"), F.lit(1))).alias(
            "fp_count"
        ),
    )
    n_members = members.agg(F.count(F.lit(1)).alias("n_members"))
    n_bits = bits.agg(F.count(F.lit(1)).alias("bits_set"))
    load = F.col("bits_set").cast("double") / _BLOOM_M_BITS
    return (
        st.crossJoin(F.broadcast(n_members))
        .crossJoin(F.broadcast(n_bits))
        .select(
            F.lit(_BLOOM_M_BITS).cast("bigint").alias("m_bits"),
            F.lit(_BLOOM_FPP_K).cast("bigint").alias("k_hashes"),
            "n_members",
            "bits_set",
            F.expr(
                f"bits_set * 1000000 div {_BLOOM_M_BITS}"
            ).alias("load_ppm"),
            "n_probes",
            "fp_count",
            F.expr("fp_count * 1000000 div n_probes").alias(
                "fpp_measured_ppm"
            ),
            F.floor(load * load * load * 1000000)
            .cast("bigint")
            .alias("fpp_theoretical_ppm"),
        )
    )

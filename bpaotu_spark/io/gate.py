"""Constraint-gated writer — the write-side twin of
``data_expectations_audit``.

The reference importer (public path ``bpaotu/otu/importer.py``)
validates rows on the way IN; a lake also needs the gate on the way
OUT: a publish that silently lands constraint-violating data poisons
every downstream training run until someone notices. ``gated_write``
evaluates a rule set against the outgoing DataFrame, writes ONLY if
every rule passes (or the caller explicitly tolerates), and emits a
machine-readable receipt either way — the circuit-breaker shape
(write-audit-publish) that a scheduler can alert on.

Scale shape — ONE scan total: the rule aggregates ride the write
action itself via ``df.observe`` (Spark's CollectMetrics node), the
data lands in a staging directory, and the staging dir is atomically
renamed into place only if the metrics pass. At 100 TB this halves the
job vs the naive validate-then-write, and it closes a correctness
hole: with two scans a non-deterministic source (a fresh sample, a
shuffle-unstable upstream) can publish rows the receipt never saw —
here the audited rows ARE the published rows, by construction.

All filesystem traffic (staging cleanup, publish rename, receipt)
goes through the Hadoop FileSystem API resolved from the target path,
so ``hdfs://``/``s3a://`` targets behave like local paths (on object
stores the "rename" is the store's copy-manifest commit, exactly what
Spark's own committers do).
"""

from __future__ import annotations

import json

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Observation

# Internal metric names are namespaced so user rule names cannot
# collide; rule names in this namespace are rejected up front.
_N_ROWS = "__gate_n_rows__"
_STAGING_SUFFIX = "__gate_staging__"
_BACKUP_SUFFIX = "__gate_backup__"


class ExpectationsFailed(RuntimeError):
    """Raised when a gated write refuses to publish."""

    def __init__(self, receipt: dict):
        self.receipt = receipt
        failed = [
            r["rule"] for r in receipt["rules"] if r["n_violations"] > 0
        ]
        super().__init__(
            f"gated_write refused: {len(failed)} rule(s) failed: "
            + ", ".join(failed)
        )


def _fs_for(df: DataFrame, path: str):
    """(FileSystem, Path-class, Path) for ``path`` via the JVM."""
    spark = df.sparkSession
    jvm = spark._jvm
    jpath_cls = jvm.org.apache.hadoop.fs.Path
    jpath = jpath_cls(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath_cls, jpath


def gated_write(
    df: DataFrame,
    path: str,
    rules: dict[str, str],
    fmt: str = "parquet",
    mode: str = "overwrite",
    max_violations: int = 0,
) -> dict:
    """Write ``df`` to ``path`` ONLY if every rule passes.

    ``rules`` maps rule name → a boolean SQL predicate that flags a
    VIOLATING row (e.g. ``{"nonpositive_qty": "quantity <= 0"}``).
    The rules are evaluated by metrics attached to the write itself
    (one scan); the data lands in a staging directory first. If any
    rule counts more than ``max_violations`` rows the staging output
    is deleted, nothing is published, and :class:`ExpectationsFailed`
    carries the receipt; otherwise staging is atomically renamed to
    ``path`` and the receipt (rule counts, row count, outcome) is
    saved next to the data as ``_expectations_receipt.json`` and
    returned.

    ``mode`` applies to the PUBLISH step: ``overwrite`` replaces an
    existing target, ``errorifexists``/``error`` raises, ``ignore``
    skips the publish (receipt says so). ``append`` is not supported —
    staging-then-rename has no atomic append; use the snapshots module
    for append-with-history.

    An empty frame trivially passes every rule (zero rows can violate
    nothing) and publishes an empty-but-valid dataset.
    """
    if mode not in ("overwrite", "error", "errorifexists", "ignore"):
        raise ValueError(
            f"gated_write: unsupported mode {mode!r} "
            "(use overwrite/errorifexists/ignore; append has no "
            "atomic staging publish)"
        )
    bad_names = sorted(n for n in rules if n.startswith("__"))
    if bad_names:
        raise ValueError(
            "gated_write: rule names starting with '__' are reserved "
            f"for internal metrics: {bad_names}"
        )
    # F.sum over zero rows is NULL — coalesce so an empty frame reads
    # as 0 violations instead of crashing the int() below.
    aggs = [F.count(F.lit(1)).cast("bigint").alias(_N_ROWS)]
    for name, pred in rules.items():
        aggs.append(
            F.coalesce(
                F.sum(F.expr(f"CASE WHEN {pred} THEN 1 ELSE 0 END")),
                F.lit(0),
            )
            .cast("bigint")
            .alias(name)
        )

    fs, jpath_cls, jtarget = _fs_for(df, path)
    staging = path.rstrip("/") + "." + _STAGING_SUFFIX
    jstaging = jpath_cls(staging)
    if fs.exists(jstaging):
        fs.delete(jstaging, True)

    obs = Observation("gate")
    # the metrics are computed on the exact rows the write emits —
    # one pass, no audited-vs-published divergence
    df.observe(obs, *aggs).write.format(fmt).mode("overwrite").save(staging)
    metrics = obs.get

    receipt = {
        "path": path,
        "n_rows": int(metrics[_N_ROWS]),
        "max_violations": max_violations,
        "rules": [
            {
                "rule": name,
                "predicate": pred,
                "n_violations": int(metrics[name]),
            }
            for name, pred in rules.items()
        ],
    }
    ok = all(r["n_violations"] <= max_violations for r in receipt["rules"])
    receipt["published"] = ok
    if not ok:
        fs.delete(jstaging, True)
        raise ExpectationsFailed(receipt)

    # In overwrite mode the previous data is renamed ASIDE (not
    # deleted) before the publish rename, so a failed publish can put
    # it back — at no point are both the new and the old copy gone.
    jbackup = jpath_cls(path.rstrip("/") + "." + _BACKUP_SUFFIX)
    backed_up = False
    if fs.exists(jtarget):
        if mode == "overwrite":
            if fs.exists(jbackup):
                fs.delete(jbackup, True)
            if not fs.rename(jtarget, jbackup):
                fs.delete(jstaging, True)
                raise IOError(
                    f"gated_write: could not move previous data aside "
                    f"for {path}"
                )
            backed_up = True
        elif mode == "ignore":
            fs.delete(jstaging, True)
            receipt["published"] = False
            receipt["skipped"] = "target exists (mode=ignore)"
            return receipt
        else:  # error / errorifexists
            fs.delete(jstaging, True)
            raise FileExistsError(
                f"gated_write: target exists and mode={mode}: {path}"
            )
    if not fs.rename(jstaging, jtarget):
        fs.delete(jstaging, True)
        if backed_up:
            fs.rename(jbackup, jtarget)  # restore the previous data
        raise IOError(f"gated_write: publish rename failed for {path}")
    if backed_up:
        fs.delete(jbackup, True)

    # receipt through the same FileSystem, so non-local URIs get a
    # receipt next to the data instead of one stranded on the driver
    out = fs.create(jpath_cls(path + "/_expectations_receipt.json"), True)
    try:
        out.write(
            bytearray(
                json.dumps(receipt, indent=1, sort_keys=True).encode("utf-8")
            )
        )
    finally:
        out.close()
    return receipt

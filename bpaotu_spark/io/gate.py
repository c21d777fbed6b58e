"""Constraint-gated writer — the write-side twin of
``data_expectations_audit``.

The reference importer (public path ``bpaotu/otu/importer.py``)
validates rows on the way IN; a lake also needs the gate on the way
OUT: a publish that silently lands constraint-violating data poisons
every downstream training run until someone notices. ``gated_write``
evaluates a rule set against the outgoing DataFrame in ONE
map-combined aggregate pass, writes ONLY if every rule passes (or the
caller explicitly tolerates), and emits a machine-readable receipt
either way — the circuit-breaker shape (write-audit-publish) that a
scheduler can alert on.

Scale shape: one agg over the frame being written (the same scan the
write itself performs), no shuffle beyond the 1-row aggregate; the
write is whatever the caller's format/layout costs. The receipt is a
single driver-side JSON file.
"""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


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
    All rules are evaluated in one aggregate pass. If any rule counts
    more than ``max_violations`` rows, nothing is written and
    :class:`ExpectationsFailed` carries the receipt; otherwise the
    frame is written and the receipt (rule counts, row count, outcome)
    is saved next to the data as ``_expectations_receipt.json`` and
    returned.
    """
    aggs = [F.count(F.lit(1)).cast("bigint").alias("__n_rows")]
    for name, pred in rules.items():
        aggs.append(
            F.sum(F.expr(f"CASE WHEN {pred} THEN 1 ELSE 0 END"))
            .cast("bigint")
            .alias(name)
        )
    row = df.agg(*aggs).collect()[0]
    receipt = {
        "path": path,
        "n_rows": row["__n_rows"],
        "max_violations": max_violations,
        "rules": [
            {
                "rule": name,
                "predicate": pred,
                "n_violations": int(row[name]),
            }
            for name, pred in rules.items()
        ],
    }
    ok = all(r["n_violations"] <= max_violations for r in receipt["rules"])
    receipt["published"] = ok
    if not ok:
        raise ExpectationsFailed(receipt)
    df.write.format(fmt).mode(mode).save(path)
    with open(os.path.join(path, "_expectations_receipt.json"), "w") as fh:
        json.dump(receipt, fh, indent=1, sort_keys=True)
    return receipt

"""Round-14 tests: registry duplicate guard, the dedup signature
store, the UniFrac lineage store, and the tombstone-debt
consolidation decision."""

from __future__ import annotations

import os

import duckdb
import pytest

from bpaotu_spark.registry import ORACLES, QUERIES, load_all

load_all()

# ---------------------------------------------------------------------------
# registry.register() duplicate guard (r13 VERDICT item 3): the r13
# mann_kendall_trend near-miss was caught by an allowlist coincidence;
# a same-name re-registration must now raise, not silently overwrite.
# ---------------------------------------------------------------------------


def test_register_duplicate_name_raises():
    from bpaotu_spark.registry import QUERIES as REG, register

    assert "q1_pricing_summary" in REG
    before = REG["q1_pricing_summary"]
    with pytest.raises(ValueError, match="duplicate operator registration"):

        @register("q1_pricing_summary")
        def q1_pricing_summary(spark, sf_dir):  # pragma: no cover
            raise AssertionError("must never be registered")

    # the original registration is untouched
    assert REG["q1_pricing_summary"] is before

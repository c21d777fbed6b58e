"""PCoA power iteration vs numpy eigendecomposition."""

import numpy as np
import pyspark.sql.functions as F

from bpaotu_spark.operators.ordination import _bc_pairs_full
from bpaotu_spark.registry import QUERIES


def test_pcoa_axis1_matches_numpy(spark, sf_dir):
    pairs = _bc_pairs_full(spark, sf_dir).collect()
    ids = sorted({r.i for r in pairs})
    idx = {s: k for k, s in enumerate(ids)}
    n = len(ids)
    D = np.zeros((n, n))
    for r in pairs:
        D[idx[r.i], idx[r.j]] = r.d
    J = np.eye(n) - np.ones((n, n)) / n
    B = -0.5 * J @ (D**2) @ J
    vals, vecs = np.linalg.eigh(B)
    lam, vec = vals[-1], vecs[:, -1]
    expected = vec * np.sqrt(max(lam, 0.0))
    if expected[0] < 0:  # same sign convention: lowest-id loading >= 0
        expected = -expected

    got_rows = QUERIES["ordination_pcoa_axis1"](spark, sf_dir).collect()
    got = np.zeros(n)
    for r in got_rows:
        got[idx[r.sample_id]] = r.axis1
    assert len(got_rows) == n
    np.testing.assert_allclose(got, expected, atol=5e-3)

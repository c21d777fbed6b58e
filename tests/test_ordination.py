"""PCoA power iteration + deflation vs numpy eigendecomposition."""

import numpy as np

from bpaotu_spark.operators.ordination import _bc_pairs_full
from bpaotu_spark.registry import QUERIES


def test_pcoa_2d_matches_numpy(spark, sf_dir):
    pairs = _bc_pairs_full(spark, sf_dir).collect()
    ids = sorted({r.i for r in pairs})
    idx = {s: k for k, s in enumerate(ids)}
    n = len(ids)
    D = np.zeros((n, n))
    for r in pairs:
        # integer ppm grid — the numpy twin centers the SAME quantized
        # matrix the engine iterates on
        D[idx[r.i], idx[r.j]] = r.dp / 1e6
    J = np.eye(n) - np.ones((n, n)) / n
    B = -0.5 * J @ (D**2) @ J
    vals, vecs = np.linalg.eigh(B)

    def expected_axis(k):
        lam, vec = vals[-1 - k], vecs[:, -1 - k]
        ax = vec * np.sqrt(max(lam, 0.0))
        return -ax if ax[0] < 0 else ax  # lowest-id loading >= 0

    rows = QUERIES["ordination_pcoa_2d"](spark, sf_dir).collect()
    assert len(rows) == n
    got1, got2 = np.zeros(n), np.zeros(n)
    for r in rows:
        got1[idx[r.sample_id]] = r.axis1_micro / 1e6
        got2[idx[r.sample_id]] = r.axis2_micro / 1e6
    np.testing.assert_allclose(got1, expected_axis(0), atol=5e-3)
    # axis 2 inherits axis 1's residual through deflation — looser bar
    np.testing.assert_allclose(got2, expected_axis(1), atol=2e-2)

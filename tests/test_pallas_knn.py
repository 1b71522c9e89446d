"""Pallas fused k-NN vs the XLA brute-force reference (interpreter mode
on CPU; the TPU lowering is exercised on hardware via MVIL_PALLAS_KNN)."""

import numpy as np
import jax.numpy as jnp
import pytest

from mvil_fusion_tpu.ops import loam_icp
from mvil_fusion_tpu.ops.pallas_knn import knn_topk


@pytest.mark.parametrize("nq,nr,k", [(100, 1000, 5), (256, 4096, 10),
                                     (37, 513, 3)])
def test_pallas_knn_matches_xla(rng, nq, nr, k):
    query = jnp.asarray(rng.uniform(-10, 10, (nq, 3)).astype(np.float32))
    ref = jnp.asarray(rng.uniform(-10, 10, (nr, 3)).astype(np.float32))
    mask = jnp.asarray(rng.uniform(size=nr) > 0.2)

    idx_ref, d2_ref = loam_icp.knn(query, ref, mask, k)
    idx_p, d2_p = knn_topk(query, ref, mask, k, interpret=True)

    # same neighbor sets (ties may reorder within equal distances)
    d2_ref = np.asarray(d2_ref)
    d2_p = np.asarray(d2_p)
    finite = np.isfinite(d2_ref)
    np.testing.assert_allclose(d2_p[finite], d2_ref[finite],
                               rtol=1e-4, atol=1e-3)
    # masked refs (xla: inf; pallas: ~1e30) both fail any distance gate
    assert np.all(d2_p[~finite] > 1e20)
    # indices agree wherever the k-th distance is strictly unique
    same = np.asarray(idx_p) == np.asarray(idx_ref)
    assert same[finite].mean() > 0.99


def test_pallas_knn_all_masked(rng):
    query = jnp.asarray(rng.uniform(-1, 1, (16, 3)).astype(np.float32))
    ref = jnp.asarray(rng.uniform(-1, 1, (64, 3)).astype(np.float32))
    idx, d2 = knn_topk(query, ref, jnp.zeros(64, bool), 5, interpret=True)
    assert np.all(np.asarray(d2) > 1e20)
    assert idx.shape == (16, 5)

"""Pallas TPU kernels vs their jnp twins (interpreter mode on CPU).

The kernels compile for real TPUs; here they run under the Pallas
interpreter so CI stays hermetic (SURVEY.md §4 test strategy).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from opensfm_tpu.ops.pallas_kernels.top2 import (
    TILE_M,
    TILE_N,
    top2_sqdist_pallas,
)


def _ref_top2(d1, d2, n2, mask=None):
    dist = (
        (d1**2).sum(1)[:, None]
        + (d2**2).sum(1)[None, :]
        - 2.0 * d1 @ d2.T
    )
    dist[:, n2:] = np.inf
    if mask is not None:
        dist[mask == 0] = np.inf
    order = np.argsort(dist, axis=1)
    return order[:, 0], np.take_along_axis(dist, order[:, :2], axis=1)


@pytest.mark.parametrize("masked", [False, True])
def test_top2_matches_dense_reference(masked) -> None:
    rng = np.random.default_rng(7)
    N, M, D = TILE_N, 2 * TILE_M, 128
    n2 = M - 37  # padded tail columns must be masked out
    d1 = rng.normal(size=(N, D)).astype(np.float32)
    d2 = rng.normal(size=(M, D)).astype(np.float32)
    d2[n2:] = 0.0

    mask = None
    if masked:
        mask = (rng.random((N, M)) < 0.25).astype(np.float32)
    ref_i, ref_d = _ref_top2(
        d1.astype(np.float64), d2.astype(np.float64), n2, mask
    )

    idx, dist = top2_sqdist_pallas(
        jnp.asarray(d1),
        jnp.asarray(d2),
        n2,
        None if mask is None else jnp.asarray(mask),
        interpret=True,
    )
    idx = np.asarray(idx)[:, 0]
    dist = np.asarray(dist)

    finite = np.isfinite(ref_d[:, 0])
    assert finite.any()
    assert (idx[finite] == ref_i[finite]).mean() > 0.99
    np.testing.assert_allclose(
        dist[finite], ref_d[finite], rtol=1e-3, atol=1e-2
    )
    # rows with no allowed candidate stay at +inf
    assert np.isinf(dist[~finite, 0]).all()


def test_matcher_dispatch_same_result_small() -> None:
    """The public matcher (jnp path on CPU) agrees with brute force."""
    from opensfm_tpu.ops.matching import match_brute_force_symmetric

    rng = np.random.default_rng(3)
    d1 = rng.normal(size=(130, 64)).astype(np.float32)
    d2 = rng.normal(size=(150, 64)).astype(np.float32)
    # make 40 strong mutual matches
    d2[10:50] = d1[20:60] + 1e-3 * rng.normal(size=(40, 64)).astype(
        np.float32
    )
    matches = match_brute_force_symmetric(d1, d2, ratio=0.8)
    got = {(i, j) for i, j in matches}
    expected = {(20 + k, 10 + k) for k in range(40)}
    assert expected <= got

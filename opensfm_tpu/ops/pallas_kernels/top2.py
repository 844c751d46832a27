"""Fused top-2 nearest-descriptor search as a Pallas TPU kernel.

TPU-native replacement for the FLANN kNN(k=2) search at the heart of
descriptor matching (reference: cv2.flann in matching.py:683-697,
pyfeatures MatchUsingWords — see SURVEY.md §2.2).  The jnp twin
(`opensfm_tpu.ops.matching._top2_sqdist`) materialises the full [N, M]
squared-distance matrix in HBM and runs `lax.top_k` over it; this kernel
streams [TILE_N, TILE_M] distance tiles through VMEM — one MXU matmul per
tile — and keeps a running (best, second-best, argbest) per query row, so
HBM traffic is O(N·D + M·D) instead of O(N·M).

Grid: (N/TILE_N, M/TILE_M); the M dimension is sequential ("arbitrary") and
accumulates into VMEM scratch, the N dimension is parallel.  The actual
row count of the database (`n2`) rides in as a scalar-prefetch argument and
masks padded columns with +inf.  An optional additive candidate mask
(0 where allowed, +LARGE where disallowed — guided epipolar or BoW-word
compatibility) streams in with the same tiling.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 512
TILE_M = 1024
_INF = float("inf")
# Typed zero for index maps: a bare Python 0 lowers to an i64 constant
# under x64, which Mosaic rejects in the block index transform.
_Z = np.int32(0)


def _tile_top2(dist):
    """Per-row (min, argmin, second-min) of a [tn, tm] tile."""
    tn, tm = dist.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (tn, tm), 1)
    d1 = jnp.min(dist, axis=1, keepdims=True)  # [tn,1]
    is_best = dist == d1
    # lowest column index achieving the min (tm as a typed constant: a bare
    # Python int promotes to int64 under x64, which Mosaic cannot lower)
    i1 = jnp.min(jnp.where(is_best, col, jnp.int32(tm)), axis=1, keepdims=True)
    masked = jnp.where(col == i1, _INF, dist)
    d2 = jnp.min(masked, axis=1, keepdims=True)
    return d1, i1, d2


def _merge(b1, bi, b2, t1, ti, t2):
    """Merge running top-2 (b1<=b2, index bi) with a tile's top-2."""
    n1 = jnp.minimum(b1, t1)
    ni = jnp.where(t1 < b1, ti, bi)
    n2 = jnp.minimum(jnp.maximum(b1, t1), jnp.minimum(b2, t2))
    return n1, ni, n2


def _top2_kernel(n2_ref, d1_ref, d2_ref, out_d_ref, out_i_ref,
                 b1_ref, bi_ref, b2_ref, *, n_mtiles):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        b1_ref[:] = jnp.full_like(b1_ref, _INF)
        b2_ref[:] = jnp.full_like(b2_ref, _INF)
        bi_ref[:] = jnp.zeros_like(bi_ref)

    x = d1_ref[:]  # [TILE_N, D]
    y = d2_ref[:]  # [TILE_M, D]
    sq1 = jnp.sum(x * x, axis=1, keepdims=True)  # [TILE_N,1]
    sq2 = jnp.sum(y * y, axis=1, keepdims=True).T  # [1,TILE_M]
    # HIGHEST: default MXU precision is one bf16 pass (~0.4% error at
    # D=128), enough to flip near-tie argmins vs the exact distance.
    dist = sq1 + sq2 - 2.0 * jax.lax.dot_general(
        x, y, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    col = (j * TILE_M
           + jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1))
    dist = jnp.where(col < n2_ref[0], dist, _INF)

    t1, i1, t2 = _tile_top2(dist)
    i1 = i1 + j * TILE_M
    b1, bi, b2 = _merge(b1_ref[:, 0:1], bi_ref[:, 0:1], b2_ref[:, 0:1],
                        t1, i1, t2)
    b1_ref[:, 0:1] = b1
    bi_ref[:, 0:1] = bi
    b2_ref[:, 0:1] = b2

    @pl.when(j == n_mtiles - 1)
    def _():
        out_d_ref[:, 0:1] = b1_ref[:, 0:1]
        out_d_ref[:, 1:2] = b2_ref[:, 0:1]
        out_i_ref[:, 0:1] = bi_ref[:, 0:1]


def _top2_kernel_masked(n2_ref, d1_ref, d2_ref, mask_ref, out_d_ref,
                        out_i_ref, b1_ref, bi_ref, b2_ref, *, n_mtiles):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        b1_ref[:] = jnp.full_like(b1_ref, _INF)
        b2_ref[:] = jnp.full_like(b2_ref, _INF)
        bi_ref[:] = jnp.zeros_like(bi_ref)

    x = d1_ref[:]
    y = d2_ref[:]
    sq1 = jnp.sum(x * x, axis=1, keepdims=True)
    sq2 = jnp.sum(y * y, axis=1, keepdims=True).T
    # HIGHEST: default MXU precision is one bf16 pass (~0.4% error at
    # D=128), enough to flip near-tie argmins vs the exact distance.
    dist = sq1 + sq2 - 2.0 * jax.lax.dot_general(
        x, y, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    col = (j * TILE_M
           + jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1))
    dist = jnp.where((col < n2_ref[0]) & (mask_ref[:] > 0.0), dist, _INF)

    t1, i1, t2 = _tile_top2(dist)
    i1 = i1 + j * TILE_M
    b1, bi, b2 = _merge(b1_ref[:, 0:1], bi_ref[:, 0:1], b2_ref[:, 0:1],
                        t1, i1, t2)
    b1_ref[:, 0:1] = b1
    bi_ref[:, 0:1] = bi
    b2_ref[:, 0:1] = b2

    @pl.when(j == n_mtiles - 1)
    def _():
        out_d_ref[:, 0:1] = b1_ref[:, 0:1]
        out_d_ref[:, 1:2] = b2_ref[:, 0:1]
        out_i_ref[:, 0:1] = bi_ref[:, 0:1]


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(jax.jit, static_argnames=("interpret",))
def top2_sqdist_pallas(d1, d2, n2, mask=None, interpret: bool = False):
    """Indices + squared L2 distances of the 2 nearest rows of d2 per d1 row.

    d1 [N, D] f32, d2 [M, D] f32 with N, M multiples of (TILE_N, TILE_M)
    (callers pad; padded d2 columns are masked via the true count `n2`).
    `mask`, if given, is [N, M] f32 with >0 where the candidate is allowed.
    Returns (idx [N, 1] i32, dist [N, 2] f32).
    """
    N, D = d1.shape
    M = d2.shape[0]
    assert N % TILE_N == 0 and M % TILE_M == 0, (N, M)
    # uint8 descriptors (uchar quantization) upcast on-device: the host
    # ships 4x fewer bytes, the kernel math stays f32.
    d1 = d1.astype(jnp.float32)
    d2 = d2.astype(jnp.float32)
    n_ntiles, n_mtiles = N // TILE_N, M // TILE_M
    n2_arr = jnp.asarray([n2], dtype=jnp.int32)

    in_specs = [
        pl.BlockSpec((TILE_N, D), lambda i, j, *_: (i, _Z),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((TILE_M, D), lambda i, j, *_: (j, _Z),
                     memory_space=pltpu.VMEM),
    ]
    args = [d1, d2]
    if mask is None:
        kernel = functools.partial(_top2_kernel, n_mtiles=n_mtiles)
    else:
        kernel = functools.partial(_top2_kernel_masked, n_mtiles=n_mtiles)
        in_specs.append(
            pl.BlockSpec((TILE_N, TILE_M), lambda i, j, *_: (i, j),
                         memory_space=pltpu.VMEM))
        args.append(mask)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_ntiles, n_mtiles),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((TILE_N, 2), lambda i, j, *_: (i, _Z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, 1), lambda i, j, *_: (i, _Z),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((TILE_N, 1), jnp.float32),
            pltpu.VMEM((TILE_N, 1), jnp.int32),
            pltpu.VMEM((TILE_N, 1), jnp.float32),
        ],
    )
    out_d, out_i = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((N, 2), jnp.float32),
            jax.ShapeDtypeStruct((N, 1), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * M * D + 6 * N * M,
            bytes_accessed=4 * (N * D + n_mtiles * M * D + 3 * N),
            transcendentals=0,
        ),
        interpret=interpret,
    )(n2_arr, *args)
    return out_i, out_d

"""Banded Pallas resample+gather: the O(K) tiled-merge kernel.

Both sequences in the inverse-CDF lookup are sorted — the CDF C_j by
construction, the quantile positions u_i because systematic positions are
affine and multinomial draws are pre-sorted. Therefore the query×support
interaction is *banded*: a 128-query tile only ever intersects the support
tiles between the CDF ranks of its first and last query. The quadratic
compare-and-count kernel (`pallas_resample._fused_kernel`) evaluates all
(K/128)² tile pairs; this kernel computes each query tile's band bounds with
one cheap full-row reduction and then executes only the in-band tiles under
`pl.when` — real predicated skipping, so the work is O(K·band) ≈ O(K).

Per query tile t (Q = 128 queries):
  base_r = #{j : C_j ≤ u_{t·Q}}   (count at the tile's first query, per row)
  hi_r   = #{j : C_j ≤ u_{t·Q+Q-1}}
  band   = support tiles [min_r(base_r)//Q, (max_r(hi_r)-1)//Q]
  idx    = base + #{j in band : u_first < C_j ≤ u_i}      (exact counts)
  x_out  = Σ_{s in band} onehot(idx)·x                    (exact gather)

The VJP (scatter) mirrors the same loop structure, accumulating
dx[s] += onehotᵀ·g under the same band predicates. Equivalence with the
quadratic kernel and the jnp oracle is tested in tests/test_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from psvo_tpu.ops import resampling as jnp_resampling
from psvo_tpu.ops.pallas_resample import (
    MAX_K as _QUAD_MAX_K,
    _doubling_cumsum,
    _on_tpu,
    resample_indices_from_positions,
)

ENABLE = True
_INTERPRET = False

ROW_BLOCK = 8
Q = 128  # query/support tile width (lane width)
# Measured verdict (v5e, B=32, K=1024, FHN): 86 ms/train vs the quadratic
# kernel's 66 ms — pl.when branch setup costs more than the skipped tiles at
# VMEM-feasible K. And the [R, K, D→128-lane] buffers cap any whole-row
# kernel at K ≈ 2048 (K=8192, D=40 demands 66 MB of scoped VMEM). So this
# kernel is NOT on the hot path; it is kept (tested, correct) as the
# algorithmic core for a future HBM-resident variant that DMAs only in-band
# support tiles — the design that actually unlocks large K.
MAX_K = 2048


def _cdf_and_positions(logw, u_raw):
    m = jnp.max(logw, axis=-1, keepdims=True)
    w = jnp.exp(logw - m)
    cumw = _doubling_cumsum(w)
    total = cumw[:, -1:]
    return cumw, u_raw * total


def _count_le(cumw, bound):
    """#{j : C_j <= bound} per row. cumw [R,K], bound [R,1] -> [R,1] i32."""
    return jnp.sum((cumw <= bound).astype(jnp.int32), axis=-1, keepdims=True)


def _banded_kernel(k: int, logw_ref, u_ref, x_ref, idx_ref, out_ref, acc_ref, cnt_ref):
    from jax.experimental import pallas as pl

    cumw, u = _cdf_and_positions(logw_ref[:], u_ref[:])
    nq = k // Q
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, Q), 2)

    for t in range(nq):
        u_tile = u[:, t * Q : (t + 1) * Q]  # [R, Q]
        base = _count_le(cumw, u_tile[:, :1])  # [R, 1]
        hi = _count_le(cumw, u_tile[:, -1:])  # [R, 1]
        lo_tile = jnp.min(base) // Q  # scalar band bounds over the row block
        hi_tile = jnp.maximum(jnp.max(hi) - 1, 0) // Q

        cnt_ref[...] = jnp.zeros(cnt_ref.shape, cnt_ref.dtype)
        for s in range(nq):

            @pl.when((s >= lo_tile) & (s <= hi_tile))
            def _(s=s):
                c = cumw[:, s * Q : (s + 1) * Q][:, None, :]  # [R, 1, S]
                u_first = u_tile[:, :1]  # split ops: slice+newaxis in one
                # indexing expression lowers through an unsupported gather
                inband = (c > u_first[:, :, None]) & (c <= u_tile[:, :, None])
                cnt_ref[...] += jnp.sum(inband.astype(jnp.int32), axis=-1)

        idx = jnp.minimum(base + cnt_ref[...], k - 1)  # [R, Q]
        idx_ref[:, t * Q : (t + 1) * Q] = idx

        acc_ref[...] = jnp.zeros(acc_ref.shape, acc_ref.dtype)
        for s in range(nq):

            @pl.when((s >= lo_tile) & (s <= hi_tile))
            def _(s=s):
                onehot = (idx[:, :, None] == (col + s * Q)).astype(jnp.float32)
                acc_ref[...] += jax.lax.dot_general(
                    onehot,
                    x_ref[:, s * Q : (s + 1) * Q, :],
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )

        out_ref[:, t * Q : (t + 1) * Q, :] = acc_ref[...]


def _banded_scatter_kernel(k: int, logw_ref, u_ref, idx_ref, g_ref, dx_ref):
    """dx[s] = Σ_q [idx_q == s] g[q], accumulated tile-by-tile under the same
    band predicates as the forward (bands recomputed from logw/u — cheap)."""
    from jax.experimental import pallas as pl

    cumw, u = _cdf_and_positions(logw_ref[:], u_ref[:])
    nq = k // Q
    row = jax.lax.broadcasted_iota(jnp.int32, (1, Q, 1), 1)

    dx_ref[...] = jnp.zeros(dx_ref.shape, dx_ref.dtype)
    for t in range(nq):
        u_tile = u[:, t * Q : (t + 1) * Q]
        base = _count_le(cumw, u_tile[:, :1])
        hi = _count_le(cumw, u_tile[:, -1:])
        lo_tile = jnp.min(base) // Q
        hi_tile = jnp.maximum(jnp.max(hi) - 1, 0) // Q
        idx_tile = idx_ref[:, t * Q : (t + 1) * Q]  # [R, Q]
        g_tile = g_ref[:, t * Q : (t + 1) * Q, :]  # [R, Q, D]

        for s in range(nq):

            @pl.when((s >= lo_tile) & (s <= hi_tile))
            def _(s=s):
                onehot_t = (idx_tile[:, None, :] == (row + s * Q)).astype(
                    jnp.float32
                )  # [R, S, Q]
                dx_ref[:, s * Q : (s + 1) * Q, :] += jax.lax.dot_general(
                    onehot_t,
                    g_tile,
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )


def _usable(batch: int, k: int) -> bool:
    return (
        ENABLE
        and (_on_tpu() or _INTERPRET)
        and k % Q == 0
        and k <= MAX_K
        and batch % ROW_BLOCK == 0
    )


@jax.custom_vjp
def resample_and_gather_banded(u: jax.Array, logw: jax.Array, x: jax.Array):
    """Banded fused resample+gather: (idx [B,K] i32, x_res [B,K,D]).

    Same contract and gradient semantics as pallas_resample.resample_and_gather
    (exact selection VJP to x; zero to logw/u — FIVO stop-gradient)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    batch, k = logw.shape
    d = x.shape[-1]
    if not _usable(batch, k):
        idx = resample_indices_from_positions(u, logw)
        return idx, jnp_resampling.gather_particles(x, idx)

    r = ROW_BLOCK
    return pl.pallas_call(
        functools.partial(_banded_kernel, k),
        grid=(batch // r,),
        in_specs=[
            pl.BlockSpec((r, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r, k, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((r, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r, k, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((batch, k), jnp.int32),
            jax.ShapeDtypeStruct((batch, k, d), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((r, Q, d), jnp.float32),  # gather accumulator
            pltpu.VMEM((r, Q), jnp.int32),  # in-band count accumulator
        ],
        interpret=_INTERPRET,
    )(logw, u, x)


def _fwd(u, logw, x):
    idx, x_res = resample_and_gather_banded(u, logw, x)
    return (idx, x_res), (u, logw, idx)


def _bwd(res, cots):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    u, logw, idx = res
    _, g_x = cots
    batch, k = logw.shape
    d = g_x.shape[-1]
    if not _usable(batch, k):
        dx = jnp.zeros_like(g_x).at[jnp.arange(batch)[:, None], idx].add(g_x)
    else:
        r = ROW_BLOCK
        dx = pl.pallas_call(
            functools.partial(_banded_scatter_kernel, k),
            grid=(batch // r,),
            in_specs=[
                pl.BlockSpec((r, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((r, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((r, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((r, k, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (r, k, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((batch, k, d), jnp.float32),
            interpret=_INTERPRET,
        )(logw, u, idx, g_x)
    return jnp.zeros_like(u), jnp.zeros_like(logw), dx


resample_and_gather_banded.defvjp(_fwd, _bwd)

"""Fused Pallas resampling kernel: normalize + cumsum + banded inverse-CDF + gather.

The north-star op (BASELINE.json): "resampling (multinomial + systematic)
becomes a branch-free Pallas cumsum+searchsorted gather so the data-dependent
ancestor selection stays on-device". One kernel fuses what the jnp path runs
as ~5 separate HLOs (max, exp, sum, cumsum, searchsorted, gather).

Channel-major layout: particles are [B, D, K] with K on the 128-lane axis and
the tiny feature dim on sublanes (see distributions.mvn_diag_log_prob_cm).
This is what unlocks large K entirely in VMEM: a [R, D_TILE, K] block at
K=8192 is 2 MB — the round-1 [R, K, D] layout lane-padded D to 128 and capped
any whole-row kernel at K≈2048.

Algorithm (per batch row-block, everything in VMEM):

1. log-weights normalize (max-shifted exp) + inclusive cumulative sum via
   branch-free log-step doubling (`jnp.cumsum` is not guaranteed in Mosaic);
2. **banded** inverse-CDF: both sequences are sorted (the CDF by
   construction; systematic positions are affine, multinomial draws are
   pre-sorted), so a 128-query tile only intersects the support tiles between
   the CDF ranks of its first and last query. Two O(K) full-row counts give
   the band, then a `fori_loop` over just the in-band tiles does the
   compare-and-count  a_i = Σ_j 1[cumw_j ≤ u_i].  Work is O(K·band) ≈ O(K) —
   the round-1 quadratic kernel evaluated all (K/128)² tile pairs;
3. the gather is an exact one-hot contraction on the MXU:
   out[d, q] = Σ_s 1[a_q == s] · x[d, s], accumulated over in-band support
   tiles only. Profiling round 1 showed XLA's dynamic gather at 0.22 ms/step
   — over half the whole SMC step at K=1024.

The D axis is tiled over the grid (last-fastest), so large-D states (e.g.
Lorenz-96, D=40) stream through the same kernel; ancestor indices are
computed once per batch block (first D step) and re-read from the output
buffer, which Pallas keeps resident across grid steps of the same block.

The custom VJP is a second banded kernel: the transpose one-hot contraction
dx[d, s] = Σ_q 1[a_q == s] · g[d, q] (offspring copy cotangents back to
their ancestor — the reparameterized path FIVO keeps; d/d logw and d/d u are
zero: stop-gradient through the discrete choice, SURVEY.md §3.2).

Equivalence with the jnp path is tested in interpret mode on CPU and (when a
TPU is attached) compiled, in tests/test_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name as _checkpoint_name

from psvo_tpu.ops import resampling as jnp_resampling

ENABLE = True
_INTERPRET = False  # flipped by tests to run on CPU

ROW_BLOCK = 8  # batch rows per block (Mosaic sublane constraint on 2-D refs)
D_TILE = 8  # feature sublanes per grid step of the D axis
Q = 128  # query/support tile width (lane width)
# Measured ceiling (v5e, 2026-08-16): the banded kernel wins decisively at
# K=1024 (38 vs 138 ms/train on the primary config) but the per-query-tile
# `fori_loop`s carry ~10s-of-µs scalar-loop overhead each, and at K=8192
# (64 tiles × D-tiles) that overhead dominates: 13.5 ms/step vs the jnp
# histogram path's 1.27 ms. VMEM would allow K=8192 ([8, 8, K] blocks are
# 2 MB); the loop structure doesn't. Above MAX_K the jnp path (histogram +
# XLA gather) takes over; a static two-level one-hot formulation is the
# candidate large-K design if resampling ever dominates there (profiled:
# at K=8192/D=40 the step is MLP/density-bound, not resample-bound).
MAX_K = 2048


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def _usable(batch: int, k: int) -> bool:
    return (
        ENABLE
        and (_on_tpu() or _INTERPRET)
        and k % Q == 0
        and k <= MAX_K
        and batch % ROW_BLOCK == 0
    )


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def _doubling_cumsum(w: jax.Array) -> jax.Array:
    """Inclusive cumsum along the last axis via log2(K) shift-and-adds.

    Branch-free: each step adds the value from `shift` lanes to the left,
    masked so lanes < shift add zero. Static python loop — K is static.
    """
    k = w.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, w.shape, dimension=w.ndim - 1)
    out = w
    shift = 1
    while shift < k:
        rolled = jnp.roll(out, shift, axis=-1)
        out = out + jnp.where(lane >= shift, rolled, 0.0)
        shift *= 2
    return out


def _count_le(cumw: jax.Array, bound: jax.Array) -> jax.Array:
    """#{j : C_j <= bound} per row. cumw [R,K], bound [R,1] -> [R,1] i32."""
    return jnp.sum((cumw <= bound).astype(jnp.int32), axis=-1, keepdims=True)


def _fused_kernel(k: int, logw_ref, u_ref, x_ref, idx_ref, out_ref, cumw_s):
    """One batch row-block × one D tile.

    logw/u [R, K]; x [R, DT, K]; outputs idx [R, K] i32 (written on the first
    D step, re-read after), x_out [R, DT, K]; cumw_s [R, K] f32 scratch.
    """
    from jax.experimental import pallas as pl

    r = logw_ref.shape[0]
    nq = k // Q
    d_step = pl.program_id(1)

    # ---- Pass 1 (first D step only): CDF + banded inverse-CDF indices.
    @pl.when(d_step == 0)
    def _():
        logw = logw_ref[:]
        m = jnp.max(logw, axis=-1, keepdims=True)
        w = jnp.exp(logw - m)
        cumw = _doubling_cumsum(w)
        cumw_s[:] = cumw
        # compare u*total <= cumw instead of dividing the K-vector
        u = u_ref[:] * cumw[:, -1:]

        for t in range(nq):
            u_tile = u[:, t * Q : (t + 1) * Q]  # [R, Q]
            base = _count_le(cumw, u_tile[:, :1])  # rank of the first query
            hi = _count_le(cumw, u_tile[:, -1:])  # rank of the last query
            lo_t = jnp.min(base) // Q  # scalar band bounds over the row block
            hi_t = jnp.maximum(jnp.max(hi) - 1, 0) // Q

            def body(s, cnt, u_tile=u_tile):
                c = cumw_s[:, pl.ds(pl.multiple_of(s * Q, Q), Q)]  # [R, S]
                le = c[:, None, :] <= u_tile[:, :, None]  # [R, Q, S]
                return cnt + jnp.sum(le.astype(jnp.int32), axis=-1)

            # tiles below the band contribute Q each; in-band tiles counted
            cnt = jax.lax.fori_loop(
                lo_t, hi_t + 1, body, jnp.zeros((r, Q), jnp.int32)
            )
            idx_ref[:, t * Q : (t + 1) * Q] = jnp.minimum(Q * lo_t + cnt, k - 1)

    # ---- Pass 2 (every D step): banded one-hot gather for this feature tile.
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, Q), 2)
    for t in range(nq):
        idx_t = idx_ref[:, t * Q : (t + 1) * Q]  # [R, Q] (resident block)
        lo_t = jnp.min(idx_t) // Q
        hi_t = jnp.max(idx_t) // Q

        def body(s, acc, idx_t=idx_t):
            onehot = (idx_t[:, :, None] == (col + s * Q)).astype(jnp.float32)
            x_tile = x_ref[:, :, pl.ds(pl.multiple_of(s * Q, Q), Q)]  # [R, DT, S]
            return acc + jax.lax.dot_general(
                x_tile,
                onehot,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )

        acc = jax.lax.fori_loop(
            lo_t,
            hi_t + 1,
            body,
            jnp.zeros((r, x_ref.shape[1], Q), jnp.float32),
        )
        out_ref[:, :, t * Q : (t + 1) * Q] = acc


def _scatter_kernel(k: int, idx_ref, g_ref, dx_ref):
    """Transpose of the one-hot gather: dx[d, s] = Σ_q 1[idx_q == s] · g[d, q].

    Ancestor indices are monotone (positions are sorted), so the queries
    hitting a support tile form a contiguous band — found with two O(K)
    full-row counts per support tile, then accumulated tile-by-tile.
    """
    from jax.experimental import pallas as pl

    r = idx_ref.shape[0]
    nq = k // Q
    idx_all = idx_ref[:]
    srow = jax.lax.broadcasted_iota(jnp.int32, (1, Q, 1), 1)

    for st in range(nq):
        in_lo = jnp.sum((idx_all < st * Q).astype(jnp.int32), axis=-1)  # [R]
        in_hi = jnp.sum((idx_all < (st + 1) * Q).astype(jnp.int32), axis=-1)
        lo_t = jnp.min(in_lo) // Q
        hi_t = (jnp.max(in_hi) - 1) // Q  # < lo_t when the tile has no queries

        def body(qt, acc):
            q0 = pl.multiple_of(qt * Q, Q)
            idx_t = idx_ref[:, pl.ds(q0, Q)]  # [R, Q]
            g_t = g_ref[:, :, pl.ds(q0, Q)]  # [R, DT, Q]
            onehot = (idx_t[:, None, :] == (srow + st * Q)).astype(jnp.float32)
            return acc + jax.lax.dot_general(
                g_t,
                onehot,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )

        acc = jax.lax.fori_loop(
            lo_t,
            hi_t + 1,
            body,
            jnp.zeros((r, g_ref.shape[1], Q), jnp.float32),
        )
        dx_ref[:, :, st * Q : (st + 1) * Q] = acc


def _indices_jnp(u: jax.Array, logw: jax.Array) -> jax.Array:
    logw_norm, _ = jnp_resampling.log_normalize(logw, axis=-1)
    cumw = jnp.cumsum(jnp.exp(logw_norm), axis=-1)
    return jnp_resampling.inverse_cdf_indices(cumw, u)


@jax.custom_vjp
def resample_and_gather(u: jax.Array, logw: jax.Array, x: jax.Array):
    """Fused inverse-CDF resampling + particle gather (channel-major).

    u [B,K] sorted quantile positions, logw [B,K], x [B,D,K]
    -> (idx [B,K] i32, x_res [B,D,K]).

    Gradient semantics: d x_res/d x is the exact selection matrix (offspring
    copy gradients back to their ancestor — the reparameterized path FIVO
    keeps); d/d logw and d/d u are zero (stop-gradient through the discrete
    ancestor choice, SURVEY.md §3.2).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    batch, k = logw.shape
    d = x.shape[-2]
    if not _usable(batch, k):
        idx = _indices_jnp(u, logw)
        return idx, jnp_resampling.gather_particles(x, idx)

    dp = _round_up(d, D_TILE)
    x_p = jnp.pad(x, ((0, 0), (0, dp - d), (0, 0))) if dp != d else x
    r = ROW_BLOCK
    idx, out = pl.pallas_call(
        functools.partial(_fused_kernel, k),
        grid=(batch // r, dp // D_TILE),
        in_specs=[
            pl.BlockSpec((r, k), lambda b, dd: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r, k), lambda b, dd: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (r, D_TILE, k), lambda b, dd: (b, dd, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec((r, k), lambda b, dd: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (r, D_TILE, k), lambda b, dd: (b, dd, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((batch, k), jnp.int32),
            jax.ShapeDtypeStruct((batch, dp, k), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((r, k), jnp.float32)],
        interpret=_INTERPRET,
    )(logw, u, x_p)
    return idx, out[:, :d, :] if dp != d else out


def _rg_fwd(u, logw, x):
    idx, x_res = resample_and_gather(u, logw, x)
    # Named residual: without it, jax.checkpoint re-runs this whole kernel in
    # the backward just to rebuild idx for the scatter VJP (measured in round
    # 1: the rematted pallas_call dominated the backward). idx is [B,K] i32 —
    # cheap to save.
    idx = _checkpoint_name(idx, "resample_idx")
    return (idx, x_res), (u, logw, idx)


def _rg_bwd(res, cots):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    u, logw, idx = res
    _, g_x = cots  # cotangent of idx is int/zero
    batch, k = idx.shape
    d = g_x.shape[-2]
    if not _usable(batch, k):
        # cm scatter-add: dx[b, :, idx[b, q]] += g[b, :, q]
        dx = (
            jnp.zeros_like(g_x)
            .at[jnp.arange(batch)[:, None], :, idx]
            .add(jnp.swapaxes(g_x, -1, -2))
        )
    else:
        dp = _round_up(d, D_TILE)
        g_p = (
            jnp.pad(g_x, ((0, 0), (0, dp - d), (0, 0))) if dp != d else g_x
        )
        r = ROW_BLOCK
        dx = pl.pallas_call(
            functools.partial(_scatter_kernel, k),
            grid=(batch // r, dp // D_TILE),
            in_specs=[
                pl.BlockSpec((r, k), lambda b, dd: (b, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (r, D_TILE, k), lambda b, dd: (b, dd, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (r, D_TILE, k), lambda b, dd: (b, dd, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((batch, dp, k), jnp.float32),
            interpret=_INTERPRET,
        )(idx, g_p)
        if dp != d:
            dx = dx[:, :d, :]
    return jnp.zeros_like(u), jnp.zeros_like(logw), dx


resample_and_gather.defvjp(_rg_fwd, _rg_bwd)

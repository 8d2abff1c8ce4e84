"""Branch-free Pallas resampling kernel: normalize + cumsum + inverse-CDF.

The north-star op (BASELINE.json): "resampling (multinomial + systematic)
becomes a branch-free Pallas cumsum+searchsorted gather so the data-dependent
ancestor selection stays on-device". One kernel per batch-row block fuses what
the jnp path runs as ~5 separate HLOs (max, exp, sum, cumsum, searchsorted):

- log-weights normalize in VMEM (max-shifted exp, sum);
- inclusive cumulative sum via branch-free log-step doubling (shift-and-add
  with an iota mask — `jnp.cumsum` is not guaranteed to lower in Mosaic);
- ancestor indices by *compare-and-count*: a_i = Σ_j 1[cumw_j ≤ u_i],
  evaluated in (query-tile × support-tile) blocks on the VPU — no binary
  search, no data-dependent control flow, fully vectorized.

O(K²/8·128) VPU work per row: the right trade below K ≈ 2048 where the whole
row fits VMEM and the quadratic term is cheaper than XLA's sort-based merge.
Larger K falls back to the jnp path (`psvo_tpu.ops.resampling`). The gather
itself stays outside the kernel — XLA's take_along_axis is already a single
efficient dynamic-gather HLO.

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

ROW_BLOCK = 8  # batch rows per kernel instance (sublane width)
MAX_K = 2048  # above this the quadratic compare-count loses to XLA's sort
QUERY_TILE = 128


def _rows_per_block(batch: int, k: int) -> int:
    """Batch rows per kernel instance for the D-carrying (gather/scatter)
    kernels.

    R is pinned to the sublane width 8: Mosaic requires the second-to-last
    block dim of the 2-D (logw/u) refs to be divisible by 8 (or be the full
    axis), and `_fused_usable` already gates on `batch % ROW_BLOCK == 0`, so
    the full-batch return below is only reached by non-fused callers.
    VMEM accounting at the R=8 / K=1024 ceiling: the [R, K, D] buffers
    lane-pad D to 128 → 4 MB per buffer; with in/out + double buffering this
    presses the 16 MB budget, which is why MAX_K stops at 2048 for the 2-D
    kernels and the D-carrying fused path is only enabled where measured to
    fit (tests/test_pallas.py exercises the compiled kernel at the ceiling).
    """
    return 8 if batch % 8 == 0 else batch


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


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


def _kernel(k: int, method: str, logw_ref, u_ref, idx_ref):
    """logw [R, K] f32, u [R, K] f32 (quantile positions) -> idx [R, K] i32."""
    logw = logw_ref[:]
    m = jnp.max(logw, axis=-1, keepdims=True)
    w = jnp.exp(logw - m)
    cumw = _doubling_cumsum(w)
    total = cumw[:, -1:]  # normalizer: cumw becomes the CDF
    u = u_ref[:] * total  # compare u*total <= cumw instead of dividing K values

    # compare-and-count in query tiles: a_i = sum_j [cumw_j <= u_i]
    for q0 in range(0, k, QUERY_TILE):
        u_tile = u[:, q0 : q0 + QUERY_TILE]  # [R, Q]
        # [R, Q, K] boolean is too big; accumulate over support tiles instead
        count = jnp.zeros(u_tile.shape, jnp.int32)
        for s0 in range(0, k, QUERY_TILE):
            c_tile = cumw[:, s0 : s0 + QUERY_TILE]  # [R, S]
            le = c_tile[:, None, :] <= u_tile[:, :, None]  # [R, Q, S]
            count = count + jnp.sum(le.astype(jnp.int32), axis=-1)
        idx_ref[:, q0 : q0 + QUERY_TILE] = jnp.minimum(count, k - 1)


def _fused_kernel(k: int, logw_ref, u_ref, x_ref, idx_ref, out_ref):
    """Fused inverse-CDF + particle gather (the north-star op end-to-end).

    logw [R,K], u [R,K], x [R,K,D] -> idx [R,K] i32, x_out [R,K,D].

    The gather is an exact one-hot contraction: after counting ancestor
    indices a_i, the selection matrix M_ij = [a_i == j] (built per tile with
    broadcasted iota — branch-free) contracts against the particles:
    out[q, d] = Σ_s M[q, s] x[s, d]. Profiling showed XLA's dynamic gather at
    0.22 ms/step — over half the whole SMC step — while this contraction is
    ordinary VPU/MXU work on data already in VMEM.
    """
    logw = logw_ref[:]
    m = jnp.max(logw, axis=-1, keepdims=True)
    w = jnp.exp(logw - m)
    cumw = _doubling_cumsum(w)
    total = cumw[:, -1:]
    u = u_ref[:] * total

    for q0 in range(0, k, QUERY_TILE):
        u_tile = u[:, q0 : q0 + QUERY_TILE]  # [R, Q]
        count = jnp.zeros(u_tile.shape, jnp.int32)
        for s0 in range(0, k, QUERY_TILE):
            c_tile = cumw[:, s0 : s0 + QUERY_TILE]
            le = c_tile[:, None, :] <= u_tile[:, :, None]
            count = count + jnp.sum(le.astype(jnp.int32), axis=-1)
        idx = jnp.minimum(count, k - 1)  # [R, Q]
        idx_ref[:, q0 : q0 + QUERY_TILE] = idx

        # one-hot gather: accumulate over support tiles
        acc = jnp.zeros((*u_tile.shape, x_ref.shape[-1]), jnp.float32)  # [R,Q,D]
        col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, QUERY_TILE), 2)
        for s0 in range(0, k, QUERY_TILE):
            onehot = (idx[:, :, None] == (col + s0)).astype(jnp.float32)  # [R,Q,S]
            x_tile = x_ref[:, s0 : s0 + QUERY_TILE, :]  # [R,S,D]
            acc = acc + jax.lax.dot_general(
                onehot,
                x_tile,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
        out_ref[:, q0 : q0 + QUERY_TILE, :] = acc


def _scatter_kernel(k: int, idx_ref, g_ref, out_ref):
    """Transpose of the one-hot gather: out[s, d] = Σ_q [idx_q == s] g[q, d].

    The VJP of `resample_and_gather` w.r.t. the particles — a segment-sum over
    offspring, built from the same branch-free one-hot tiles.
    """
    idx = idx_ref[:]
    row = jax.lax.broadcasted_iota(jnp.int32, (1, QUERY_TILE, 1), 1)
    for s0 in range(0, k, QUERY_TILE):
        acc = jnp.zeros((idx.shape[0], QUERY_TILE, g_ref.shape[-1]), jnp.float32)
        for q0 in range(0, k, QUERY_TILE):
            idx_tile = idx[:, q0 : q0 + QUERY_TILE]  # [R, Q]
            onehot_t = (idx_tile[:, None, :] == (row + s0)).astype(
                jnp.float32
            )  # [R, S, Q]: onehot_t[r, s, q] = [idx_q == s0+s]
            g_tile = g_ref[:, q0 : q0 + QUERY_TILE, :]  # [R, Q, D]
            acc = acc + jax.lax.dot_general(
                onehot_t,
                g_tile,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
        out_ref[:, s0 : s0 + QUERY_TILE, :] = acc


def _fused_usable(batch: int, k: int) -> bool:
    return (
        ENABLE
        and (_on_tpu() or _INTERPRET)
        and k <= MAX_K
        and k % QUERY_TILE == 0
        and batch % ROW_BLOCK == 0
    )


@jax.custom_vjp
def resample_and_gather(u: jax.Array, logw: jax.Array, x: jax.Array):
    """Fused inverse-CDF resampling + particle gather.

    u [B,K] sorted quantile positions, logw [B,K], x [B,K,D]
    -> (idx [B,K] i32, x_res [B,K,D]).

    Gradient semantics: d x_res/d x is the exact selection matrix (offspring
    copy gradients back to their ancestor — the reparameterized path FIVO
    keeps); d/d logw and d/d u are zero (stop-gradient through the discrete
    ancestor choice, SURVEY.md §3.2).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    batch, k = logw.shape
    d = x.shape[-1]
    if not _fused_usable(batch, k):
        idx = resample_indices_from_positions(u, logw)
        return idx, jnp_resampling.gather_particles(x, idx)

    r = _rows_per_block(batch, k)
    return pl.pallas_call(
        functools.partial(_fused_kernel, k),
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
        interpret=_INTERPRET,
    )(logw, u, x)


def _rg_fwd(u, logw, x):
    idx, x_res = resample_and_gather(u, logw, x)
    # Named residual: without it, jax.checkpoint re-runs this whole kernel in
    # the backward just to rebuild idx for the scatter VJP (measured: the
    # rematted pallas_call dominated the backward and its lane-padded scoped
    # buffers OOM'd VMEM at B=64). idx is [B,K] i32 — cheap to save.
    idx = _checkpoint_name(idx, "resample_idx")
    return (idx, x_res), (u, logw, idx)


def _rg_bwd(res, cots):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    u, logw, idx = res
    _, g_x = cots  # cotangent of idx is int/zero
    batch, k = idx.shape
    d = g_x.shape[-1]
    if not _fused_usable(batch, k):
        dx = jnp.zeros_like(g_x).at[
            jnp.arange(batch)[:, None], idx
        ].add(g_x)
    else:
        r = _rows_per_block(batch, k)
        dx = pl.pallas_call(
            functools.partial(_scatter_kernel, k),
            grid=(batch // r,),
            in_specs=[
                pl.BlockSpec((r, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (r, k, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (r, k, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((batch, k, d), jnp.float32),
            interpret=_INTERPRET,
        )(idx, g_x)
    return jnp.zeros_like(u), jnp.zeros_like(logw), dx


resample_and_gather.defvjp(_rg_fwd, _rg_bwd)


def resample_indices_from_positions(u: jax.Array, logw: jax.Array) -> jax.Array:
    """Ancestor indices [B, K] from [B, K] quantile positions."""
    batch, k = logw.shape
    usable = (
        ENABLE
        and (_on_tpu() or _INTERPRET)
        and k <= MAX_K
        and k % QUERY_TILE == 0
        and batch % ROW_BLOCK == 0
    )
    if not usable:
        logw_norm, _ = jnp_resampling.log_normalize(logw, axis=-1)
        cumw = jnp.cumsum(jnp.exp(logw_norm), axis=-1)
        return jnp_resampling.inverse_cdf_indices(cumw, u)

    return _indices_nondiff(logw, u)


def resample_indices_from_raw(
    u_raw: jax.Array, logw: jax.Array, method: str = "systematic"
) -> jax.Array:
    """Ancestor indices [B, K] from raw uniforms (see resampling.raw_uniforms)."""
    u = jnp_resampling.quantile_positions_from_raw(u_raw, logw.shape[-1], method)
    return resample_indices_from_positions(u, logw)


@jax.custom_vjp
def _indices_nondiff(logw: jax.Array, u: jax.Array) -> jax.Array:
    """Ancestor indices are integers — no gradient path exists through them
    (FIVO stop-gradient semantics, SURVEY.md §3.2). The custom VJP makes that
    explicit so jax.checkpoint/linearize never ask the kernel for rules."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    batch, k = logw.shape
    return pl.pallas_call(
        functools.partial(_kernel, k, "inverse_cdf"),
        grid=(batch // ROW_BLOCK,),
        in_specs=[
            pl.BlockSpec((ROW_BLOCK, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ROW_BLOCK, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (ROW_BLOCK, k), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((batch, k), jnp.int32),
        interpret=_INTERPRET,
    )(logw, u)


def _indices_fwd(logw, u):
    return _indices_nondiff(logw, u), (logw, u)


def _indices_bwd(res, _g):
    logw, u = res
    return jnp.zeros_like(logw), jnp.zeros_like(u)


_indices_nondiff.defvjp(_indices_fwd, _indices_bwd)


def resample_indices(key: jax.Array, logw: jax.Array, method: str = "systematic"):
    """Convenience wrapper drawing the uniforms from a key (tests/eval)."""
    batch, k = logw.shape
    u_raw = jnp_resampling.raw_uniforms(key, batch, k, method)
    return resample_indices_from_raw(u_raw, logw, method)

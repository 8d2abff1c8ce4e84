"""Fused Pallas resampling kernel: normalize + cumsum + inverse-CDF + gather.

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

1. log-weights normalize (max-shifted exp) + inclusive cumulative sum as
   MXU work (`jnp.cumsum` is not guaranteed in Mosaic; a log-step-doubling
   lane-roll variant measured 2× slower — see _tri_cumsum);
2. inverse-CDF by compare-and-count  a_i = Σ_j 1[cumw_j ≤ u_i]  over a
   STATIC (K/128)² tile sweep. A data-dependent banded variant (both
   sequences are sorted, so only ~2 support tiles per query tile matter) was
   built and measured: its `fori_loop`s cost 10s of µs of scalar-loop
   overhead EACH, 5-10× the skipped work at any VMEM-feasible K — static
   quadratic wins outright below MAX_K (see _fused_kernel);
3. the gather is an exact one-hot contraction on the MXU:
   out[d, q] = Σ_s 1[a_q == s] · x[d, s]. Profiling round 1 showed XLA's
   dynamic gather at 0.22 ms/step — over half the whole SMC step at K=1024.

The D axis is tiled over the grid (last-fastest), so large-D states (e.g.
Lorenz-96, D=40) stream through the same kernel; ancestor indices are
computed once per batch block (first D step) and re-read from the output
buffer, which Pallas keeps resident across grid steps of the same block.

The custom VJP is a second kernel: the transpose one-hot contraction
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

# Fine-stage chunk budget of the two-level count (bytes of the [R, C, Q']
# intermediate): 2 MB measured fastest at rb=8/K=1024 round 3; module-level
# so perf A/Bs can sweep it without editing the formula in two places.
# Re-swept at rb=16 inside the whole-scan megakernel (v5e 2026-08-20,
# primary config end-to-end): 2 MB 13.71 ms/step, 4 MB 13.81, 8 MB 14.70,
# 16 MB 14.73 — the round-3 choice transfers; larger chunks lose to VMEM
# pressure, not dot count.
_FINE_CHUNK_BYTES = 2 * 1024 * 1024
# Measured ceiling (v5e, 2026-08-17): the static quadratic tile sweep costs
# O((K/Q)²) tile pairs; at K=1024 that is 0.085 ms/step (vs 0.21 banded-fori
# and 0.65 jnp) but at K=8192 the 4096 pairs (~2-3 ms) lose to the jnp
# histogram path's ~1 ms — which at that size is itself a minority of the
# MLP-bound step. Above MAX_K the jnp path (histogram + XLA gather) takes
# over. VMEM would allow K=8192 ([8, 8, K] blocks are 2 MB).
MAX_K = 2048

# Mosaic's default scoped-VMEM limit is 16 MiB; the large-K kernels' live
# temporaries legitimately exceed it (the K=8192 two-level count holds
# ~34 MiB of in-flight [R, K]-scale tensors). v5e VMEM is 128 MiB physical —
# grant half and let Mosaic fail loudly past that. Shared by pallas_step.
_VMEM_LIMIT = 64 * 1024 * 1024


def _vmem_params():
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)


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


def _tri_cumsum(w: jax.Array, exact: bool = False) -> jax.Array:
    """Inclusive lane-axis cumsum as MXU work: per-128-lane-tile cumsums via a
    [Q, Q] triangular-ones contraction, plus a tiny tile-offset prefix sum.

    The log-step doubling formulation costs 10 lane-roll passes (~16 µs/step
    at K=1024, measured); this is two small matmuls.
    """
    r, k = w.shape
    nq = k // Q
    # exact=True: HIGHEST keeps the summand operands in full f32 (the
    # default MXU pass rounds them to bf16 — fine for the CDF whose ties
    # the callers tolerate, not for the segment-sum prefixes)
    prec = jax.lax.Precision.HIGHEST if exact else None
    wt = w.reshape(r, nq, Q)
    row = jax.lax.broadcasted_iota(jnp.int32, (Q, Q), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (Q, Q), 1)
    tri = (row <= col).astype(jnp.float32)
    within = jax.lax.dot_general(
        wt, tri, dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )  # [R, nq, Q]
    if nq > 1:
        sums = within[:, :, Q - 1]  # [R, nq] per-tile totals
        row_n = jax.lax.broadcasted_iota(jnp.int32, (nq, nq), 0)
        col_n = jax.lax.broadcasted_iota(jnp.int32, (nq, nq), 1)
        tri_ex = (row_n < col_n).astype(jnp.float32)
        offs = jax.lax.dot_general(
            sums, tri_ex, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )  # [R, nq] exclusive tile offsets
        within = within + offs[:, :, None]
    return within.reshape(r, k)


def _two_level_count(vals: jax.Array, queries: jax.Array, k: int) -> jax.Array:
    """cnt[r, i] = #{j : vals[r, j] <= queries[r, i]} for SORTED vals, O(K·S).

    The count decomposes exactly as
        cnt_i = Q * #{s : Bnd_s <= q_i} + #{j in tile c_i : vals_j <= q_i}
    (Bnd = per-128-lane-tile last value = tile max under sortedness, c_i the
    first tile whose boundary exceeds q_i, clamped to the last tile): the
    The count decomposes exactly as
        cnt_i = Q * #{s : Bnd_s <= q_i} + #{p in tile c_i : vals_p <= q_i}
    (Bnd = per-128-lane-tile maxima under sortedness, c_i clamped to the
    last tile; when every boundary is <= q_i the clamped last tile
    contributes a full Q, so cnt reaches K without a special case).
    Counts <= K < 2^24: f32 exact.

    Layout (round-3 ablation-tuned; three orientations were measured):
    the S-indexed boundary tensors keep S on the SUBLANE axis ([R, S, C],
    queries C on lanes) — the original [R, C, S] form lane-padded S=8 to
    128 and those padded compares measured ~28 us of the 75 us forward
    megakernel at K=1024 for ~2 us of useful work. The fine stage stays
    LANE-oriented ([R, C, Q'] via the one-hot MXU contraction): an
    all-sublane variant (sel/le as [R, Q', C] with rank-1 sublane-dim
    dots) forced operand relayouts and measured 1.5x WORSE overall.

    vals/queries [R, K]; returns i32 [R, K] counts in [0, K].
    """
    r = vals.shape[0]
    s_tiles = k // Q
    v3 = vals.reshape(r, s_tiles, Q)
    bnd = v3[:, :, Q - 1 :]  # [R, S, 1] per-tile maxima (sorted input)
    srow = jax.lax.broadcasted_iota(jnp.int32, (1, s_tiles, 1), 1)
    ones_q = jnp.ones((Q, 1), jnp.float32)

    # chunk C so the [R, C, Q'] fine intermediate stays <= ~2 MB (measured
    # sweet spot: 4 MB single-chunk form ran 4 us/call slower at K=1024)
    c = min(k, max(Q, (_FINE_CHUNK_BYTES // 4) // (r * Q) // Q * Q))
    chunks = []
    for t in range(0, k, c):
        # slice-then-expand: the fused queries[:, None, t:t+c] form lowers
        # to a lax.gather Mosaic rejects
        q_t = jax.lax.slice_in_dim(queries, t, t + c, axis=1)  # [R, C]
        q_sub = jnp.expand_dims(q_t, 1)  # [R, 1, C]
        ge = (q_sub >= bnd).astype(jnp.float32)  # [R, S, C] — S on sublanes
        coarse = jnp.sum(ge, axis=1)  # [R, C] sublane reduction, S <= 256
        coarse_i = jnp.minimum(coarse.astype(jnp.int32), s_tiles - 1)
        onehot_s = (coarse_i[:, None, :] == srow).astype(jnp.float32)  # [R,S,C]
        # fold -q into the contraction as an extra sublane slot (paired with
        # a ones row in v3) so the fine compare is against SCALAR zero — the
        # explicit sel <= q[:, :, None] broadcast relayouts q from lanes to
        # sublanes and measured ~20 us/call at K=1024 (round-3 ablation)
        oh_aug = jnp.concatenate([onehot_s, -q_sub], axis=1)  # [R, S+1, C]
        v3_aug = jnp.concatenate(
            [v3, jnp.ones((r, 1, Q), jnp.float32)], axis=1
        )
        sel_mq = jax.lax.dot_general(  # (query's own tile of values) - q
            oh_aug, v3_aug, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [R, C, Q']
        le = (sel_mq <= 0.0).astype(jnp.float32)
        fine = jax.lax.dot_general(
            le, ones_q, dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )[..., 0]
        chunks.append(Q * coarse_i + fine.astype(jnp.int32))
    return chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks, axis=-1)


def _two_level_indices(logw: jax.Array, u_raw: jax.Array, k: int) -> jax.Array:
    """Inverse-CDF ancestor indices for one [R, K] block, O(K) work.

    a_i = #{j : C_j <= U_i} via the two-level count (_two_level_count) on the
    inclusive CDF — vs the original quadratic (K/Q)² tile sweep, which
    measured 68.6 µs/step of the 109 µs forward timestep at K=1024 (round-3
    profile). Sorted u (both resampling schemes sort their positions —
    resampling.quantile_positions_from_raw) makes the output monotone.

    Returns idx [R, K] i32, clipped to [0, K-1].
    """
    m = jnp.max(logw, axis=-1, keepdims=True)
    w = jnp.exp(logw - m)
    cumw = _tri_cumsum(w)
    # compare u*total <= cumw instead of dividing the K-vector
    u = u_raw * cumw[:, -1:]
    return jnp.minimum(_two_level_count(cumw, u, k), k - 1)


def _fused_kernel(k: int, logw_ref, u_ref, x_ref, idx_ref, out_ref):
    """One batch row-block × one D tile.

    logw/u [R, K]; x [R, DT, K]; outputs idx [R, K] i32 (written on the first
    D step, re-read after — Pallas keeps the block resident across the D
    grid steps), x_out [R, DT, K].

    STATIC tile loops throughout. An earlier banded variant used
    `fori_loop`s with data-dependent bounds to touch only in-band tiles —
    measured at ~10s of µs of scalar-loop overhead PER LOOP, which at
    K=1024 (16 loops/call) made the resample 0.21 ms/step: 5× the entire
    rest of the SMC body, and at K=8192 5× slower than the jnp fallback.
    The index pass is the O(K) two-level count (see _two_level_indices —
    round 3 replaced the quadratic compare-and-count sweep); the one-hot
    gather keeps the static quadratic tile sweep (its dots are real [Q, Q]
    MXU contractions, ~3 µs total at K=1024).
    """
    from jax.experimental import pallas as pl

    nq = k // Q
    d_step = pl.program_id(1)

    # ---- Pass 1 (first D step only): CDF + two-level count indices.
    @pl.when(d_step == 0)
    def _():
        idx_ref[:] = _two_level_indices(logw_ref[:], u_ref[:], k)

    # ---- Pass 2 (every D step): one-hot gather for this feature tile.
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, Q), 2)
    for t in range(nq):
        idx_t = idx_ref[:, t * Q : (t + 1) * Q]  # [R, Q] (resident block)
        acc = jnp.zeros((idx_t.shape[0], x_ref.shape[1], Q), jnp.float32)
        for s in range(nq):
            onehot = (idx_t[:, :, None] == (col + s * Q)).astype(jnp.float32)
            x_tile = x_ref[:, :, s * Q : (s + 1) * Q]  # [R, DT, S]
            acc = acc + jax.lax.dot_general(
                x_tile,
                onehot,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
        out_ref[:, :, t * Q : (t + 1) * Q] = acc


def _scatter_kernel(k: int, idx_ref, g_ref, dx_ref):
    """Transpose of the one-hot gather: dx[d, s] = Σ_q 1[idx_q == s] · g[d, q].

    Same static quadratic tile sweep as the forward (see _fused_kernel on
    why static beats data-dependent banding here).
    """
    nq = k // Q
    srow = jax.lax.broadcasted_iota(jnp.int32, (1, Q, 1), 1)

    for st in range(nq):
        acc = jnp.zeros((idx_ref.shape[0], g_ref.shape[1], Q), jnp.float32)
        for qt in range(nq):
            idx_t = idx_ref[:, qt * Q : (qt + 1) * Q]  # [R, Q]
            g_t = g_ref[:, :, qt * Q : (qt + 1) * Q]  # [R, DT, Q]
            onehot = (idx_t[:, None, :] == (srow + st * Q)).astype(jnp.float32)
            acc = acc + jax.lax.dot_general(
                g_t,
                onehot,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
        dx_ref[:, :, st * Q : (st + 1) * Q] = acc


def _indices_jnp(u: jax.Array, logw: jax.Array) -> jax.Array:
    logw_norm, _ = jnp_resampling.log_normalize(logw, axis=-1)
    cumw = jnp.cumsum(jnp.exp(logw_norm), axis=-1)
    return jnp_resampling.inverse_cdf_indices(cumw, u)


# ---------------------------------------------------------------------------
# Large-K indices-only kernel: O(K) two-level static one-hot.
#
# Above MAX_K the fused gather's quadratic tile sweep stops paying, but the
# INDEX computation stays kernel-worthy: the jnp fallback's histogram
# formulation needs a scatter-add, profiled at 0.57 ms/step at K=8192 — half
# the whole SMC step. Here the rank decomposes exactly as
#
#   a_i = Q * #{s : Bnd_s <= U_i}  +  #{j in tile c_i : C_j <= U_i}
#
# (Bnd = per-128-lane-tile CDF boundaries, c_i the first tile whose boundary
# exceeds U_i): the coarse count is a [Q, S] compare + ones-dot, and the fine
# count compares against the ONE relevant tile, materialized per query by a
# one-hot [Q, S] x [S, Q'] MXU contraction. Total work O(K * S) with S = K/128
# boundaries — no dynamic loops, no scatter, no lane reductions. The gather
# itself stays on XLA's dynamic-gather (0.43 ms/step — acceptable; an O(K)
# in-VMEM gather would need per-lane addressing the hardware doesn't have).
# ---------------------------------------------------------------------------

MAX_K_IDX = 32768  # cumw [8, K] f32 = 1 MB at the cap; S = 256 boundaries


def _indices_kernel(k: int, logw_ref, u_ref, idx_ref):
    idx_ref[:] = _two_level_indices(logw_ref[:], u_ref[:], k)


@jax.custom_vjp
def _indices_large(u: jax.Array, logw: jax.Array) -> jax.Array:
    """Ancestor indices are integers — no gradient path exists through them
    (FIVO stop-gradient semantics); the custom VJP makes that explicit so
    jax.checkpoint/linearize never ask the kernel for rules."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    batch, k = logw.shape
    return pl.pallas_call(
        functools.partial(_indices_kernel, k),
        grid=(batch // ROW_BLOCK,),
        in_specs=[
            pl.BlockSpec((ROW_BLOCK, k), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ROW_BLOCK, k), lambda b: (b, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (ROW_BLOCK, k), lambda b: (b, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((batch, k), jnp.int32),
        compiler_params=_vmem_params(),
        interpret=_INTERPRET,
    )(logw, u)


_indices_large.defvjp(
    lambda u, logw: (_indices_large(u, logw), (u, logw)),
    lambda res, _g: (jnp.zeros_like(res[0]), jnp.zeros_like(res[1])),
)


def _idx_usable(batch: int, k: int) -> bool:
    return (
        ENABLE
        and (_on_tpu() or _INTERPRET)
        and k % Q == 0
        and k <= MAX_K_IDX
        and batch % ROW_BLOCK == 0
    )


# ---------------------------------------------------------------------------
# Large-K windowed gather/scatter: O(K·W) data movement for SORTED indices.
#
# Above the fused cap the particle movement fell to XLA's dynamic gather and
# its backward scatter-add — profiled at 0.43 + ~0.45 ms/step at K=8192/D=40
# (BASELINE.md row 5): random lane-axis addressing runs at ~50 GB/s, 6% of
# HBM bandwidth. But inverse-CDF ancestor indices are MONOTONE (sorted query
# positions — resampling.quantile_positions_from_raw), so query tile t only
# reads source lanes in [idx[t·Q], idx[t·Q+Q−1]] — a narrow window in the
# common case (idx ≈ identity at healthy ESS). Each query tile gathers from
# a W_TILES-wide window anchored at a per-tile scalar (SMEM input, read as
# pl.ds offsets — the anchor is 128-aligned so the dynamic lane slice stays
# on vreg boundaries); in-window movement is the hardware lane gather + tile
# select of _lane_gather. The transpose (scatter) mirrors it: source tile s
# is written only by the contiguous query range [r_lo(s), r_hi(s)) (monotone
# again), a W-window of cotangent lanes contracted against a per-tile
# one-hot on the MXU.
#
# Exactness is NOT probabilistic: a cheap validity reduction (do all tiles'
# spans fit their windows?) gates a lax.cond — degenerate weight vectors
# (a >896-lane run of zero-offspring particles inside one query tile's span)
# take the XLA fallback branch at runtime. Out-of-range loads cannot happen
# in the kernels themselves: fine indices are masked to [0, Q) and anchors
# are pre-clamped to [0, nq−W], so an invalid input could only produce wrong
# values (never touched memory) — and validity gating means it never runs.
# ---------------------------------------------------------------------------

W_TILES = 8  # window width in 128-lane tiles
MAX_K_WIN = 8192  # [8, 8, K] f32 in/out blocks = 2 MB each at the cap
WIN_ENABLE = True  # independent kill-switch for A/B against the XLA path


def _win_usable(batch: int, k: int) -> bool:
    return (
        ENABLE
        and WIN_ENABLE
        and (_on_tpu() or _INTERPRET)
        and k % Q == 0
        and W_TILES * Q <= k <= MAX_K_WIN
        and batch % ROW_BLOCK == 0
    )


def _win_gather_kernel(k, w, idx_ref, anch_ref, x_ref, out_ref):
    """out[r, d, q] = x[r, d, idx[r, q]] given every idx in query tile t lies
    in window [anch_t·Q, (anch_t+w)·Q). idx [R, K] VMEM, anch [1, nq] SMEM,
    x/out [R, DT, K] VMEM."""
    from jax.experimental import pallas as pl

    nq = k // Q
    r, dt = x_ref.shape[0], x_ref.shape[1]

    # fori_loop, NOT a static range: 64 unrolled iterations at K=8192 each
    # hold a live data-dependent window slice + temporaries, and Mosaic
    # stack-allocates them all at once (~105 MB scoped VMEM — compile
    # failure). One dynamic loop reuses a single iteration's buffers; its
    # one-time scalar overhead is noise at this path's ms-scale step cost.
    def body(t, carry):
        a = anch_ref[0, t]
        win = x_ref[:, :, pl.ds(a * Q, w * Q)].reshape(r * dt, w * Q)
        loc = idx_ref[:, pl.ds(t * Q, Q)] - a * Q  # [R, Q] in [0, w·Q)
        coarse = jax.lax.shift_right_logical(loc, 7)
        fine = jnp.bitwise_and(loc, Q - 1)
        c2 = jnp.broadcast_to(coarse[:, None, :], (r, dt, Q)).reshape(r * dt, Q)
        f2 = jnp.broadcast_to(fine[:, None, :], (r, dt, Q)).reshape(r * dt, Q)
        acc = jnp.zeros((r * dt, Q), x_ref.dtype)
        for s in range(w):
            g = jnp.take_along_axis(
                win[:, s * Q : (s + 1) * Q], f2, axis=1, mode="promise_in_bounds"
            )
            acc = jnp.where(c2 == s, g, acc)
        out_ref[:, :, pl.ds(t * Q, Q)] = acc.reshape(r, dt, Q)
        return carry

    jax.lax.fori_loop(0, nq, body, 0)


def _win_scatter_kernel(k, w, idx_ref, anch_ref, g_ref, dx_ref):
    """dx[r, d, s·Q+j] = Σ_q 1[idx_q == s·Q+j]·g[r, d, q], where all writers
    of source tile s sit in query window [anch_s·Q, (anch_s+w)·Q). The
    window one-hot is exact even when the window is a superset of the
    writers: indices outside tile s never match its lane iota."""
    from jax.experimental import pallas as pl

    nq = k // Q
    r, dt = g_ref.shape[0], g_ref.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, Q), 2)

    # fori_loop for the same stack-reuse reason as _win_gather_kernel.
    def body(s, carry):
        qa = anch_ref[0, s]
        gwin = g_ref[:, :, pl.ds(qa * Q, w * Q)]
        iwin = idx_ref[:, pl.ds(qa * Q, w * Q)]
        acc = jnp.zeros((r, dt, Q), jnp.float32)
        for sw in range(w):  # chunked: a [R, w·Q, Q] one-hot would be 4 MB
            i_c = iwin[:, sw * Q : (sw + 1) * Q]
            onehot = (i_c[:, :, None] == s * Q + col).astype(jnp.float32)
            acc = acc + jax.lax.dot_general(
                gwin[:, :, sw * Q : (sw + 1) * Q], onehot,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
        dx_ref[:, :, pl.ds(s * Q, Q)] = acc
        return carry

    jax.lax.fori_loop(0, nq, body, 0)


def _win_pallas_call(kernel, k, w, idx, anch, val, out_k=None):
    """Shared pallas_call plumbing: grid (row-blocks, D tiles); idx + anchors
    replicate over the D grid axis; val is x (gather) or g (scatter). The
    compact-gather branch passes a NARROW source (val width w·Q, all anchors
    0) with `out_k` restoring the full query width."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    batch, dp, vk = val.shape
    ok = vk if out_k is None else out_k
    nq = k // Q
    return pl.pallas_call(
        functools.partial(kernel, k, w),
        grid=(batch // ROW_BLOCK, dp // D_TILE),
        in_specs=[
            pl.BlockSpec(
                (ROW_BLOCK, k), lambda b, dd: (b, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, nq), lambda b, dd: (b, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (ROW_BLOCK, D_TILE, vk),
                lambda b, dd: (b, dd, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (ROW_BLOCK, D_TILE, ok), lambda b, dd: (b, dd, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((batch, dp, ok), val.dtype),
        compiler_params=_vmem_params(),
        interpret=_INTERPRET,
    )(idx, anch, val)


def _rb_reduce(a: jax.Array, op) -> jax.Array:
    """[B, nq] -> [B/ROW_BLOCK, nq] row-block reduction (min/max)."""
    b, nq = a.shape
    return op(a.reshape(b // ROW_BLOCK, ROW_BLOCK, nq), axis=1)


def _gather_meta(idx: jax.Array, k: int, w: int):
    """Per-(row-block, query-tile) window anchors (tile units, clamped) and
    the all-tiles-fit validity scalar."""
    nq = k // Q
    first = idx[:, :: Q]  # [B, nq]
    last = idx[:, Q - 1 :: Q]
    anch = jnp.minimum(_rb_reduce(first, jnp.min) // Q, nq - w)  # [RB, nq]
    hi = _rb_reduce(last, jnp.max) // Q
    return anch.astype(jnp.int32), jnp.all(hi < anch + w)


def _scatter_meta(idx: jax.Array, k: int, w: int):
    """Anchors over QUERY tiles for each source tile: writers of source tile
    s are the contiguous range [r_lo, r_hi) (monotone idx)."""
    nq = k // Q
    bounds = jnp.arange(0, k + Q, Q, dtype=jnp.int32)  # [nq+1]
    # compare_all: one fused [K, nq+1] compare+reduce per row — the default
    # sort-merge method materializes an XLA sort of K+nq elements per row
    pos = jax.vmap(
        lambda row: jnp.searchsorted(
            row, bounds, side="left", method="compare_all"
        )
    )(idx)
    r_lo, r_hi = pos[:, :-1], pos[:, 1:]  # [B, nq]
    anch = jnp.minimum(_rb_reduce(r_lo, jnp.min) // Q, nq - w).astype(jnp.int32)
    # vacuous tiles (r_hi == r_lo) impose no constraint: the one-hot matches
    # nothing wherever the window lands
    fits = (r_hi == r_lo) | ((r_hi - 1) // Q < _pad_rb(anch) + w)
    return anch, jnp.all(fits)


def _pad_rb(a_rb: jax.Array) -> jax.Array:
    """[RB, nq] row-block values broadcast back to [B, nq] rows."""
    rb, nq = a_rb.shape
    return jnp.broadcast_to(a_rb[:, None, :], (rb, ROW_BLOCK, nq)).reshape(
        rb * ROW_BLOCK, nq
    )


def _compact_gather(idx: jax.Array, c: jax.Array, x_p: jax.Array, k: int):
    """Degenerate-regime gather: few DISTINCT ancestors (early-training
    ESS ≈ 1 — BASELINE.md row-5 note) break the window-fit check because one
    query tile straddles distant ancestors, but the distinct-ancestor count
    is tiny. Given the dense rank c_q = #{distinct idx values at positions
    ≤ q} − 1 (monotone, < W·Q by the branch guard), gather the ≤ W·Q
    distinct source lanes ONCE (an XLA gather K/(W·Q)× smaller than the full
    fallback's — the fallback's random-address [8, 40, 8192] move measured
    275 µs ≈ 78 GB/s), then run the SAME windowed kernel in compact index
    space: every c_q lies in [0, W·Q), so all anchors are 0 and the whole
    compact source is one window."""
    w = W_TILES
    batch = idx.shape[0]
    nq = k // Q
    wq = w * Q
    # first occurrence of rank r sits at position #{q : c_q ≤ r − 1}: the
    # same two-level rank kernel as the scatter transpose, over c
    e_c = _rank_of_positions(c, k)  # [B, K]
    pos = jnp.concatenate(
        [jnp.zeros((batch, 1), jnp.int32), e_c[:, : wq - 1]], axis=1
    )  # [B, wq]; rows past n_distinct hold K — clamp, never selected
    dist = jnp.take_along_axis(idx, jnp.minimum(pos, k - 1), axis=1)
    xc = jnp.take_along_axis(x_p, dist[:, None, :], axis=-1)  # [B, DP, wq]
    zero_anch = jnp.zeros((batch // ROW_BLOCK, nq), jnp.int32)
    return _win_pallas_call(_win_gather_kernel, k, w, c, zero_anch, xc, out_k=k)


def _win_gather(idx: jax.Array, x: jax.Array, k: int) -> jax.Array:
    """Windowed gather; on window overflow, a compact (distinct-ancestor)
    branch covers the degenerate-weights regime, with the XLA dynamic gather
    only when BOTH structures fail (> W·Q distinct ancestors AND a straddling
    query tile — e.g. a long zero-offspring run at healthy ESS)."""
    w = W_TILES
    d = x.shape[-2]
    dp = _round_up(d, D_TILE)
    x_p = jnp.pad(x, ((0, 0), (0, dp - d), (0, 0))) if dp != d else x
    anch, ok = _gather_meta(idx, k, w)

    def _overflow(i, a, v):
        del a
        # dense rank of the monotone indices; cheap [B, K] cumsum — the
        # expensive pieces (rank kernel + compact source gather) trace into
        # the compact branch only
        flags = (i[:, 1:] != i[:, :-1]).astype(jnp.int32)
        c = jnp.cumsum(
            jnp.concatenate([jnp.zeros((i.shape[0], 1), jnp.int32), flags], 1),
            axis=1,
        )
        ok_c = jnp.all(c[:, -1] < w * Q)  # n_distinct = c[:, -1] + 1 ≤ W·Q
        return jax.lax.cond(
            ok_c,
            lambda ii, cc, vv: _compact_gather(ii, cc, vv, k),
            lambda ii, cc, vv: jnp_resampling.gather_particles(vv, ii),
            i, c, v,
        )

    out = jax.lax.cond(
        ok,
        lambda i, a, v: _win_pallas_call(_win_gather_kernel, k, w, i, a, v),
        _overflow,
        idx, anch, x_p,
    )
    return out[:, :d, :] if dp != d else out


def _two_level_rank_int(vals_i: jax.Array, k: int) -> jax.Array:
    """e[r, s] = #{j : vals[r, j] <= s}, s = 0..K-1, for SORTED i32 vals in
    [0, K) — the integer-exact sibling of _two_level_count.

    Exactness without HIGHEST-precision dots: the MXU truncates f32 operands
    to bf16 (8 mantissa bits), which rounds integers >= 256, so the value
    selection splits vals into hi = vals >> 7 and lo = vals & 127 (both
    < 256 and bf16-exact, as are one-hot entries and f32 accumulation of
    <= 2^15 such products) and runs one DEFAULT-rate dot per half with the
    query's own hi/lo folded in, recombining (hi_d*128 + lo_d) exactly in
    f32 on the VPU — ~3x cheaper than one HIGHEST (6-pass) selection dot.
    """
    r = vals_i.shape[0]
    s_tiles = k // Q
    v3 = vals_i.reshape(r, s_tiles, Q)
    bnd = v3[:, :, Q - 1 :]  # [R, S, 1] per-tile maxima (ints)
    srow = jax.lax.broadcasted_iota(jnp.int32, (1, s_tiles, 1), 1)
    ones_q = jnp.ones((Q, 1), jnp.float32)
    hi_f = jax.lax.shift_right_logical(v3, 7).astype(jnp.float32)
    lo_f = jnp.bitwise_and(v3, Q - 1).astype(jnp.float32)
    ones_row = jnp.ones((r, 1, Q), jnp.float32)
    hi_aug = jnp.concatenate([hi_f, ones_row], axis=1)  # [R, S+1, Q]
    lo_aug = jnp.concatenate([lo_f, ones_row], axis=1)

    c = min(k, max(Q, (_FINE_CHUNK_BYTES // 4) // (r * Q) // Q * Q))
    chunks = []
    for t in range(0, k, c):
        s_i = jax.lax.broadcasted_iota(jnp.int32, (r, c), 1) + t  # [R, C]
        coarse = jnp.sum(
            (s_i[:, None, :] >= bnd).astype(jnp.float32), axis=1
        )  # int compare: bnd <= s + 0.5  <=>  bnd <= s
        coarse_i = jnp.minimum(coarse.astype(jnp.int32), s_tiles - 1)
        onehot_s = (coarse_i[:, None, :] == srow).astype(jnp.float32)
        q_hi = jax.lax.shift_right_logical(s_i, 7).astype(jnp.float32)
        # +0.5: vals_j <= s  <=>  vals_j < s + 0.5 (strictness-safe compare)
        q_lo = jnp.bitwise_and(s_i, Q - 1).astype(jnp.float32) + 0.5
        oh_hi = jnp.concatenate([onehot_s, -q_hi[:, None, :]], axis=1)
        oh_lo = jnp.concatenate([onehot_s, -q_lo[:, None, :]], axis=1)
        dn = (((1,), (1,)), ((0,), (0,)))
        d_hi = jax.lax.dot_general(
            oh_hi, hi_aug, dimension_numbers=dn,
            preferred_element_type=jnp.float32,
        )  # [R, C, Q'] = sel_hi - q_hi
        d_lo = jax.lax.dot_general(
            oh_lo, lo_aug, dimension_numbers=dn,
            preferred_element_type=jnp.float32,
        )  # sel_lo - q_lo
        le = (d_hi * float(Q) + d_lo <= 0.0).astype(jnp.float32)
        fine = jax.lax.dot_general(
            le, ones_q, dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )[..., 0]
        chunks.append(Q * coarse_i + fine.astype(jnp.int32))
    return chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks, axis=-1)


def _rank_kernel(k: int, idx_ref, e_ref):
    e_ref[:] = _two_level_rank_int(idx_ref[:], k)


def _rank_of_positions(idx: jax.Array, k: int) -> jax.Array:
    """e[b, s] = #{q : idx[b, q] <= s} for SORTED integer idx — the same
    two-level rank as the forward indices with roles swapped (rank of s+0.5
    among the idx values; both sides f32-exact for K < 2^24, so the compares
    carry no float ambiguity). Runs as a Pallas kernel: the identical jnp
    graph left to XLA outside Mosaic measured ~35 ms/step at K=8192 (its
    chunked one-hot contractions don't fuse), vs µs-scale in-kernel."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    batch = idx.shape[0]
    return pl.pallas_call(
        functools.partial(_rank_kernel, k),
        grid=(batch // ROW_BLOCK,),
        in_specs=[
            pl.BlockSpec((ROW_BLOCK, k), lambda b: (b, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (ROW_BLOCK, k), lambda b: (b, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((batch, k), jnp.int32),
        compiler_params=_vmem_params(),
        interpret=_INTERPRET,
    )(idx)


def _cumsum_kernel(k: int, g_ref, out_ref):
    r, d = g_ref.shape[0], g_ref.shape[1]
    out_ref[:] = _tri_cumsum(
        g_ref[:].reshape(r * d, k), exact=True
    ).reshape(r, d, k)


def _lane_cumsum(g: jax.Array, k: int) -> jax.Array:
    """Inclusive lane-axis cumsum of [B, D, K] as a Pallas tri-matmul kernel:
    XLA lowers jnp.cumsum to a reduce-window that measured 0.46 ms/call at
    [8, 40, 8192] (~46 ms/step over the T-scan); the in-kernel triangular
    contraction at HIGHEST precision (exact f32 products — the default MXU
    pass would round the summand operands to bf16) is an order of magnitude
    cheaper. Falls back to jnp.cumsum off-TPU or on ineligible shapes."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    batch, d = g.shape[0], g.shape[1]
    if not (
        (_on_tpu() or _INTERPRET)
        and k % Q == 0
        and batch % ROW_BLOCK == 0
        and d % 8 == 0
    ):
        return jnp.cumsum(g, axis=-1)
    return pl.pallas_call(
        functools.partial(_cumsum_kernel, k),
        grid=(batch // ROW_BLOCK,),
        in_specs=[
            pl.BlockSpec(
                (ROW_BLOCK, d, k), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(
            (ROW_BLOCK, d, k), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(g.shape, jnp.float32),
        compiler_params=_vmem_params(),
        interpret=_INTERPRET,
    )(g)


def _sorted_segsum(idx: jax.Array, g: jax.Array, k: int) -> jax.Array:
    """Scatter-transpose of a MONOTONE-index gather without any scatter:
    dx[b, :, s] = Σ_{q: idx[b,q]==s} g[b, :, q].

    Children of each ancestor are contiguous in query space (idx sorted), so
    the segment sum telescopes to a difference of inclusive prefix sums at
    segment boundaries:

        dx[s] = T[e_s − 1] − T[e_{s−1} − 1],   e_s = #{q : idx_q ≤ s}

    e is counted by the same two-level rank that produces the forward
    indices, with roles swapped — rank of s+0.5 among the sorted idx values
    (both f32-exact for K < 2^24, so the compares have no float ambiguity).
    Everything lowers to a lane cumsum, one dynamic gather, and a lane
    shift. Why it exists: XLA's scatter-add for the cm [B, D, K] cotangent
    measured **74 ms/step** at K=8192 D=40 — ~35% of the whole train step —
    while this form costs ~7 ms (round-3 profile). Accuracy note: each
    segment sum is a *difference of prefixes*, so entries carry absolute
    error ~eps·|T| (≈1e-5 at unit-variance K=16k) instead of direct
    summation's — irrelevant for gradients, and the exact windowed kernel
    still takes every step whose windows fit."""
    batch, _ = idx.shape
    e = _rank_of_positions(idx, k)  # [B, K] counts in [0, K]
    t = _lane_cumsum(g, k)  # [B, D, K] inclusive prefix over queries
    # [B, 1, K] index broadcast, NOT a materialized [B, D, K] index tensor:
    # the materialized form lowered to a 6x-slower gather (33.6 vs 5.4 ms
    # at this shape — per-(b,d)-row lane addressing instead of one shared
    # index vector per batch row)
    big_g = jnp.take_along_axis(t, jnp.clip(e - 1, 0, k - 1)[:, None, :], axis=-1)
    big_g = jnp.where((e > 0)[:, None, :], big_g, 0.0)
    prev = jnp.concatenate(
        [jnp.zeros_like(big_g[..., :1]), big_g[..., :-1]], axis=-1
    )
    return big_g - prev


def _win_scatter(idx: jax.Array, g: jax.Array, k: int) -> jax.Array:
    w = W_TILES
    d = g.shape[-2]
    dp = _round_up(d, D_TILE)
    g_p = jnp.pad(g, ((0, 0), (0, dp - d), (0, 0))) if dp != d else g
    anch, ok = _scatter_meta(idx, k, w)

    dx = jax.lax.cond(
        ok,
        lambda i, a, v: _win_pallas_call(_win_scatter_kernel, k, w, i, a, v),
        lambda i, a, v: _sorted_segsum(i, v, k),
        idx, anch, g_p,
    )
    return dx[:, :d, :] if dp != d else dx


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
        # above the fused cap: kernel for the indices (O(K) two-level —
        # replaces the profiled 0.57 ms/step histogram scatter at K=8192),
        # windowed sorted-index gather for the particles (XLA's dynamic
        # gather only on overflow / ineligible shapes)
        idx = (
            _indices_large(u, logw)
            if _idx_usable(batch, k)
            else _indices_jnp(u, logw)
        )
        if _win_usable(batch, k):
            return idx, _win_gather(idx, x, k)
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
        compiler_params=_vmem_params(),
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
        if _win_usable(batch, k):
            dx = _win_scatter(idx, g_x, k)
        elif k % Q == 0:
            # monotone idx: segment-sum via prefix differences — XLA's
            # scatter-add here measured 74 ms/step at K=8192 (see
            # _sorted_segsum)
            dx = _sorted_segsum(idx, g_x, k)
        else:
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
            compiler_params=_vmem_params(),
            interpret=_INTERPRET,
        )(idx, g_p)
        if dp != d:
            dx = dx[:, :d, :]
    return jnp.zeros_like(u), jnp.zeros_like(logw), dx


resample_and_gather.defvjp(_rg_fwd, _rg_bwd)

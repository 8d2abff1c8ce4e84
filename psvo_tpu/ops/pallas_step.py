"""Fused per-timestep SMC megakernel: resample → q1/f/g MLPs → draw → α → ℓ.

Round-3 profile of the primary config (FHN FIVO K=1024 B=32): the train step
spends ~204 µs per scan iteration — 68.6 µs in the resample kernel and the
rest across ~30-40 XLA fusions of 2-8 µs each. The step is LAUNCH-BOUND:
kernel count ≈ time. This module fuses the entire filtering step body
(SURVEY.md §3.2) into ONE Pallas kernel per direction.

forward (per batch row-block, everything in VMEM):
  1. ESS of the incoming log-weights (MXU ones-contractions);
  2. two-level O(K) inverse-CDF ancestor indices
     (pallas_resample._two_level_indices);
  3. hardware lane gather of the ancestors (`tpu.dynamic_gather` per
     (query-tile, source-tile) pair — see _lane_gather; the earlier one-hot
     MXU formulation spent ~60% of the forward kernel CONSTRUCTING the
     [R, Q, K] one-hot operands on the VPU, round-3 profile);
  4. q1 and f MLP trunks on the resampled particles, g trunk on the
     proposed particles — channel-major [R, C, K] activations, each dense
     layer ONE batched MXU contraction with NO bias op: biases ride a
     ones-channel (see "ones-channel folding" below);
  5. proposal fusion mean_q = cq·m1 + aq (the use_2q precision-product
     collapses to per-(B,Dx) affine coefficients computed outside — q2's
     scale has no K dependence), reparameterized draw x_new = mean_q + sq·ε;
  6. α = −½Σ_d z_f² − ½Σ_d z_g² + ab where ab carries every K-independent
     term (−log q's ε² part, log-scale sums, 2π constants) precomputed
     outside in bulk;
  7. ℓ = logsumexpₖ α − log K, softmax weights, filtered mean.

backward: ONE kernel that recomputes the trunks from the saved resampled /
proposed particles (recompute-style VJP; exactly THREE trunk passes — f and
g keep their activations through the α recompute, q1 runs after the fusion
grads so m1 never needs a fourth pass) and emits gradients for the
particles (one-hot transpose scatter through the ancestor indices — FIVO's
reparameterized path; d/d logw and d/d u are zero, stop-gradient through
the discrete choice, SURVEY.md §3.2; a sorted-index segment-sum scatter
built from lane cumsum + lane gather measured 116 µs vs the one-hot's 88 µs,
round-3 bisect — the scatter's one-hot rides the MXU where the forward
gather's could not), the per-step fusion coefficients, and the MLP weights
(accumulated across the batch grid via resident constant-index-map output
blocks).

Ones-channel bias folding: row OC = PD−1 of every particle tensor is pinned
to the constant 1 (the carry starts with it, the gather preserves it, and
x_new recovers it because aq's OC row is 1 while cq/sq's are 0). Each
hidden width H is augmented to HA = H+8: unit H is a ones-unit (its
incoming weight row selects the ones-channel, so relu(1) = 1 propagates),
and every bias vector becomes column H (or column OC for layer 1) of the
augmented weight — so a trunk is a PURE chain of batched matmuls and bias
GRADIENTS fall out of the ordinary weight-grad contractions. All
augmentation happens differentiably OUTSIDE the custom-VJP boundary
(prepare()), so grads slice back to the true parameters automatically, and
cotangents landing on the constant entries are dropped by construction.
This is why the kernel requires activation="relu" (relu(1)=1 keeps the
ones-unit exact; tanh has no finite preimage of 1) and max(Dx, Dy) ≤ 7
(a free row must exist for the ones-channel).

Operand-shape rules (bisected from Mosaic lowering-emitter crashes,
`Check failed: limits[i] <= dim(i)`, round 3):
  1. no size-1 dims in pallas_call OPERANDS — small per-step vectors pack
     as lane-channels of one [B, PD, 128] tensor (`sm`: lane 0 = aq,
     1 = cq, 2 = sq, 3 = y); statistics ride one packed [B, PD, 128]
     output (`stats`: lane 0 = filtered mean, [0,1] = ℓ, [0,2] = ESS);
  2. no 2-D [N>8, 1] or [1, N>8, 1] VALUES (the crash limit scales as N/8
     sublane tiles) — scale-inverse reads are [1, PD≤8, 1] `_col3` views,
     their grads [PD, 8] lane-8 MXU contractions stored into disjoint
     lane-slices of the lane-padded ref;
  3. dense contractions must run over the lhs LANE axis ([M,K]×[K,N]
     MXU-natural): contracting the lhs sublane axis makes Mosaic transpose
     internally and crash for free dims > one sublane tile — hence the
     weights arrive TRANSPOSED for the forward direction and untransposed
     for the backward _dense_t, with all weight grads reported on the
     untransposed inputs (the transposes get zeros; both derive from one
     param tree outside, so autodiff sums the two paths correctly);
  4. lane-pad with ZEROS, never broadcast (a broadcast's VJP sums the
     duplicated lanes: 128× gradients).

Gradient semantics (objective-checked in tests/test_pallas_step.py):
  - ess / fmean outputs are metrics-only: their cotangents are ignored
    (the training loss never consumes them; eval runs without grad);
  - ε is raw RNG output (never a function of params): zero cotangent;
  - α's cotangent is honored (the SVO/PSVO caches consume logws).

Eligibility (`usable`): systematic/multinomial resampling with
ess_threshold ≥ 1 (unconditional), stop-gradient FIVO, Gaussian diag
emission with constant scales on f and g, q1/f/g relu trunks with one
uniform hidden width (mult. of 8), max(Dx+Di,Dy) ≤ 7, K ≤ 2048, B % 8 == 0,
no bootstrap/known-dynamics, no mesh. Controls (Di > 0) ride the carry's
pad rows — constant over K, so the ancestor gather preserves them, the
q1/f layer-1 augmented weights consume them as ordinary input columns
(matching ssm._with_control_cm's [x; u] order), and the α math is immune
because sfi/sgi/ε pad rows are zero; each step's aq channel regenerates
row block dx:dx+di with u_{t+1} for the NEXT step's trunks (pack_sm). Everything else falls
back to the unfused scan body (psvo_tpu.smc).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from psvo_tpu.ops.pallas_resample import (
    Q,
    ROW_BLOCK,
    _on_tpu,
    _round_up,
    _two_level_indices,
    _vmem_params,
)

_INTERPRET = False  # flipped by tests to run on CPU

MAX_K = 2048  # VMEM ceiling for the whole-step kernel

# Mosaic's default scoped-VMEM limit is 16 MiB — the recompute backward's
# in-flight temporaries (three [R, HA, K] hidden stacks plus the streamed
# residual blocks and their double buffers) need ~19 MiB at K=1024 with the
# cotangent streams attached (PSVO). _vmem_params (pallas_resample) raises
# the grant to half of v5e's 128 MiB physical VMEM.
_LANES = 128  # packed small-tensor lane width

# net order in the stacked weight tensors
_Q1, _F, _G = 0, 1, 2

SM_AQ, SM_CQ, SM_SQ, SM_Y, SM_AB = 0, 1, 2, 3, 4  # lane channels of sm
SM_SFI, SM_SGI = 0, 8  # sconst lanes (8 apart: [PD, 8] grad stores)


def usable(ssm, cfg, batch: int) -> bool:
    """Static eligibility of the megakernel for this (ssm, smc-config)."""
    from psvo_tpu.parallel.context import get_mesh

    if not (ssm.use_pallas_resample and (_on_tpu() or _INTERPRET)):
        return False
    if get_mesh() is not None:
        return False
    if cfg.resampling not in ("systematic", "multinomial"):
        return False
    if cfg.ess_threshold < 1.0 or not cfg.use_stop_gradient:
        return False
    if cfg.use_bootstrap or ssm.transition_known:
        return False
    if ssm.emission in ("poisson", "dirac"):
        return False
    if ssm.f_tril or ssm.g_tril:
        return False
    k = cfg.n_particles
    if k % Q or k > MAX_K or batch % ROW_BLOCK:
        return False
    if max(ssm.dx + ssm.di, ssm.dy) > 7:
        # the ones-channel needs a free row in the 8-sublane-padded state
        # after the Di control rows (and pd > 8 shapes hit the Mosaic
        # [*, PD>8, 1] crash class)
        return False
    nets = [ssm.nets[n] for n in ("q1", "f", "g")]
    hidden = nets[0].hidden
    if len(hidden) < 1 or any(h != hidden[0] for h in hidden):
        return False
    if hidden[0] % 8:
        return False
    for nc in nets:
        if nc.hidden != hidden or nc.cov_type != "const":
            return False
        if nc.activation != "relu":
            # the ones-unit requires act(1) == 1 exactly
            return False
    return True


def _row_block(batch: int, k: int) -> int:
    """Batch rows per kernel invocation (grid axis 0 block).

    16 measured fastest on the primary config (v5e, K=1024 B=32: 15.9 →
    14.8 ms/step — the whole-scan backward runs 396 → 198 invocations and
    its per-invocation fixed cost is real), but the backward's scoped VMEM
    scales with rb·K: rb=32 at K=1024 needs 77 MiB (> the 64 MiB grant, and
    granting 100 MiB measured SLOWER than rb=16 — VMEM pressure kills the
    stream double-buffering), so rb=16 is gated to K ≤ 1024 where it fits
    with the same headroom as the proven rb=8 K=2048 ceiling. The SAVE_ACTS
    A/B adds 6 double-buffered [rb, HA, K] streams to the forward (66.8 MiB
    at rb=16 — over the grant, measured 2026-08-20), so it drops to rb=8."""
    if SAVE_ACTS:
        return ROW_BLOCK
    return 16 if (batch % 16 == 0 and k <= 1024) else ROW_BLOCK


def _col3(v, c: int = 0):
    """[N, 128] value -> [1, N, 1] holding lane c (N ≤ 8 only — module
    docstring rule 2). Leading-axis reshape + 3-D lane slice; `[None]`
    newaxis indexing lowers to a gather Mosaic rejects."""
    v3 = v.reshape(1, *v.shape)
    return v3[:, :, c : c + 1]


def _bcast_w(w, r):
    return jnp.broadcast_to(w[None], (r, *w.shape))


def _dense(h, wt):
    """[R, Cin, K] × wT [Cout, Cin] -> [R, Cout, K], lhs-lane contraction
    (module docstring rule 3). No bias: biases ride the ones-channel."""
    r = h.shape[0]
    return jax.lax.dot_general(
        _bcast_w(wt, r), h,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )


def _dense_t(d, w):
    """Transpose dense: d [R, Cout, K] × w [Cin, Cout] -> [R, Cin, K]."""
    r = d.shape[0]
    return jax.lax.dot_general(
        _bcast_w(w, r), d,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )


def _dw(h_in, d_out):
    """Weight gradient Σ_{r,k} h_in[r,ci,k]·d_out[r,co,k] -> [Cin, Cout]."""
    per_r = jax.lax.dot_general(
        h_in, d_out,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [R, Cin, Cout]
    return jnp.sum(per_r, axis=0)


def _lane_sum(x):
    """Σ over the lane axis via an MXU ones-contraction: [..., K] -> [..., 1]."""
    ones = jnp.ones((x.shape[-1], 1), jnp.float32)
    return jax.lax.dot_general(
        x, ones,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _bias_grad8(d):
    """Σ_{r,k} d[r, c, k] as a lane-8 [C, 8] tensor (all 8 lanes duplicate
    the sum) — the cheapest Mosaic-safe reduction shape; stores into lanes
    c:c+8 of a lane-padded ref whose zero-pad VJP keeps lane c only."""
    ones8 = jnp.ones((d.shape[-1], 8), jnp.float32)
    per_r = jax.lax.dot_general(
        d, ones8,
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [R, C, 8]
    return jnp.sum(per_r, axis=0)  # [C, 8]


def _trunk(x, wt1, wtms, wt3):
    """Pure-matmul relu MLP on augmented weights: returns (mean, hs)."""
    hs = [jax.nn.relu(_dense(x, wt1))]
    for wtm in wtms:
        hs.append(jax.nn.relu(_dense(hs[-1], wtm)))
    return _dense(hs[-1], wt3), hs


def _trunk_bwd(x_in, hs, d_mean, w1, wms, w3):
    """Backprop one augmented trunk; bias grads are rows/cols of the
    augmented weight grads (ones-channel folding).

    The weight grads ride ONE "corners" _dw plus one _dw per mid layer:
    the first/last layers' (activation, pre-act-grad) pairs share a single
    [HA+PD, K] × [PD+HA, K] contraction whose corner blocks are exactly
    (dw3, dw1) — their small PD widths make the off-corner waste cheap —
    while each [HA, K] × [HA, K] mid-layer grad is already a full-rank dot
    with no waste. History: the 9 separate per-layer dots measured 23.7 µs
    of the 88.5 µs backward megakernel (per-call overhead), and the round-3
    all-blocks-in-one form fixed that but carried ~3.6× FLOP waste
    ((2HA+PD)² vs the useful diagonal) that dominated the whole-scan
    backward once the other reductions were fused; this pairing keeps the
    call count at n_mid+1 with only ((HA+PD)²−HA²−PD²)/… ≈ 2× less MXU work
    than the all-blocks form at HA=72 (10.4 → 8.6 ms on the primary
    config's whole backward, measured v5e)."""
    n_mid = len(wms)
    d_h = _dense_t(d_mean, w3)
    d_pres = []
    for i in range(n_mid - 1, -1, -1):
        d_pre = d_h * (hs[i + 1] > 0).astype(d_h.dtype)
        d_pres.append(d_pre)
        d_h = _dense_t(d_pre, wms[i])
    d_pre1 = d_h * (hs[0] > 0).astype(d_h.dtype)
    d_x = _dense_t(d_pre1, w1)

    ha, pd = hs[-1].shape[-2], x_in.shape[-2]
    corners = _dw(
        jnp.concatenate([hs[-1], x_in], axis=-2),
        jnp.concatenate([d_mean, d_pre1], axis=-2),
    )  # [HA+PD, PD+HA]: top-left = dw3, bottom-right = dw1
    dw3 = corners[:ha, :pd]
    dw1 = corners[ha:, pd:]
    # d_pres[j] is layer i = n_mid-1-j's pre-act grad, paired with hs[i]
    dwms = [
        _dw(hs[n_mid - 1 - j], d_pres[j]) for j in range(n_mid - 1, -1, -1)
    ]
    return d_x, dw1, dwms, dw3


def _lane_gather(x, idx):
    """out[m, q] = x[m, idx[m, q]] for [M, K] VMEM blocks (K % 128 == 0).

    The TPU's in-vreg lane gather (`tpu.dynamic_gather`, exposed as 2-D
    take_along_axis) only indexes WITHIN one 128-lane vreg, so the cross-tile
    gather runs per (query-tile, source-tile) pair: an in-tile hardware
    gather by the low 7 index bits + a select on the tile id. At K=1024 that
    is 64 pairs of one vreg-gather + one [M, 128] select ≈ 1M element ops —
    vs the one-hot formulation's 16.8M VPU compare/convert ops per row-block
    to MATERIALIZE the [R, Q, K] one-hot operands (round-3 profile: that
    construction, not the MXU dots, was ~60% of the 88 µs forward kernel).
    """
    m, k = x.shape
    nt = k // Q
    coarse = jax.lax.shift_right_logical(idx, 7)
    fine = jnp.bitwise_and(idx, Q - 1)
    out = []
    for t in range(nt):
        c_t = coarse[:, t * Q : (t + 1) * Q]
        f_t = fine[:, t * Q : (t + 1) * Q]
        acc = jnp.zeros((m, Q), x.dtype)
        for s in range(nt):
            g = jnp.take_along_axis(
                x[:, s * Q : (s + 1) * Q], f_t, axis=1, mode="promise_in_bounds"
            )
            acc = jnp.where(c_t == s, g, acc)
        out.append(acc)
    return jnp.concatenate(out, axis=-1)


def _gather_particles(x, idx, k):
    """x [R, PD, K], idx [R, K] -> x[r, d, idx[r, q]]: the ancestor gather as
    a hardware lane gather with the row index broadcast over the PD sublanes
    (PD = 8 = one sublane tile, so the [R, PD, K] -> [R·PD, K] collapse is a
    free relayout)."""
    r, pd = x.shape[0], x.shape[1]
    i3 = jnp.broadcast_to(idx[:, None, :], (r, pd, k))
    return _lane_gather(x.reshape(r * pd, k), i3.reshape(r * pd, k)).reshape(
        r, pd, k
    )


def _onehot_scatter(g, idx, k):
    """dx[r, d, s] = Σ_q 1[idx_q == s]·g[r, d, q] (transpose of the ancestor
    gather), as per-query-tile full-K one-hot contractions accumulated in
    VMEM. Unlike the forward gather, the one-hot's [R, Q, K] construction is
    amortized over a real MXU contraction here (D output rows per tile), and
    a sorted-index segment-sum alternative (lane cumsum + lane gather +
    two-level count) measured 116 µs vs this form's 88 µs (round-3 bisect).
    Superseded by _factored_scatter (round-5 A/B: 13.69 vs 14.55 ms/step on
    the primary config); kept as the equivalence oracle for its test."""
    nq = k // Q
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, k), 2)
    acc = jnp.zeros((g.shape[0], g.shape[1], k), jnp.float32)
    for t in range(nq):
        idx_t = idx[:, t * Q : (t + 1) * Q]
        onehot = (idx_t[:, :, None] == col).astype(jnp.float32)  # [R, Q, K]
        acc = acc + jax.lax.dot_general(
            g[:, :, t * Q : (t + 1) * Q], onehot,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
    return acc


# round-5 A/B (VERDICT r4 missing #4): the factored scatter vs the full-K
# one-hot above. True = the factored form serves the megakernel backward.
FACTORED_SCATTER = True


def _factored_scatter(g, idx, k):
    """The ancestor scatter with the one-hot FACTORED as coarse × fine.

    idx = 128·coarse + fine splits 1[idx_q == s] into
    1[coarse_q == s_tile] · 1[fine_q == s_lane]. Per query tile the kernel
    builds only the [R, Q, Q] FINE one-hot (vs the full [R, Q, K] one-hot:
    8× fewer compare/convert VPU ops at K=1024 — the round-3 profile charged
    exactly that construction, not the dots, with the scatter's cost) and
    folds the coarse factor into the OTHER operand: the [R, PD, Q] grads are
    masked per source tile and stacked on the sublane axis, so one
    [R, S·PD, Q] × [R, Q, Q] contraction per query tile does the same MXU
    work as before (same MAC count, same call count) and rows s·PD:(s+1)·PD
    of the result are tile s's scatter contribution. Exact for ANY idx (no
    monotonicity assumption). Measured on the primary config (v5e,
    2026-08-20): 13.69 vs 14.55 ms/step end-to-end (−0.86 ms — most of the
    1.43 ms the round-3 profile charged to the backward scatter)."""
    nq = k // Q
    r, pd = g.shape[0], g.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, Q), 2)
    srow = jax.lax.broadcasted_iota(jnp.int32, (1, nq, 1), 1)
    accs = [jnp.zeros((r, pd, Q), jnp.float32) for _ in range(nq)]
    for t in range(nq):
        idx_t = idx[:, t * Q : (t + 1) * Q]
        fine = jnp.bitwise_and(idx_t, Q - 1)
        coarse = jax.lax.shift_right_logical(idx_t, 7)
        f_oh = (fine[:, :, None] == col).astype(jnp.float32)  # [R, Q, Q]
        m_oh = (coarse[:, None, :] == srow).astype(jnp.float32)  # [R, S, Q]
        g_t = g[:, :, t * Q : (t + 1) * Q]
        g_masked = jnp.concatenate(
            [g_t * m_oh[:, s : s + 1, :] for s in range(nq)], axis=1
        )  # [R, S·PD, Q]
        res = jax.lax.dot_general(
            g_masked, f_oh,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [R, S·PD, Q]
        for s in range(nq):
            accs[s] = accs[s] + jax.lax.slice_in_dim(
                res, s * pd, (s + 1) * pd, axis=1
            )
    return jnp.concatenate(accs, axis=-1)


def _pad_sub(x, pd):
    """Zero-pad the sublane (channel) axis of [R, D, K] to PD in VMEM.

    The ε stream arrives UNPADDED [·, Dx, K]: padding in-kernel replaced an
    XLA-level pad that measured 158 µs/step plus ~20 MB/step of pad-row HBM
    traffic across the two kernels (round-3 profile, fusion `pad.14`). The
    pad rows are exact zeros, so the fused z_f² − ε² + z_g² sublane sum and
    the d_xnew·ε fusion-grad reduction stay exact.
    """
    d = x.shape[-2]
    if d == pd:
        return x
    zeros = jnp.zeros((*x.shape[:-2], pd - d, x.shape[-1]), x.dtype)
    return jnp.concatenate([x, zeros], axis=-2)


# ---------------------------------------------------------------------------
# In-kernel RNG (cfg.smc.kernel_rng): the hardware PRNG replaces the bulk
# noise streams. The jnp path materializes eps [T−1, B, Dx, K] and u
# [T−1, B, K] in HBM (written once by the RNG fusion, ε read by BOTH scan
# kernels, u by the forward) — ~0.1 GB/step of pure noise traffic at the
# primary config plus the bits→normal transform (0.28 ms/step) and, on the
# rbg presets, the generator's fixed dispatch overhead. Here each grid step
# seeds the per-core PRNG with (seed, b, t) and draws its own noise; the
# backward re-seeds identically and REGENERATES the same ε (draw order: the
# two ε bit-tensors first, then u — the backward stops after two).
#
# Streams differ from the threefry/rbg jnp path by construction, so
# bit-equivalence testing is impossible; instead `generate_stream_noise`
# materializes the EXACT kernel streams with the same helper + grid layout,
# and the equivalence check feeds them to the unfused jnp path via
# forward_filter's noise hook (same logZ + same grads — benchmark.py
# kernel_rng_equiv_check, TPU only: interpret mode has no prng_seed
# lowering on CPU, verified 2026-08-20).
#
# Seeds ride a [1, 2] float32 SMEM operand (values < 2²⁴ so the f32 carry
# is exact): custom_vjp integer primals would demand float0 cotangents.
# ---------------------------------------------------------------------------


def _rng_seed(seed_ref, b, t):
    """Seed the per-core PRNG for grid cell (b, t). Mosaic accepts at most
    TWO seed values (v5e 2026-08-20), so (b, t) folds into the second with
    a large odd stride — distinct per cell for any t < 1000003, wrapping
    int32 overflow is deterministic."""
    from jax.experimental.pallas import tpu as pltpu

    pltpu.prng_seed(
        seed_ref[0, 0].astype(jnp.int32),
        seed_ref[0, 1].astype(jnp.int32)
        + b * jnp.int32(1000003)
        + t,
    )


def _rng_unit_bits(shape):
    """Top-24-bit uniforms from the hardware PRNG: returns f32 in [0, 1).

    Bit plumbing is Mosaic-constrained: uint32→f32 casts don't lower
    ("Unsupported cast", v5e 2026-08-20), so the bits BITCAST to int32, the
    logical shift clears the sign bit (top ∈ [0, 2²⁴)), and the int32→f32
    cast is exact."""
    from jax.experimental.pallas import tpu as pltpu

    bits = pltpu.prng_random_bits(shape)
    bits_i = jax.lax.bitcast_convert_type(bits, jnp.int32)
    top = jax.lax.shift_right_logical(bits_i, jnp.int32(8))
    return top.astype(jnp.float32) * (2.0**-24)


def _rng_eps(shape, dx):
    """Standard normals [R, PD, K] with sublane rows ≥ dx exactly ZERO (the
    α math and the ones-channel/control rows rely on exact-zero ε pads).

    Box-Muller PAIR form on the dx live rows only: one (log, sqrt, cos,
    sin) quadruple yields TWO normals, and the dead PD−dx rows are zeros by
    construction instead of generated-then-masked. The first measured
    variant (3 transcendentals per element over all PD rows) cost the
    primary config +1.6 ms/step (14.74 → 16.38, v5e 2026-08-20) — the
    kernel is op-count-bound and VPU transcendentals are its priciest op
    class; this form runs 6× fewer of them. u1 ∈ (0, 1] (1 − top24·2⁻²⁴ —
    safe under log), u2 ∈ [0, 1). Distributionally exact standard normals,
    just a different stream than threefry — see module comment above.
    """
    r, pd, k = shape
    half = (r, dx, k // 2)
    u1 = 1.0 - _rng_unit_bits(half)
    u2 = _rng_unit_bits(half)
    rad = jnp.sqrt(-2.0 * jnp.log(u1))
    ang = (2.0 * math.pi) * u2
    z = jnp.concatenate([rad * jnp.cos(ang), rad * jnp.sin(ang)], axis=-1)
    return jnp.concatenate(
        [z, jnp.zeros((r, pd - dx, k), jnp.float32)], axis=-2
    )


def _rng_sys_u(rows, k):
    """Systematic resampling positions (i + u0)/K, one u0 ~ U[0, 1) per
    batch row (resampling.quantile_positions_from_raw semantics)."""
    u0 = _rng_unit_bits((rows, _LANES))[:, 0:1]  # lane 0 of a cheap full tile
    # int iota + cast: a float tpu.iota doesn't lower (v5e 2026-08-20)
    i = jax.lax.broadcasted_iota(jnp.int32, (rows, k), 1).astype(jnp.float32)
    return (i + u0) * (1.0 / k)


def generate_stream_noise(seeds, t_len, batch, pd, k, dx):
    """TPU-only diagnostic: materialize the exact (eps, u) streams the
    kernel_rng megakernels generate internally — same helpers, same grid
    blocking, same draw order — so the unfused jnp path can replay them
    (noise hook) and the fused kernel_rng path can be equivalence-checked
    on-device (benchmark.kernel_rng_equiv_check). Returns
    (eps [T, B, PD, K] — slice [:, :, :dx] for the jnp path, u [T, B, K]).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rb = _row_block(batch, k)

    def kern(seed_ref, eps_ref, u_ref):
        _rng_seed(seed_ref, pl.program_id(0), pl.program_id(1))
        eps_ref[:] = _rng_eps((rb, pd, k), dx)[None]
        u_ref[:] = _rng_sys_u(rb, k)[None]

    return pl.pallas_call(
        kern,
        grid=(batch // rb, t_len),
        in_specs=[
            pl.BlockSpec((1, 2), lambda b, t: (0, 0), memory_space=pltpu.SMEM)
        ],
        out_specs=[
            _res_spec((t_len, batch, pd, k), rb),
            _res_spec((t_len, batch, k), rb),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_len, batch, pd, k), jnp.float32),
            jax.ShapeDtypeStruct((t_len, batch, k), jnp.float32),
        ],
        compiler_params=_vmem_params(),
        interpret=_INTERPRET,
    )(seeds)


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _propose_weight_core(net, x_res, eps, sm, sconst, want_hs: bool = False):
    """Trunks + reparameterized draw + α as pure array math: everything in
    the filtering step body AFTER the resample. Shared by the per-step /
    whole-scan megakernels and the K-tiled large-PD trunk kernel
    (ops/pallas_trunk.py). Returns (x_new, alpha).

    The α bias is built IN-KERNEL from ε (its only K-dependent term is
    ½Σ_d ε², and ε is already a kernel operand) plus the K-independent
    scalar riding sm lane SM_AB row 0 — the round-3 profile charged the
    outside bulk ε² reduce + the [T−1,B,K] ab stream (fwd operand + bwd
    d_ab output + the broadcast-VJP Σ_k reduce) ~0.5 ms/step of XLA glue.
    The ε² term FOLDS INTO the z² reduction (α = −½Σ_d(z_f²−ε²+z_g²)+absc),
    so the kernel runs ONE sublane sum where it previously ran two — a
    separate in-kernel ½Σε² sum measured +2.4 ms/step on the primary
    config (sublane reductions are the kernel's priciest VPU op class).
    """
    eps = _pad_sub(eps, x_res.shape[-2])
    aq = sm[:, :, SM_AQ : SM_AQ + 1]
    cq = sm[:, :, SM_CQ : SM_CQ + 1]
    sq = sm[:, :, SM_SQ : SM_SQ + 1]
    y = sm[:, :, SM_Y : SM_Y + 1]
    # K-independent α-bias scalar: row 0 of lane SM_AB (other rows zero)
    absc = jnp.sum(sm[:, :, SM_AB : SM_AB + 1], axis=1)  # [R, 1]
    sfi = _col3(sconst, SM_SFI)  # [1, PD, 1]
    sgi = _col3(sconst, SM_SGI)

    # q1 / f trunks on the resampled particles
    m1, hs_q = _trunk(x_res, *net(_Q1))
    m_f, hs_f = _trunk(x_res, *net(_F))

    # fused proposal + reparameterized draw; row OC: aq=1, cq=sq=0 keeps
    # the ones-channel alive in x_new
    x_new = cq * m1 + aq + sq * eps

    # emission trunk + α (ε's pad rows are zero, so the fused full-PD
    # sublane sum of z_f² − ε² + z_g² is exact)
    m_g, hs_g = _trunk(x_new, *net(_G))
    z_f = (x_new - m_f) * sfi
    z_g = (y - m_g) * sgi
    alpha = -0.5 * jnp.sum(z_f * z_f - eps * eps + z_g * z_g, axis=-2) + absc
    # finiteness floor (distributions._MIN_LOGP rationale): a diverged mean
    # must yield an astronomically-negative finite α, not -inf
    alpha = jnp.maximum(alpha, -3e30)
    if want_hs:  # SAVE_ACTS A/B: the backward streams these instead of
        return x_new, alpha, (hs_q, hs_f, hs_g)  # recomputing the trunks
    return x_new, alpha


def _fwd_core(k, net, logw, u, x, eps, sm, sconst, want_hs: bool = False):
    """The whole filtering step as pure array math (shared by the per-step
    and whole-scan kernels). Returns (x_new, alpha, idx, x_res, fm, ell, ess)
    — with want_hs (SAVE_ACTS) an extra trailing (hs_q, hs_f, hs_g) tuple.
    """
    # ESS of the incoming weights: (Σw)²/Σw² with max-shifted w
    m = jnp.max(logw, axis=-1, keepdims=True)
    w_in = jnp.exp(logw - m)
    s1 = _lane_sum(w_in)
    s2 = _lane_sum(w_in * w_in)
    ess = s1 * s1 / jnp.maximum(s2, 1e-30)  # [R, 1]

    # resample: two-level O(K) indices + hardware lane gather (preserves the
    # pinned ones-channel row)
    idx = _two_level_indices(logw, u, k)
    x_res = _gather_particles(x, idx, k)

    out = _propose_weight_core(net, x_res, eps, sm, sconst, want_hs=want_hs)
    x_new, alpha = out[0], out[1]

    # ℓ = lse(α) − log K; filtered mean under the new weights
    amax = jnp.max(alpha, axis=-1, keepdims=True)
    w_new = jnp.exp(alpha - amax)
    sw = _lane_sum(w_new)
    ell = jnp.log(sw) + amax - math.log(k)  # [R, 1]
    fm = jax.lax.dot_general(
        x_new, w_new[:, :, None],
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) / sw[:, :, None]  # [R, PD, 1]
    if want_hs:
        return x_new, alpha, idx, x_res, fm, ell, ess, out[2]
    return x_new, alpha, idx, x_res, fm, ell, ess


def _mk_net(wt1s_ref, wtms_ref, wt3s_ref, n_mid):
    n_wm = max(n_mid, 1)

    def net(i):
        return (
            wt1s_ref[i],
            [wtms_ref[i * n_wm + j] for j in range(n_mid)],
            wt3s_ref[i],
        )

    return net


def _write_stats(stats_ref, fm, ell, ess):
    stats_ref[:] = jnp.zeros_like(stats_ref)
    stats_ref[:, :, 0:1] = fm
    stats_ref[:, 0:1, 1:2] = ell[:, :, None]
    stats_ref[:, 0:1, 2:3] = ess[:, :, None]


def _fwd_kernel(
    k, n_mid, activation,
    # inputs (weights augmented + TRANSPOSED — see module docstring)
    logw_ref, u_ref, x_ref, eps_ref, sm_ref, sconst_ref,
    wt1s_ref, wtms_ref, wt3s_ref,
    # outputs
    xnew_ref, alpha_ref, stats_ref, idx_ref, xres_ref,
):
    del activation  # always relu (eligibility)
    net = _mk_net(wt1s_ref, wtms_ref, wt3s_ref, n_mid)
    x_new, alpha, idx, x_res, fm, ell, ess = _fwd_core(
        k, net, logw_ref[:], u_ref[:], x_ref[:], eps_ref[:],
        sm_ref[:], sconst_ref[:],
    )
    idx_ref[:] = idx
    xres_ref[:] = x_res
    xnew_ref[:] = x_new
    alpha_ref[:] = alpha
    _write_stats(stats_ref, fm, ell, ess)


# ---------------------------------------------------------------------------
# Backward kernel
# ---------------------------------------------------------------------------


def _propose_weight_bwd_core(
    net, netw, x_res, x_new, eps, sm, sconst, d_xnew_in, d_alpha_in,
    d_stats=None, saved_hs=None,
):
    """Recompute-style backward of _propose_weight_core as pure array math.
    Returns (d_xres, d_absc, sm_sums, dsfg, dws) where dws is
    [(dw1, dwm_list, dw3) for q1, f, g], sm_sums/dsfg are the packed
    fusion-coefficient / scale-inverse reductions, and d_absc [R, 1] is the
    α-bias-scalar cotangent Σ_k dα (the ε² part of the bias carries no
    param dependence — ε is raw RNG). α is rebuilt HERE, on the same f/g
    trunk pass the backprop reuses — when `d_stats` is given (megakernel:
    ℓ = lse(α) computed in-kernel) its ℓ cotangent flows through the
    softmax; the K-tiled trunk kernel leaves lse to XLA and passes None.
    The caller scatters d_xres through the ancestor choice itself."""
    eps = _pad_sub(eps, x_new.shape[-2])
    cq = sm[:, :, SM_CQ : SM_CQ + 1]
    y = sm[:, :, SM_Y : SM_Y + 1]
    absc = jnp.sum(sm[:, :, SM_AB : SM_AB + 1], axis=1)  # [R, 1]
    sfi = _col3(sconst, SM_SFI)
    sgi = _col3(sconst, SM_SGI)

    # ---- recompute: f and g trunks keep their activations through the α
    # rebuild; q1 runs later so its hidden stack never overlaps g's.
    # SAVE_ACTS A/B: saved_hs streams the forward's hidden stacks from HBM
    # and only the cheap final denses rebuild the means.
    if saved_hs is None:
        m_f, hs_f = _trunk(x_res, *net(_F))
        m_g, hs_g = _trunk(x_new, *net(_G))
    else:
        hs_q_saved, hs_f, hs_g = saved_hs
        m_f = _dense(hs_f[-1], net(_F)[2])
        m_g = _dense(hs_g[-1], net(_G)[2])
    z_f = (x_new - m_f) * sfi
    z_g = (y - m_g) * sgi
    alpha = -0.5 * jnp.sum(z_f * z_f - eps * eps + z_g * z_g, axis=-2) + absc
    floored = alpha < -3e30  # grad cut where the forward floor clamped

    # ---- α cotangent: direct (+ through ℓ = lse(α) − log K in-kernel)
    d_alpha = d_alpha_in
    if d_stats is not None:
        alpha = jnp.maximum(alpha, -3e30)
        amax = jnp.max(alpha, axis=-1, keepdims=True)
        w_new = jnp.exp(alpha - amax)
        soft = w_new / _lane_sum(w_new)
        # ℓ rides stats[:, 0, 1]; its cotangent is zero on rows > 0, so the
        # sublane sum is exact and avoids a [R, 1, 1] ref load
        d_ell = jnp.sum(d_stats[:, :, 1:2], axis=1)  # [R, 1]
        d_alpha = d_alpha + d_ell * soft
    d_alpha = jnp.where(floored, 0.0, d_alpha)

    # ---- z-paths
    da_col = d_alpha[:, None, :]  # broadcast over channels
    d_zf = -da_col * z_f
    d_zg = -da_col * z_g
    d_mf = -d_zf * sfi
    d_mg = -d_zg * sgi
    d_xnew = d_xnew_in + d_zf * sfi

    # scale-inverse grads in the [PD, 8] safe shape; one fused reduction
    # for both (the kernel is op-count-bound — round-3 ablation)
    dsfg = _bias_grad8(
        jnp.concatenate([d_zf * (x_new - m_f), d_zg * (y - m_g)], axis=-2)
    )  # [2·PD, 8]

    # ---- g trunk backprop (activations live from the recompute)
    d_xg, dw1_g, dwm_g, dw3_g = _trunk_bwd(x_new, hs_g, d_mg, *netw(_G))
    d_xnew = d_xnew + d_xg

    # ---- draw + fusion grads (m1-independent parts first)
    d_meanq = d_xnew
    d_m1 = cq * d_meanq

    # ---- q1 trunk backprop (third trunk pass; also yields m1 for dcq)
    if saved_hs is None:
        m1, hs_q = _trunk(x_res, *net(_Q1))
    else:
        hs_q = hs_q_saved
        m1 = _dense(hs_q[-1], net(_Q1)[2])
    d_xr_q, dw1_q, dwm_q, dw3_q = _trunk_bwd(x_res, hs_q, d_m1, *netw(_Q1))

    # one fused lane-sum for the three per-step fusion-coefficient grads
    sm_sums = _lane_sum(
        jnp.concatenate([d_meanq, d_meanq * m1, d_xnew * eps], axis=-2)
    )  # [R, 3·PD, 1]

    # ---- f trunk backprop (activations kept from the top)
    d_xr_f, dw1_f, dwm_f, dw3_f = _trunk_bwd(x_res, hs_f, d_mf, *netw(_F))

    dws = [(dw1_q, dwm_q, dw3_q), (dw1_f, dwm_f, dw3_f), (dw1_g, dwm_g, dw3_g)]
    return d_xr_q + d_xr_f, _lane_sum(d_alpha), sm_sums, dsfg, dws


def _bwd_core(
    k, net, netw, x_res, x_new, idx, eps, sm, sconst,
    d_xnew_in, d_alpha_in, d_stats, saved_hs=None,
):
    """Recompute-style step backward (per-step and whole-scan megakernels):
    the shared propose+weight backward (α + lse/softmax path rebuilt on its
    single f/g trunk pass — or read from the SAVE_ACTS streams), then
    scatter the particle grads back through the ancestor choice. Returns
    (d_x, d_absc, sm_sums, dsfg, dws)."""
    d_xres, d_absc, sm_sums, dsfg, dws = _propose_weight_bwd_core(
        net, netw, x_res, x_new, eps, sm, sconst,
        d_xnew_in, d_alpha_in, d_stats, saved_hs=saved_hs,
    )

    # ---- scatter particle grads back through the ancestor choice
    scatter = _factored_scatter if FACTORED_SCATTER else _onehot_scatter
    d_x = scatter(d_xres, idx, k)
    return d_x, d_absc, sm_sums, dsfg, dws


def _write_dsm(dsm_ref, sm_sums, d_absc, pd):
    dsm_ref[:] = jnp.zeros_like(dsm_ref)
    dsm_ref[:, :, SM_AQ : SM_AQ + 1] = sm_sums[:, :pd]
    dsm_ref[:, :, SM_CQ : SM_CQ + 1] = sm_sums[:, pd : 2 * pd]
    dsm_ref[:, :, SM_SQ : SM_SQ + 1] = sm_sums[:, 2 * pd :]
    # α-bias scalar rides row 0 of lane SM_AB (pack_sm pads the other rows
    # with zeros, whose VJP drops the cotangent there)
    dsm_ref[:, 0:1, SM_AB : SM_AB + 1] = d_absc[:, :, None]


def _accum_param_grads(
    n_mid, pd, dsfg, dws, dsconst_ref, dw1s_ref, dwms_ref, dw3s_ref, init
):
    """Zero-init the resident param-grad blocks under `init`, then +=."""
    from jax.experimental import pallas as pl

    n_wm = max(n_mid, 1)

    @pl.when(init)
    def _():
        dsconst_ref[:] = jnp.zeros_like(dsconst_ref)
        dw1s_ref[:] = jnp.zeros_like(dw1s_ref)
        dwms_ref[:] = jnp.zeros_like(dwms_ref)  # incl. the n_mid=0 dummy
        dw3s_ref[:] = jnp.zeros_like(dw3s_ref)

    dsconst_ref[:, SM_SFI : SM_SFI + 8] += dsfg[:pd]
    dsconst_ref[:, SM_SGI : SM_SGI + 8] += dsfg[pd:]
    for i, (dw1, dwm, dw3) in enumerate(dws):
        dw1s_ref[i] += dw1
        dw3s_ref[i] += dw3
        for j in range(n_mid):
            dwms_ref[i * n_wm + j] += dwm[j]


def _bwd_kernel(
    k, n_mid, activation,
    # residual inputs (wt* = transposed for recompute, w* for _dense_t)
    xres_ref, xnew_ref, idx_ref, eps_ref, sm_ref, sconst_ref,
    wt1s_ref, wtms_ref, wt3s_ref, w1s_ref, wms_ref, w3s_ref,
    # cotangent inputs
    dxnew_ref, dalpha_ref, dstats_ref,
    # outputs: per-batch grads
    dx_ref, dsm_ref,
    # outputs: accumulated param grads (constant index map, resident)
    dsconst_ref, dw1s_ref, dwms_ref, dw3s_ref,
):
    from jax.experimental import pallas as pl

    del activation
    net = _mk_net(wt1s_ref, wtms_ref, wt3s_ref, n_mid)
    netw = _mk_net(w1s_ref, wms_ref, w3s_ref, n_mid)
    pd = xnew_ref.shape[-2]

    d_x, d_absc, sm_sums, dsfg, dws = _bwd_core(
        k, net, netw, xres_ref[:], xnew_ref[:], idx_ref[:], eps_ref[:],
        sm_ref[:], sconst_ref[:],
        dxnew_ref[:], dalpha_ref[:], dstats_ref[:],
    )
    dx_ref[:] = d_x
    _write_dsm(dsm_ref, sm_sums, d_absc, pd)
    _accum_param_grads(
        n_mid, pd, dsfg, dws, dsconst_ref, dw1s_ref, dwms_ref, dw3s_ref,
        pl.program_id(0) == 0,
    )


# ---------------------------------------------------------------------------
# custom-VJP wrapper (padded, augmented domain)
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _step_call(static, logw, u, x, eps, sm, sconst,
               wt1s, wtms, wt3s, w1s, wms, w3s):
    """static = (k, pd, n_mid, activation). All tensors padded/packed/
    bias-augmented; weights in BOTH orientations (wt* transposed for the
    forward dots, w* for the backward transpose dots — weight grads are
    reported on w*, wt* get zeros, the caller derives both from one param
    tree so autodiff sums them).

    Returns (x_new [B,PD,K], alpha [B,K], stats [B,PD,128]) where stats
    lane 0 = filtered mean, [0,1] = ℓ, [0,2] = ESS (metrics lanes carry no
    gradient; ℓ's cotangent is honored)."""
    out, _ = _step_fwd(static, logw, u, x, eps, sm, sconst,
                       wt1s, wtms, wt3s, w1s, wms, w3s)
    return out


def _mk_specs(shapes, rb):
    """BlockSpecs: batch-leading tensors block over rows, params replicate."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    specs = []
    for shape, batched in shapes:
        if batched:
            specs.append(
                pl.BlockSpec(
                    (rb, *shape[1:]),
                    lambda b, _n=len(shape): (b,) + (0,) * (_n - 1),
                    memory_space=pltpu.VMEM,
                )
            )
        else:
            specs.append(
                pl.BlockSpec(
                    shape,
                    lambda b, _n=len(shape): (0,) * _n,
                    memory_space=pltpu.VMEM,
                )
            )
    return specs


def _step_fwd(static, logw, u, x, eps, sm, sconst,
              wt1s, wtms, wt3s, w1s, wms, w3s):
    from jax.experimental import pallas as pl

    k, pd, n_mid, activation = static
    batch = logw.shape[0]
    ha = wt1s.shape[1]  # augmented hidden width
    n_wm = wms.shape[0] // 3

    in_shapes = [
        ((batch, k), True),           # logw
        ((batch, k), True),           # u
        ((batch, pd, k), True),       # x
        (eps.shape, True),            # eps (unpadded [B, Dx, K])
        ((batch, pd, _LANES), True),  # sm
        ((pd, _LANES), False),        # sconst
        ((3, ha, pd), False),         # wt1s
        ((3 * n_wm, ha, ha), False),  # wtms
        ((3, pd, ha), False),         # wt3s
    ]
    out_shapes = [
        ((batch, pd, k), True),       # x_new
        ((batch, k), True),           # alpha
        ((batch, pd, _LANES), True),  # stats
        ((batch, k), True),           # idx
        ((batch, pd, k), True),       # x_res
    ]
    out_shape = [
        jax.ShapeDtypeStruct((batch, pd, k), jnp.float32),
        jax.ShapeDtypeStruct((batch, k), jnp.float32),
        jax.ShapeDtypeStruct((batch, pd, _LANES), jnp.float32),
        jax.ShapeDtypeStruct((batch, k), jnp.int32),
        jax.ShapeDtypeStruct((batch, pd, k), jnp.float32),
    ]
    rb = _row_block(batch, k)
    x_new, alpha, stats, idx, x_res = pl.pallas_call(
        functools.partial(_fwd_kernel, k, n_mid, activation),
        grid=(batch // rb,),
        in_specs=_mk_specs(in_shapes, rb),
        out_specs=_mk_specs(out_shapes, rb),
        out_shape=out_shape,
        compiler_params=_vmem_params(),
        interpret=_INTERPRET,
    )(logw, u, x, eps, sm, sconst, wt1s, wtms, wt3s)
    res = (x_res, x_new, idx, eps, sm, sconst,
           wt1s, wtms, wt3s, w1s, wms, w3s)
    return (x_new, alpha, stats), res


def _step_bwd(static, res, cots):
    from jax.experimental import pallas as pl

    k, pd, n_mid, activation = static
    (x_res, x_new, idx, eps, sm, sconst,
     wt1s, wtms, wt3s, w1s, wms, w3s) = res
    d_xnew, d_alpha, d_stats = cots
    batch = idx.shape[0]
    ha = wt1s.shape[1]
    n_wm = wms.shape[0] // 3

    in_shapes = [
        ((batch, pd, k), True),       # x_res
        ((batch, pd, k), True),       # x_new
        ((batch, k), True),           # idx
        (eps.shape, True),            # eps (unpadded [B, Dx, K])
        ((batch, pd, _LANES), True),  # sm
        ((pd, _LANES), False),        # sconst
        ((3, ha, pd), False),         # wt1s
        ((3 * n_wm, ha, ha), False),  # wtms
        ((3, pd, ha), False),         # wt3s
        ((3, pd, ha), False),         # w1s
        ((3 * n_wm, ha, ha), False),  # wms
        ((3, ha, pd), False),         # w3s
        ((batch, pd, k), True),       # d_xnew
        ((batch, k), True),           # d_alpha
        ((batch, pd, _LANES), True),  # d_stats
    ]
    out_shapes = [
        ((batch, pd, k), True),       # d_x
        ((batch, pd, _LANES), True),  # d_sm
        ((pd, _LANES), False),        # d_sconst
        ((3, pd, ha), False),         # d_w1s
        ((3 * n_wm, ha, ha), False),  # d_wms
        ((3, ha, pd), False),         # d_w3s
    ]
    out_shape = [
        jax.ShapeDtypeStruct((batch, pd, k), jnp.float32),
        jax.ShapeDtypeStruct((batch, pd, _LANES), jnp.float32),
        jax.ShapeDtypeStruct((pd, _LANES), jnp.float32),
        jax.ShapeDtypeStruct((3, pd, ha), jnp.float32),
        jax.ShapeDtypeStruct((3 * n_wm, ha, ha), jnp.float32),
        jax.ShapeDtypeStruct((3, ha, pd), jnp.float32),
    ]
    rb = _row_block(batch, k)
    (d_x, d_sm, d_sconst, d_w1s, d_wms, d_w3s) = pl.pallas_call(
        functools.partial(_bwd_kernel, k, n_mid, activation),
        grid=(batch // rb,),
        in_specs=_mk_specs(in_shapes, rb),
        out_specs=_mk_specs(out_shapes, rb),
        out_shape=out_shape,
        compiler_params=_vmem_params(),
        interpret=_INTERPRET,
    )(x_res, x_new, idx, eps, sm, sconst,
      wt1s, wtms, wt3s, w1s, wms, w3s, d_xnew, d_alpha, d_stats)

    zeros = jnp.zeros_like
    return (
        zeros(d_alpha),  # d logw: stop-gradient through resampling
        zeros(d_alpha),  # d u
        d_x,
        zeros(eps),      # ε is raw RNG — no param dependence
        d_sm,
        d_sconst,
        # weight grads ride the w* inputs; the wt* transposes get zeros
        zeros(wt1s), zeros(wtms), zeros(wt3s),
        d_w1s, d_wms, d_w3s,
    )


_step_call.defvjp(_step_fwd, _step_bwd)


# ---------------------------------------------------------------------------
# Whole-scan kernels: ONE pallas_call per direction for the ENTIRE filter.
#
# The per-step megakernel still paid ~2 kernel launches plus the lax.scan
# glue (operand dynamic-slices, output dynamic-update-slices, carry
# bookkeeping — several XLA ops of 2-8 µs) per timestep. Here the grid is
# (batch-blocks, T−1) with t fastest-varying: per-step operands stream
# through t-indexed BlockSpecs, the carry (particles + log-weights) lives in
# VMEM scratch across grid steps, and x0 / the weights stay resident. The
# backward mirrors it with REVERSED index maps (t = T−2−tr), carrying the
# particle cotangent in scratch exactly where lax.scan's VJP carried d_x.
# Param grads accumulate into constant-index-map resident blocks across BOTH
# grid axes. The launch count per train step drops from ~2(T−1) to 2.
# ---------------------------------------------------------------------------

SCAN_FUSED = True  # flip False to A/B the per-step _step_call path

# A/B toggle (ROADMAP #1 / VERDICT r3 #3a): save the three trunks' hidden
# stacks to HBM in the forward whole-scan kernel and stream them back into
# the backward instead of recomputing — n_mid == 1 configs only. Roofline
# arithmetic says this LOSES (6 × [R, HA, K] streams ≈ 56 MB/timestep of new
# traffic at the primary config vs ~30 µs/timestep of MXU recompute saved);
# the flag exists so the answer is MEASURED, not estimated.
#
# MEASURED (v5e 2026-08-20, primary config): recompute rb=16 14.76 ms/step;
# save-acts 17.51 ms (the 6 double-buffered streams also blow the 64 MiB
# scoped-VMEM grant at rb=16 — 66.8 MiB — forcing rb=8); recompute rb=8
# control 15.30 ms. At matched rb the streams cost +2.2 ms (+14%) against
# ~0 saved — the recompute VJP is the right design; dead end recorded, the
# toggle stays for auditability (equivalence test:
# test_pallas_step.test_save_acts_matches_recompute).
SAVE_ACTS = False


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _scan_call(static, x0, alpha0, sm, eps, u, sconst,
               wt1s, wtms, wt3s, w1s, wms, w3s):
    """static = (k, pd, n_mid, activation, rng_dx, cache). Streams are
    [T-1, ...].

    rng_dx = None: eps/u are the materialized HBM noise streams.
    rng_dx = Dx (kernel_rng): `eps` is the [1, 2] f32 SEED operand, the
    kernels draw their own noise (see the in-kernel RNG comment block), and
    `u` degrades to a [T-1, B, 1] shape-carrier that is never read (t_len
    and batch come off it; it never enters the pallas_call).

    Returns (x_last, alpha_last, stats) — plus (x_new_all, alpha_all) when
    `cache` (the SVO/PSVO history; FIVO skips the two big stream outputs'
    cotangent plumbing entirely)."""
    out, _ = _scan_fwd(static, x0, alpha0, sm, eps, u, sconst,
                       wt1s, wtms, wt3s, w1s, wms, w3s)
    return out


def _scan_fwd_kernel(
    k, n_mid, t_len, rng_dx, save_acts,
    *refs,
):
    from jax.experimental import pallas as pl

    it = list(refs)
    if rng_dx is None:
        (x0_ref, a0_ref, sm_ref, eps_ref, u_ref, sconst_ref,
         wt1s_ref, wtms_ref, wt3s_ref) = it[:9]
        it = it[9:]
    else:
        (x0_ref, a0_ref, sm_ref, seed_ref, sconst_ref,
         wt1s_ref, wtms_ref, wt3s_ref) = it[:8]
        it = it[8:]
    xnew_ref, alpha_ref, stats_ref, idx_ref, xres_ref = it[:5]
    it = it[5:]
    hs_refs = None
    if save_acts:
        hs_refs = it[:6]  # q1 h1/h2, f h1/h2, g h1/h2
        it = it[6:]
    xlast_ref, alast_ref, x_c, lw_c = it

    t = pl.program_id(1)
    net = _mk_net(wt1s_ref, wtms_ref, wt3s_ref, n_mid)

    @pl.when(t == 0)
    def _():
        x_c[:] = x0_ref[:]
        lw_c[:] = a0_ref[:]

    if rng_dx is None:
        eps_t, u_t = eps_ref[0], u_ref[0]
    else:
        _rng_seed(seed_ref, pl.program_id(0), t)
        rb, pd = x_c.shape[0], x_c.shape[1]
        eps_t = _rng_eps((rb, pd, k), rng_dx)
        u_t = _rng_sys_u(rb, k)

    out = _fwd_core(
        k, net, lw_c[:], u_t, x_c[:], eps_t,
        sm_ref[0], sconst_ref[:], want_hs=save_acts,
    )
    x_new, alpha, idx, x_res, fm, ell, ess = out[:7]
    if save_acts:
        hs_q, hs_f, hs_g = out[7]
        for ref, h in zip(hs_refs, (*hs_q, *hs_f, *hs_g)):
            ref[:] = h[None]
    idx_ref[:] = idx[None]
    xres_ref[:] = x_res[None]
    xnew_ref[:] = x_new[None]
    alpha_ref[:] = alpha[None]
    stats_ref[:] = jnp.zeros_like(stats_ref)
    stats_ref[:, :, :, 0:1] = fm[None]
    stats_ref[:, :, 0:1, 1:2] = ell[None, :, :, None]
    stats_ref[:, :, 0:1, 2:3] = ess[None, :, :, None]
    x_c[:] = x_new
    lw_c[:] = alpha

    @pl.when(t == t_len - 1)
    def _():
        xlast_ref[:] = x_new
        alast_ref[:] = alpha


def _scan_bwd_kernel(
    k, n_mid, t_len, rng_dx, save_acts, has_cot,
    # residuals (streamed reversed) + constants; with rng_dx the eps slot
    # carries the [1, 2] SMEM seed instead of the stream
    xres_ref, xnew_ref, idx_ref, eps_ref, sm_ref, sconst_ref,
    wt1s_ref, wtms_ref, wt3s_ref, w1s_ref, wms_ref, w3s_ref,
    *rest,
):
    from jax.experimental import pallas as pl

    it = iter(rest)
    saved_hs = None
    if save_acts:
        hs6 = [next(it) for _ in range(6)]
        saved_hs = (
            [hs6[0][0], hs6[1][0]],
            [hs6[2][0], hs6[3][0]],
            [hs6[4][0], hs6[5][0]],
        )
    dxnew_s = next(it) if has_cot else None
    dalpha_s = next(it) if has_cot else None
    dstats_s, dxlast_ref, dalast_ref = next(it), next(it), next(it)
    dx0_ref, dsm_ref = next(it), next(it)
    dsconst_ref, dw1s_ref, dwms_ref, dw3s_ref = (
        next(it), next(it), next(it), next(it),
    )
    (dxc,) = it

    b, tr = pl.program_id(0), pl.program_id(1)
    net = _mk_net(wt1s_ref, wtms_ref, wt3s_ref, n_mid)
    netw = _mk_net(w1s_ref, wms_ref, w3s_ref, n_mid)
    pd = dxc.shape[-2]

    @pl.when(tr == 0)
    def _():
        dxc[:] = dxlast_ref[:]  # cotangent of x_last seeds the carry

    d_xnew_in = dxc[:]
    d_alpha_in = jnp.where(tr == 0, dalast_ref[:], 0.0)
    if has_cot:
        d_xnew_in = d_xnew_in + dxnew_s[0]
        d_alpha_in = d_alpha_in + dalpha_s[0]

    if rng_dx is None:
        eps_t = eps_ref[0]
    else:
        # regenerate the forward's ε: same (seed, b, t) seeding, and the
        # forward drew its two ε bit-tensors FIRST (u after), so stopping
        # after two draws reproduces it exactly
        rb = dxc.shape[0]
        _rng_seed(eps_ref, b, t_len - 1 - tr)
        eps_t = _rng_eps((rb, pd, k), rng_dx)

    d_x, d_absc, sm_sums, dsfg, dws = _bwd_core(
        k, net, netw, xres_ref[0], xnew_ref[0], idx_ref[0], eps_t,
        sm_ref[0], sconst_ref[:],
        d_xnew_in, d_alpha_in, dstats_s[0], saved_hs=saved_hs,
    )
    dsm_ref[:] = jnp.zeros_like(dsm_ref)
    # slice FIRST, newaxis after: `v[None, :, :pd]` (newaxis mixed with a
    # partial slice) traces to a rank>2 lax.gather that Mosaic rejects on
    # real TPU ("Only 2D gather is supported"); slice_in_dim + pure [None]
    # stays slice+broadcast. Interpret-mode tests cannot catch this class.
    for lane, lo in ((SM_AQ, 0), (SM_CQ, pd), (SM_SQ, 2 * pd)):
        part = jax.lax.slice_in_dim(sm_sums, lo, lo + pd, axis=1)
        dsm_ref[:, :, :, lane : lane + 1] = part[None]
    dsm_ref[:, :, 0:1, SM_AB : SM_AB + 1] = d_absc[None, :, :, None]
    dxc[:] = d_x  # feeds step t-1's x_new cotangent

    @pl.when(tr == t_len - 1)
    def _():
        dx0_ref[:] = d_x  # t == 0: the cotangent of the initial particles

    _accum_param_grads(
        n_mid, pd, dsfg, dws, dsconst_ref, dw1s_ref, dwms_ref, dw3s_ref,
        (b == 0) & (tr == 0),
    )


def _res_spec(shape, rb, reverse_t_len=None):
    """BlockSpec for a [T, B, ...] stream: block (1, rb, ...)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = len(shape)
    if reverse_t_len is None:
        imap = lambda b, t, _n=n: (t, b) + (0,) * (_n - 2)
    else:
        imap = lambda b, t, _n=n, _tl=reverse_t_len: (_tl - 1 - t, b) + (0,) * (
            _n - 2
        )
    return pl.BlockSpec((1, rb, *shape[2:]), imap, memory_space=pltpu.VMEM)


def _const_spec(shape, rb=None, batched_rows=False):
    """Resident block: constant over t (and blocked over rows if batched)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = len(shape)
    if batched_rows:
        return pl.BlockSpec(
            (rb, *shape[1:]),
            lambda b, t, _n=n: (b,) + (0,) * (_n - 1),
            memory_space=pltpu.VMEM,
        )
    return pl.BlockSpec(
        shape, lambda b, t, _n=n: (0,) * _n, memory_space=pltpu.VMEM
    )


def _scan_fwd(static, x0, alpha0, sm, eps, u, sconst,
              wt1s, wtms, wt3s, w1s, wms, w3s):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    k, pd, n_mid, _activation, rng_dx, cache = static
    t_len, batch = u.shape[0], u.shape[1]
    rb = _row_block(batch, k)

    if rng_dx is None:
        noise_specs = [_res_spec(eps.shape, rb), _res_spec(u.shape, rb)]
        noise_ops = [eps, u]
    else:  # eps carries the [1, 2] f32 seed; u never enters the kernel
        noise_specs = [
            pl.BlockSpec((1, 2), lambda b, t: (0, 0), memory_space=pltpu.SMEM)
        ]
        noise_ops = [eps]
    in_specs = [
        _const_spec(x0.shape, rb, batched_rows=True),
        _const_spec(alpha0.shape, rb, batched_rows=True),
        _res_spec(sm.shape, rb),
        *noise_specs,
        _const_spec(sconst.shape),
        _const_spec(wt1s.shape),
        _const_spec(wtms.shape),
        _const_spec(wt3s.shape),
    ]
    save_acts = SAVE_ACTS and n_mid == 1
    ha = wt1s.shape[1]
    out_specs = [
        _res_spec((t_len, batch, pd, k), rb),      # x_new
        _res_spec((t_len, batch, k), rb),          # alpha
        _res_spec((t_len, batch, pd, _LANES), rb), # stats
        _res_spec((t_len, batch, k), rb),          # idx
        _res_spec((t_len, batch, pd, k), rb),      # x_res
    ]
    out_shape = [
        jax.ShapeDtypeStruct((t_len, batch, pd, k), jnp.float32),
        jax.ShapeDtypeStruct((t_len, batch, k), jnp.float32),
        jax.ShapeDtypeStruct((t_len, batch, pd, _LANES), jnp.float32),
        jax.ShapeDtypeStruct((t_len, batch, k), jnp.int32),
        jax.ShapeDtypeStruct((t_len, batch, pd, k), jnp.float32),
    ]
    if save_acts:  # 6 × [T, B, HA, K] hidden-stack streams
        out_specs += [_res_spec((t_len, batch, ha, k), rb)] * 6
        out_shape += [
            jax.ShapeDtypeStruct((t_len, batch, ha, k), jnp.float32)
        ] * 6
    out_specs += [
        _const_spec((batch, pd, k), rb, batched_rows=True),  # x_last
        _const_spec((batch, k), rb, batched_rows=True),      # alpha_last
    ]
    out_shape += [
        jax.ShapeDtypeStruct((batch, pd, k), jnp.float32),
        jax.ShapeDtypeStruct((batch, k), jnp.float32),
    ]
    outs = pl.pallas_call(
        functools.partial(_scan_fwd_kernel, k, n_mid, t_len, rng_dx, save_acts),
        grid=(batch // rb, t_len),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((rb, pd, k), jnp.float32),
            pltpu.VMEM((rb, k), jnp.float32),
        ],
        compiler_params=_vmem_params(),
        interpret=_INTERPRET,
    )(x0, alpha0, sm, *noise_ops, sconst, wt1s, wtms, wt3s)
    xnew, alpha, stats, idx, xres = outs[:5]
    hs_streams = tuple(outs[5:11]) if save_acts else None
    x_last, a_last = outs[-2:]
    res = (xres, xnew, idx, eps, u, sm, sconst,
           wt1s, wtms, wt3s, w1s, wms, w3s, hs_streams)
    if cache:
        return (x_last, a_last, stats, xnew, alpha), res
    return (x_last, a_last, stats), res


def _scan_bwd(static, res, cots):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    k, pd, n_mid, _activation, rng_dx, cache = static
    (xres, xnew, idx, eps, u, sm, sconst,
     wt1s, wtms, wt3s, w1s, wms, w3s, hs_streams) = res
    save_acts = hs_streams is not None
    if cache:
        d_xlast, d_alast, d_stats, d_xnew_s, d_alpha_s = cots
    else:
        d_xlast, d_alast, d_stats = cots
        d_xnew_s = d_alpha_s = None
    t_len, batch = u.shape[0], u.shape[1]
    ha = wt1s.shape[1]
    n_wm = wms.shape[0] // 3
    rb = _row_block(batch, k)

    rev = t_len
    if rng_dx is None:
        eps_spec = _res_spec(eps.shape, rb, reverse_t_len=rev)
    else:  # the eps slot carries the SMEM seed; ε regenerates in-kernel
        eps_spec = pl.BlockSpec(
            (1, 2), lambda b, t: (0, 0), memory_space=pltpu.SMEM
        )
    in_specs = [
        _res_spec(xres.shape, rb, reverse_t_len=rev),
        _res_spec(xnew.shape, rb, reverse_t_len=rev),
        _res_spec(idx.shape, rb, reverse_t_len=rev),
        eps_spec,
        _res_spec(sm.shape, rb, reverse_t_len=rev),
        _const_spec(sconst.shape),
        _const_spec(wt1s.shape),
        _const_spec(wtms.shape),
        _const_spec(wt3s.shape),
        _const_spec(w1s.shape),
        _const_spec(wms.shape),
        _const_spec(w3s.shape),
    ]
    operands = [xres, xnew, idx, eps, sm, sconst,
                wt1s, wtms, wt3s, w1s, wms, w3s]
    if save_acts:
        in_specs += [
            _res_spec(h.shape, rb, reverse_t_len=rev) for h in hs_streams
        ]
        operands += list(hs_streams)
    if cache:
        in_specs += [
            _res_spec(d_xnew_s.shape, rb, reverse_t_len=rev),
            _res_spec(d_alpha_s.shape, rb, reverse_t_len=rev),
        ]
        operands += [d_xnew_s, d_alpha_s]
    in_specs += [
        _res_spec(d_stats.shape, rb, reverse_t_len=rev),
        _const_spec(d_xlast.shape, rb, batched_rows=True),
        _const_spec(d_alast.shape, rb, batched_rows=True),
    ]
    operands += [d_stats, d_xlast, d_alast]

    out_specs = [
        _const_spec((batch, pd, k), rb, batched_rows=True),   # d_x0
        _res_spec((t_len, batch, pd, _LANES), rb, reverse_t_len=rev),  # d_sm
        _const_spec((pd, _LANES)),
        _const_spec((3, pd, ha)),
        _const_spec((3 * n_wm, ha, ha)),
        _const_spec((3, ha, pd)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((batch, pd, k), jnp.float32),
        jax.ShapeDtypeStruct((t_len, batch, pd, _LANES), jnp.float32),
        jax.ShapeDtypeStruct((pd, _LANES), jnp.float32),
        jax.ShapeDtypeStruct((3, pd, ha), jnp.float32),
        jax.ShapeDtypeStruct((3 * n_wm, ha, ha), jnp.float32),
        jax.ShapeDtypeStruct((3, ha, pd), jnp.float32),
    ]
    (d_x0, d_sm, d_sconst, d_w1s, d_wms, d_w3s) = pl.pallas_call(
        functools.partial(
            _scan_bwd_kernel, k, n_mid, t_len, rng_dx, save_acts, cache
        ),
        grid=(batch // rb, t_len),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((rb, pd, k), jnp.float32)],
        compiler_params=_vmem_params(),
        interpret=_INTERPRET,
    )(*operands)

    zeros = jnp.zeros_like
    return (
        d_x0,
        # d alpha0: consumed only via stop-grad resampling/ESS (explicit
        # shape — u degrades to a [T-1, B, 1] carrier under kernel_rng)
        jnp.zeros((batch, k), jnp.float32),
        d_sm,
        zeros(eps),     # ε is raw RNG (or the RNG seed) — no param dependence
        zeros(u),       # d u
        d_sconst,
        zeros(wt1s), zeros(wtms), zeros(wt3s),
        d_w1s, d_wms, d_w3s,
    )


_scan_call.defvjp(_scan_fwd, _scan_bwd)


# ---------------------------------------------------------------------------
# Public entry: augment/pad params once per call (outside the scan)
# ---------------------------------------------------------------------------


def _pad_to(x, rows, axis):
    pad = rows - x.shape[axis]
    if pad == 0:
        return x
    cfg = [(0, 0)] * x.ndim
    cfg[axis] = (0, pad)
    return jnp.pad(x, cfg)


def aug_net(params_net, hidden, pdin: int, pdo: int):
    """Augmented ones-channel weight tensors for ONE trunk, BOTH
    orientations (module docstring): the first layer's bias rides column
    OC = pdin−1 and an e_OC ones-unit row keeps the ones-channel alive;
    every mid layer carries its bias in the ones-unit column; the output
    layer's rows pad to pdo with zeros (so the OC row of the output stays
    0). Differentiable — pure jnp ops on the param tree, so gradients
    reported on these tensors slice back to the true parameters and
    cotangents on the constant entries vanish automatically. Shared by
    `prepare` (stacked q1/f/g for the filtering kernels) and the SVO
    sweep kernel (ops/pallas_svo.py, per-net).

    Returns (wt1 [HA, PDIN], wtm [max(n_mid,1), HA, HA], wt3 [PDO, HA],
    w1, wm, w3 — the swapped-axes orientations for the backward dots)."""
    hid = hidden[0]
    ha = hid + 8
    n_mid = len(hidden) - 1
    oc = pdin - 1

    w1, b1 = params_net["layers"][0]
    top = jnp.concatenate(
        [
            _pad_to(w1.T, oc, 1),  # input cols padded up to OC
            b1[:, None],           # col OC: the bias via the ones-channel
        ],
        axis=1,
    )  # [H, PDIN]
    ones_row = jnp.zeros((1, pdin), jnp.float32).at[0, oc].set(1.0)
    wt1 = jnp.concatenate(
        [top, ones_row, jnp.zeros((7, pdin), jnp.float32)], axis=0
    )

    wtms = []
    for j in range(n_mid):
        wm, bm = params_net["layers"][j + 1]
        topm = jnp.concatenate(
            [wm.T, bm[:, None], jnp.zeros((hid, 7), jnp.float32)], axis=1
        )  # [H, HA]
        ones_m = jnp.zeros((1, ha), jnp.float32).at[0, hid].set(1.0)
        wtms.append(
            jnp.concatenate(
                [topm, ones_m, jnp.zeros((7, ha), jnp.float32)], axis=0
            )
        )
    wtm = jnp.stack(wtms) if n_mid else jnp.zeros((1, ha, ha), jnp.float32)

    w3, b3 = params_net["mean"]
    dout = w3.shape[1]
    top3 = jnp.concatenate(
        [w3.T, b3[:, None], jnp.zeros((dout, 7), jnp.float32)], axis=1
    )  # [dout, HA]
    wt3 = _pad_to(top3, pdo, 0)

    return (
        wt1, wtm, wt3,
        jnp.swapaxes(wt1, -1, -2),
        jnp.swapaxes(wtm, -1, -2),
        jnp.swapaxes(wt3, -1, -2),
    )


def prepare(ssm, params, cfg):
    """Build the augmented stacked weight tensors + per-call constants.

    Ones-channel augmentation (module docstring / `aug_net`): every weight
    matrix grows one ones-unit row/column carrying the biases, so kernels
    run pure matmul chains.
    """
    from psvo_tpu import networks

    dx, dy = ssm.dx, ssm.dy
    # rows: [x (dx) | u_t (di, constant over K) | zero pad | ones-channel]
    pd = _round_up(max(dx + ssm.di, dy) + 1, 8)  # +1: the ones-channel row
    hidden = ssm.nets["q1"].hidden
    ha = hidden[0] + 8  # augmented hidden: unit `hid` is the ones-unit
    n_mid = len(hidden) - 1

    per_net = [aug_net(params[n], hidden, pd, pd) for n in ("q1", "f", "g")]
    wt1s = jnp.stack([p[0] for p in per_net])
    wt3s = jnp.stack([p[2] for p in per_net])
    if n_mid:
        wtms = jnp.concatenate([p[1] for p in per_net], axis=0)
    else:
        wtms = jnp.zeros((3, ha, ha), jnp.float32)
    w1s = jnp.swapaxes(wt1s, -1, -2)
    wms = jnp.swapaxes(wtms, -1, -2)
    w3s = jnp.swapaxes(wt3s, -1, -2)

    s_f = networks.scale_from_raw(params["f"]["raw_scale"], ssm.nets["f"].sigma_min)
    s_g = networks.scale_from_raw(params["g"]["raw_scale"], ssm.nets["g"].sigma_min)
    sfi = _pad_to((1.0 / s_f)[:, None], pd, 0)  # pad rows 0 -> inert
    sgi = _pad_to((1.0 / s_g)[:, None], pd, 0)
    # 1/s_f at lane 0, 1/s_g at lane 8 (their in-kernel [PD, 8] grad
    # stores must not overlap); zero lanes elsewhere
    sconst = _pad_to(
        jnp.concatenate([_pad_to(sfi, 8, 1), sgi], axis=1), _LANES, 1
    )  # [PD, 128]
    s_q1 = networks.scale_from_raw(
        params["q1"]["raw_scale"], ssm.nets["q1"].sigma_min
    )
    return {
        "pd": pd,
        "n_mid": n_mid,
        "activation": ssm.nets["q1"].activation,
        "w": (wt1s, wtms, wt3s, w1s, wms, w3s),
        "sconst": sconst,
        "s_q1": s_q1,  # [Dx]
        "log_sf_sum": jnp.sum(jnp.log(s_f)),
        "log_sg_sum": jnp.sum(jnp.log(s_g)),
    }


def pack_sm(aq, cq, sq, y, ab, pd: int, ctrl_next=None, dx: int = 0):
    """Pack the per-step [T, B, Dx]/[T, B, Dy] vectors as lane-channels of
    one [T, B, PD, 128] tensor (bulk, outside the scan). Row PD−1 of the aq
    channel is pinned to 1 — it regenerates the ones-channel in x_new
    (cq/sq/y rows stay 0 there). ab [T, B] is the K-independent α-bias
    scalar, riding row 0 of lane SM_AB (the kernel adds the ε² part).

    ctrl_next [T, B, Di] (controls support): placed at aq rows dx:dx+Di, so
    x_new = cq·m1 + aq + sq·ε regenerates the control rows of the NEXT
    step's trunk input for free (cq/sq/ε rows are zero there). The `.set`
    VJPs drop the spurious cotangents these rows accumulate — controls are
    data, not parameters."""
    def rows(a):
        return _pad_to(a, pd, a.ndim - 1)

    aq_p = rows(aq).at[..., pd - 1].set(1.0)
    if ctrl_next is not None and ctrl_next.shape[-1]:
        aq_p = aq_p.at[..., dx : dx + ctrl_next.shape[-1]].set(ctrl_next)
    sm = jnp.stack(
        [aq_p, rows(cq), rows(sq), rows(y), rows(ab[..., None])], axis=-1
    )
    return _pad_to(sm, _LANES, sm.ndim - 1)


def fusion_coeffs(ssm, params, cfg, consts, enc_tm):
    """Per-step proposal-fusion coefficients, all K-independent.

    mean_q = cq·m1 + aq, scale_q = sq; with use_2q these come from the
    precision-weighted product of q1's constant scale with the q2 encoder
    head evaluated for ALL T outside the scan (SURVEY.md §3.2 fusion).
    Returns (aq, cq, sq) each [T, B, Dx] and logsq_sum [T, B].
    """
    t_steps, batch = enc_tm.shape[0], enc_tm.shape[1]
    dx = ssm.dx
    s1 = consts["s_q1"]  # [Dx]
    if cfg.use_2q:
        m2, s2 = ssm.q2_mean_scale(params, enc_tm)  # [T, B, Dx]
        prec1 = 1.0 / (s1 * s1)
        prec2 = 1.0 / (s2 * s2)
        var = 1.0 / (prec1 + prec2)
        aq = var * m2 * prec2
        cq = jnp.broadcast_to(var * prec1, (t_steps, batch, dx))
        sq = jnp.sqrt(var)
        sq = jnp.broadcast_to(sq, (t_steps, batch, dx))
        aq = jnp.broadcast_to(aq, (t_steps, batch, dx))
    else:
        aq = jnp.zeros((t_steps, batch, dx), jnp.float32)
        cq = jnp.ones((t_steps, batch, dx), jnp.float32)
        sq = jnp.broadcast_to(s1, (t_steps, batch, dx))
    return aq, cq, sq, jnp.sum(jnp.log(sq), axis=-1)

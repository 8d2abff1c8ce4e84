"""K-tiled fused propose+weight (trunk) kernel for large-PD / large-K.

The whole-step megakernel (ops/pallas_step.py) owes its 22.8 TFLOP/s to
Pallas-scheduling the q1/f/g trunk matmuls, but its eligibility stops at
max(Dx+Di, Dy) ≤ 7 and K ≤ 2048 — the resample gather inside it needs the
full particle block in VMEM and its quadratic tile sweep stops paying past
2048 lanes. BASELINE row 5 (Lorenz-96, Dx=40, K=8192) therefore ran the
plain XLA scan body at 8.3 TFLOP/s achieved: the SAME trunk math, paid
per-fusion through HBM.

This module fuses ONLY the post-resample step body — q1/f trunks on the
resampled particles, proposal fusion + reparameterized draw, g trunk, α —
into one Pallas kernel per direction, K-TILED over a (batch-blocks, K-tiles)
grid. Everything it computes is elementwise over the particle axis, so the
tiles are independent; the data-dependent resample stays OUTSIDE (the
existing indices/windowed/compact kernels of ops/pallas_resample.py), and
ℓ = lse(α) stays in XLA where a [B, K] reduction is cheap.

Math and Mosaic shape rules are shared with the megakernel
(pallas_step._propose_weight_core / _propose_weight_bwd_core — see that
module's docstring for the ones-channel bias folding and the operand-shape
crash classes). The custom VJP here is recompute-FREE: x_res/x_new are the
residuals (no jax.checkpoint wraps this path — smc._forward_filter_trunk
gates on the resulting O(T·B·PD·K) HBM residency instead), so the backward
runs the trunk transpose+weight-grad dots without re-running the forward
trunks: 3 trunk-passes per step total vs the plain path's 4 (remat).

Eligibility (`usable`): everything pallas_step.usable requires of the
NETWORKS (relu, const diag cov, one uniform hidden width % 8, gaussian
emission, no bootstrap/known-dynamics/tril, no mesh) but ANY resampling
config (none/systematic/multinomial, ESS-adaptive, score-function FIVO —
all handled outside) and the RELAXED shape box: PD ≤ MAX_PD, K % 128 == 0
with K ≤ K_TILE or K % K_TILE == 0.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from psvo_tpu.ops.pallas_resample import (
    Q,
    ROW_BLOCK,
    _on_tpu,
    _round_up,
    _vmem_params,
)
from psvo_tpu.ops.pallas_step import (
    _LANES,
    SM_AB,
    SM_AQ,
    SM_CQ,
    SM_SQ,
    _accum_param_grads,
    _mk_net,
    _propose_weight_bwd_core,
    _propose_weight_core,
    _rng_eps,
)

_INTERPRET = False  # flipped by tests to run on CPU

ENABLE = True  # independent kill-switch for A/B against the XLA step body

K_TILE = 2048  # lanes per grid step; VMEM: hiddens [8, HA, KT] ≈ 5 MB each
MAX_PD = 56  # sublane rows incl. ones-channel; backward live set ≈ 55 MB

# Round-5 A/B (VERDICT r4 missing #5): store the (x_res, x_new) VJP
# residual streams in bf16 — the K=8192 rows are movement-bound and the
# trunk VJP parks ~2.5 GB of f32 residuals in HBM per step at T=100;
# bf16 halves that traffic. Compute stays f32 (tiles upcast on load; MXU
# rounds dot operands to bf16 internally anyway, so the dots lose nothing
# — the elementwise α/z math carries the only real rounding). Measured
# (v5e 2026-08-20, L96 K=8192 B=8 fresh-init): 153.4 → 148.4 ms/step
# (+3.4%); gradient rounding is bounded by
# tests/test_pallas_trunk.py::test_trunk_bf16_residuals_bounded_rounding
# (cosine ≥ 0.9999 vs the f32 plain path on CPU). The strict per-leaf
# equivalence tests pin the f32 machinery (fixture flips this off).
BF16_RESIDUALS = True


def usable(ssm, cfg, batch: int) -> bool:
    """Static eligibility of the K-tiled trunk kernel. The megakernel
    (pallas_step.usable) supersedes this path when IT is eligible —
    forward_filter checks it first."""
    from psvo_tpu.parallel.context import get_mesh

    if not (ENABLE and ssm.use_pallas_step and (_on_tpu() or _INTERPRET)):
        return False
    if get_mesh() is not None:
        return False
    if cfg.use_bootstrap or ssm.transition_known:
        return False
    if ssm.emission in ("poisson", "dirac"):
        return False
    if ssm.f_tril or ssm.g_tril:
        return False
    k = cfg.n_particles
    if k % Q or batch % ROW_BLOCK:
        return False
    pd = _round_up(max(ssm.dx + ssm.di, ssm.dy) + 1, 8)
    if pd > MAX_PD:
        return False
    kt = _tile(k, pd)
    if k > kt and k % kt:
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


def rng_tiles_ok(k: int, pd: int) -> bool:
    """The (b·64 + ktile) seed fold is injective only while ktile < 64
    (k ≤ 64·kt — ≥ 64·1024 lanes, 8× today's largest preset); beyond that,
    tile (b, 64) would collide with (b+1, 0) and duplicate ε across
    different particles with no error. The smc gate falls back to the
    streamed ε rather than risk it."""
    return k // _tile(k, pd) <= 64


def _seed_scalars(s0, s1, t, b, ktile):
    """Seed the per-core PRNG from scalar values for grid cell (b, ktile)
    at scan step t (in-kernel RNG, cfg.smc.kernel_rng — see pallas_step's
    RNG comment block; Mosaic accepts ≤2 seed values, so (b, ktile, t)
    fold into the second with odd strides: injective for t < 1000003 AND
    ktile < 64 — `rng_tiles_ok` gates the latter — with deterministic
    int32 wrap). Shared by the production kernels and the extractor so
    the combine can never drift."""
    from jax.experimental.pallas import tpu as pltpu

    pltpu.prng_seed(
        s0.astype(jnp.int32),
        s1.astype(jnp.int32)
        + (b * jnp.int32(64) + ktile) * jnp.int32(1000003)
        + t.astype(jnp.int32),
    )


def _rng_seed_tile(seed_ref, b, ktile):
    """Production read: the [1, 4] SMEM row (seed0, seed1, t, 0)."""
    _seed_scalars(
        seed_ref[0, 0], seed_ref[0, 1], seed_ref[0, 2], b, ktile
    )


def _tile_eps(rng_dx, eps_ref, xres_ref, b, ktile):
    """This tile's ε: streamed from HBM, or drawn from the hardware PRNG
    (the eps slot then carries the [1, 4] f32 (seed0, seed1, t, 0) row)."""
    if rng_dx is None:
        return eps_ref[:]
    _rng_seed_tile(eps_ref, b, ktile)
    rb, pd, kt = xres_ref.shape
    return _rng_eps((rb, pd, kt), rng_dx)


def generate_trunk_noise(seeds_t, batch: int, pd: int, k: int, dx: int):
    """TPU-only diagnostic: materialize the exact ε the kernel_rng trunk
    kernels draw — same seeding helper, same tile blocking, same draw
    order — so the unfused jnp path can replay them (forward_filter's
    noise hook) and the fused path be equivalence-checked on-device
    (benchmark.trunk_rng_equiv_check). seeds_t [T, 4] f32 rows
    (seed0, seed1, t, 0). Returns eps [T, B, PD, K] (slice [:, :, :dx])."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t_len = seeds_t.shape[0]
    kt = _tile(k, pd)
    rb = ROW_BLOCK
    # t-blocked specs need their last two dims (8, ·)-divisible-or-equal;
    # pad the [T, 4] rows into [T, 8, 8] blocks (row 0 carries the values —
    # _rng_seed_tile's [0, i] reads hold on the [8, 8] slice)
    seeds_blk = jnp.zeros((t_len, 8, 8), jnp.float32).at[:, 0, :4].set(seeds_t)

    def kern(seed_ref, eps_ref):
        _seed_scalars(
            seed_ref[0, 0, 0], seed_ref[0, 0, 1], seed_ref[0, 0, 2],
            pl.program_id(0), pl.program_id(2),
        )
        eps_ref[:] = _rng_eps((rb, pd, kt), dx)[None]

    return pl.pallas_call(
        kern,
        grid=(batch // rb, t_len, k // kt),
        in_specs=[
            pl.BlockSpec(
                (1, 8, 8), lambda b, t, s: (t, 0, 0), memory_space=pltpu.SMEM
            )
        ],
        out_specs=pl.BlockSpec(
            (1, rb, pd, kt),
            lambda b, t, s: (t, b, 0, s),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((t_len, batch, pd, k), jnp.float32),
        compiler_params=_vmem_params(),
        interpret=_INTERPRET,
    )(seeds_blk)


def _tr_fwd_kernel(
    n_mid, rng_dx,
    xres_ref, eps_ref, sm_ref, sconst_ref, wt1s_ref, wtms_ref, wt3s_ref,
    xnew_ref, alpha_ref,
):
    from jax.experimental import pallas as pl

    net = _mk_net(wt1s_ref, wtms_ref, wt3s_ref, n_mid)
    eps = _tile_eps(rng_dx, eps_ref, xres_ref, pl.program_id(0), pl.program_id(1))
    x_new, alpha = _propose_weight_core(
        net, xres_ref[:], eps, sm_ref[:], sconst_ref[:]
    )
    xnew_ref[:] = x_new
    alpha_ref[:] = alpha


def _tr_bwd_kernel(
    n_mid, rng_dx,
    # residuals (wt* transposed for recompute dots, w* for _dense_t)
    xres_ref, xnew_ref, eps_ref, sm_ref, sconst_ref,
    wt1s_ref, wtms_ref, wt3s_ref, w1s_ref, wms_ref, w3s_ref,
    # cotangents
    dxnew_ref, dalpha_ref,
    # outputs
    dxres_ref, dsm_ref, dsconst_ref, dw1s_ref, dwms_ref, dw3s_ref,
):
    from jax.experimental import pallas as pl

    net = _mk_net(wt1s_ref, wtms_ref, wt3s_ref, n_mid)
    netw = _mk_net(w1s_ref, wms_ref, w3s_ref, n_mid)
    pd = xnew_ref.shape[-2]
    b, kt = pl.program_id(0), pl.program_id(1)
    # regenerated ε is exact: same (seed, b, ktile, t), same two draws
    eps = _tile_eps(rng_dx, eps_ref, xres_ref, b, kt)

    # residual tiles arrive bf16 under BF16_RESIDUALS; upcast on load so
    # every accumulation below stays f32
    x_res = xres_ref[:].astype(jnp.float32)
    x_new = xnew_ref[:].astype(jnp.float32)
    d_xres, d_absc, sm_sums, dsfg, dws = _propose_weight_bwd_core(
        net, netw, x_res, x_new, eps,
        sm_ref[:], sconst_ref[:], dxnew_ref[:], dalpha_ref[:], None,
    )
    dxres_ref[:] = d_xres

    # d_sm accumulates over the K tiles (grid axis 1 is fastest-varying, so
    # the block for batch-row b stays resident across its kt steps)
    @pl.when(kt == 0)
    def _():
        dsm_ref[:] = jnp.zeros_like(dsm_ref)

    for lane, lo in ((SM_AQ, 0), (SM_CQ, pd), (SM_SQ, 2 * pd)):
        part = jax.lax.slice_in_dim(sm_sums, lo, lo + pd, axis=1)
        dsm_ref[:, :, lane : lane + 1] += part
    dsm_ref[:, 0:1, SM_AB : SM_AB + 1] += d_absc[:, :, None]

    _accum_param_grads(
        n_mid, pd, dsfg, dws, dsconst_ref, dw1s_ref, dwms_ref, dw3s_ref,
        (b == 0) & (kt == 0),
    )


def _tile(k: int, pd: int) -> int:
    """Lanes per grid step. The backward's live set scales with pd·kt (the
    x_res/x_new/d_xnew/d_xres tiles) plus 3 hidden stacks [8, HA, kt]: at
    pd=48/kt=2048 it measured 68.1 MiB of scoped VMEM — 4 MiB over the
    64 MiB grant — so wide states halve the tile (grid doubles; the
    per-invocation fixed cost amortizes over the batch·K work).
    Re-measured after BF16_RESIDUALS freed ~6 MiB of that live set (v5e
    2026-08-21, L96 K=8192 row): kt=2048 now compiles but runs SLOWER
    (151.6 vs 147.4 ms/step) — VMEM headroom, not grid count, is what the
    double-buffered streams want; the halved tile stands."""
    base = K_TILE if pd <= 16 else K_TILE // 2
    return min(k, base)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def trunk_call(static, x_res, eps, sm, sconst, wt1s, wtms, wt3s, w1s, wms, w3s):
    """static = (pd, n_mid, rng_dx). x_res [B, PD, K] (ones-channel row pd−1
    pinned, optional control rows dx:dx+Di), eps [B, Dx, K] unpadded — OR,
    with rng_dx set (cfg.smc.kernel_rng), the [1, 4] f32 (seed0, seed1, t,
    0) row: both kernels then draw this step's ε from the hardware PRNG
    per (b, ktile) tile instead of streaming it (the backward regenerates
    it exactly) — sm [B, PD, 128] packed per-step channels, sconst
    [PD, 128]; weights in both orientations (pallas_step.prepare).
    Returns (x_new [B, PD, K], alpha [B, K]).

    Gradient semantics: d/d eps = 0 (raw RNG); d/d x_res is the exact trunk
    transpose (the resample VJP outside scatters it through the ancestor
    choice); weight grads ride the w* inputs (wt* get zeros — both derive
    from one param tree, autodiff sums the paths)."""
    out, _ = _tr_fwd(static, x_res, eps, sm, sconst,
                     wt1s, wtms, wt3s, w1s, wms, w3s)
    return out


def _eps_spec(eps, rng_dx, kt):
    """BlockSpec for the eps slot: a K-tiled VMEM stream, or the SMEM
    seed row under in-kernel RNG."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if rng_dx is None:
        return pl.BlockSpec(
            (ROW_BLOCK, eps.shape[1], kt),
            lambda b, t: (b, 0, t),
            memory_space=pltpu.VMEM,
        )
    return pl.BlockSpec(
        (1, 4), lambda b, t: (0, 0), memory_space=pltpu.SMEM
    )


def _tr_fwd(static, x_res, eps, sm, sconst, wt1s, wtms, wt3s, w1s, wms, w3s):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    pd, n_mid, rng_dx = static
    batch, _, k = x_res.shape
    kt = _tile(k, pd)
    rb = ROW_BLOCK

    def vm(shape, imap):
        return pl.BlockSpec(shape, imap, memory_space=pltpu.VMEM)

    in_specs = [
        vm((rb, pd, kt), lambda b, t: (b, 0, t)),       # x_res
        _eps_spec(eps, rng_dx, kt),
        vm((rb, pd, _LANES), lambda b, t: (b, 0, 0)),   # sm
        vm(sconst.shape, lambda b, t: (0, 0)),
        vm(wt1s.shape, lambda b, t: (0, 0, 0)),
        vm(wtms.shape, lambda b, t: (0, 0, 0)),
        vm(wt3s.shape, lambda b, t: (0, 0, 0)),
    ]
    out_specs = [
        vm((rb, pd, kt), lambda b, t: (b, 0, t)),       # x_new
        vm((rb, kt), lambda b, t: (b, t)),              # alpha
    ]
    x_new, alpha = pl.pallas_call(
        functools.partial(_tr_fwd_kernel, n_mid, rng_dx),
        grid=(batch // rb, k // kt),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((batch, pd, k), jnp.float32),
            jax.ShapeDtypeStruct((batch, k), jnp.float32),
        ],
        compiler_params=_vmem_params(),
        interpret=_INTERPRET,
    )(x_res, eps, sm, sconst, wt1s, wtms, wt3s)
    # bf16 tiles want 16-row sublane multiples; narrow-state configs
    # (pd=8, e.g. dx=3 at K=8192) keep f32 residuals
    rdt = jnp.bfloat16 if BF16_RESIDUALS and pd % 16 == 0 else jnp.float32
    res = (
        x_res.astype(rdt), x_new.astype(rdt),
        eps, sm, sconst, wt1s, wtms, wt3s, w1s, wms, w3s,
    )
    return (x_new, alpha), res


def _tr_bwd(static, res, cots):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    pd, n_mid, rng_dx = static
    (x_res, x_new, eps, sm, sconst, wt1s, wtms, wt3s, w1s, wms, w3s) = res
    d_xnew, d_alpha = cots
    batch, _, k = x_res.shape
    ha = wt1s.shape[1]
    n_wm = wms.shape[0] // 3
    kt = _tile(k, pd)
    rb = ROW_BLOCK

    def vm(shape, imap):
        return pl.BlockSpec(shape, imap, memory_space=pltpu.VMEM)

    in_specs = [
        vm((rb, pd, kt), lambda b, t: (b, 0, t)),       # x_res
        vm((rb, pd, kt), lambda b, t: (b, 0, t)),       # x_new
        _eps_spec(eps, rng_dx, kt),
        vm((rb, pd, _LANES), lambda b, t: (b, 0, 0)),   # sm
        vm(sconst.shape, lambda b, t: (0, 0)),
        vm(wt1s.shape, lambda b, t: (0, 0, 0)),
        vm(wtms.shape, lambda b, t: (0, 0, 0)),
        vm(wt3s.shape, lambda b, t: (0, 0, 0)),
        vm(w1s.shape, lambda b, t: (0, 0, 0)),
        vm(wms.shape, lambda b, t: (0, 0, 0)),
        vm(w3s.shape, lambda b, t: (0, 0, 0)),
        vm((rb, pd, kt), lambda b, t: (b, 0, t)),       # d_xnew
        vm((rb, kt), lambda b, t: (b, t)),              # d_alpha
    ]
    out_specs = [
        vm((rb, pd, kt), lambda b, t: (b, 0, t)),       # d_xres
        vm((rb, pd, _LANES), lambda b, t: (b, 0, 0)),   # d_sm (resident/b)
        vm((pd, _LANES), lambda b, t: (0, 0)),
        vm((3, pd, ha), lambda b, t: (0, 0, 0)),
        vm((3 * n_wm, ha, ha), lambda b, t: (0, 0, 0)),
        vm((3, ha, pd), lambda b, t: (0, 0, 0)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((batch, pd, k), jnp.float32),
        jax.ShapeDtypeStruct((batch, pd, _LANES), jnp.float32),
        jax.ShapeDtypeStruct((pd, _LANES), jnp.float32),
        jax.ShapeDtypeStruct((3, pd, ha), jnp.float32),
        jax.ShapeDtypeStruct((3 * n_wm, ha, ha), jnp.float32),
        jax.ShapeDtypeStruct((3, ha, pd), jnp.float32),
    ]
    d_xres, d_sm, d_sconst, d_w1s, d_wms, d_w3s = pl.pallas_call(
        functools.partial(_tr_bwd_kernel, n_mid, rng_dx),
        grid=(batch // rb, k // kt),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=_vmem_params(),
        interpret=_INTERPRET,
    )(x_res, x_new, eps, sm, sconst, wt1s, wtms, wt3s, w1s, wms, w3s,
      d_xnew, d_alpha)

    zeros = jnp.zeros_like
    return (
        d_xres,
        zeros(eps),  # ε is raw RNG — no param dependence
        d_sm,
        d_sconst,
        zeros(wt1s), zeros(wtms), zeros(wt3s),
        d_w1s, d_wms, d_w3s,
    )


trunk_call.defvjp(_tr_fwd, _tr_bwd)

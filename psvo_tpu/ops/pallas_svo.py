"""Whole-sweep Pallas kernel for the SVO backward simulation.

The SVO backward pass (objectives._svo_backward — SURVEY.md §3.3: draw
x̃_t ~ q_b(·|x̃_{t+1}, y_t), accumulate log p and log q along the sampled
trajectory) was the LAST per-step-MLP scan in the system after round 3
fused the filtering scan and the FFBSi sweep. Measured share (v5e
2026-08-20, L63 K=256 preset): the sweep is 2.49 ms of the 6.68 ms SVO
step (37%) at M=16 and grows with M (5.35 ms at M=64) — it runs three
tiny MLPs per timestep on [B·M] rows, pure launch bound.

This module fuses the ENTIRE reverse sweep into ONE pallas_call per
direction, the same architecture as the filtering whole-scan kernels
(ops/pallas_step.py) and the FFBSi sweep (ops/pallas_ffbsi.py):

- grid (batch-blocks, T−1), time fastest-varying; forward streams step
  operands through REVERSED index maps (t = T−2 … 0), the VJP ascending;
- the trajectory carry x̃_{t+1} and the logp/logq accumulators live in
  VMEM scratch across grid steps;
- channel-major [R, C, M_pad] layout with M padded to 128 lanes — the
  SAME lane pad XLA applies to the [B, M, Dx] jnp path, so no new waste;
- the per-step math reuses the megakernel's machinery: ones-channel
  bias-folded trunks (pallas_step._trunk — see that module's docstring
  for the augmentation and the Mosaic operand-shape rules), recompute
  custom-VJP backward with pallas_step._trunk_bwd;
- the ε stream is the SAME bulk tensor the jnp path consumes
  (objectives._svo_backward eps_scan), so kernel and jnp paths are
  bit-comparable on values up to f32 ordering.

Per step (reverse time), with q_b/f/g diagonal-const-cov relu MLPs:

    mean_b = qb([x̃_{t+1}; y_t])            x̃_t = mean_b + s_b·ε_t
    logq  += max(−½Σ ε² + c_b, MIN)         (reparameterized density)
    logp  += max(−½Σ ((x̃_{t+1}−f(x̃_t))/s_f)² + c_f, MIN)
           + max(−½Σ ((y_t −g(x̃_t))/s_g)² + c_g, MIN)

with c_* the per-step scale/2π constants (param-dependent — streamed via
the sconst operand so their gradients flow) and MIN the density floor
(distributions._MIN_LOGP), matching the jnp path term by term. Anchor
terms (emission + ρ_T at x̃_T) and the prior at x̃_0 stay outside — they
are single bulk calls, not scans.

Eligibility (`usable`): qb/f/g const-diag relu MLPs with one uniform
hidden width % 8 (the megakernel's network class), gaussian diag
emission, no known-dynamics/tril/qb_rnn, max(dx+di, dy) ≤ 7, B % 8 == 0,
M ≥ MIN_M (measured crossover — see its comment) and M ≤ 128 or
M % 128 == 0, no mesh. Everything else falls back to the lax.scan body
in objectives.py.

MEASURED OUTCOME (v5e 2026-08-20): the fused sweep is flat in M
(~7.7 ms/step at the L63 K=256 preset shapes, rb=16) because everything
pads to 128 lanes; the scan body scales with M. Fused loses at M=16
(the BASELINE preset — kept on the scan path by MIN_M), ties at M=32,
wins −19% at M=64 and more beyond. On-device correctness: loss to 8
significant digits, gradient cosine 1.000000 against the scan body with
identical streams.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from psvo_tpu.distributions import _MIN_LOGP
from psvo_tpu.ops.pallas_resample import ROW_BLOCK, _on_tpu, _round_up, _vmem_params
from psvo_tpu.ops.pallas_step import (
    _LANES,
    _bias_grad8,
    _col3,
    _lane_sum,
    _pad_sub,
    _trunk,
    _trunk_bwd,
    aug_net,
)

_INTERPRET = False  # flipped by tests to run on CPU

ENABLE = True

# Measured eligibility floor (v5e 2026-08-20, L63 K=256 B=32 T=100, rb=16):
# the fused sweep's cost is flat in M (everything pads to 128 lanes) at
# ~7.7 ms/step while the scan body scales with M — scan wins at M=16
# (6.67 vs 7.76), M=32 is a wash (7.73 vs 7.68), fused wins at M=64
# (9.56 vs 7.71, −19%) and grows from there. Below the crossover the
# lax.scan body stays the right path. Tests lower this to exercise the
# kernel at tiny M in interpret mode.
MIN_M = 32

# sconst lane offsets ([PD, 8]-wide stores must not overlap)
SC_SFI, SC_SGI, SC_SB, SC_OC = 0, 8, 16, 24
# sm stream lane channels: the per-step density constants c_f/c_g/c_b ride
# ROW 0 of their own lanes (the pack_sm SM_AB pattern — a direct
# sconst-scalar + [R, M] add needs a both-axes broadcast Mosaic does not
# implement, "Broadcast in both sublanes and lanes", v5e 2026-08-20; the
# sublane-sum read `Σ_rows sm[:, :, lane]` → [R, 1] lowers and is proven
# on device). Their cotangents return through a d_sm stream so the
# param-dependence of the constants autodiffs correctly outside.
SM_Y, SM_U, SM_CF, SM_CG, SM_CB = 0, 1, 2, 3, 4


def usable(ssm, batch: int, m: int) -> bool:
    """Static eligibility of the fused SVO sweep for this (ssm, shapes)."""
    from psvo_tpu.parallel.context import get_mesh

    if not (ENABLE and ssm.use_pallas_step and (_on_tpu() or _INTERPRET)):
        return False
    if get_mesh() is not None:
        return False
    if ssm.qb_rnn or ssm.transition_known:
        return False
    if ssm.emission in ("poisson", "dirac"):
        return False
    if ssm.f_tril or ssm.g_tril:
        return False
    if batch % ROW_BLOCK:
        return False
    if m < MIN_M or (m > _LANES and m % _LANES):
        return False
    if max(ssm.dx + ssm.di, ssm.dy) > 7:
        return False
    if ssm.dx + ssm.dy > 7:
        # the qb input [x; y; ones] must fit ONE 8-sublane tile: the shared
        # _trunk_bwd corners contraction assumes input and output row
        # counts match (PDQ == PDO == 8)
        return False
    nets = [ssm.nets[n] for n in ("qb", "f", "g")]
    hidden = nets[0].hidden
    if len(hidden) < 1 or any(h != hidden[0] for h in hidden):
        return False
    if hidden[0] % 8:
        return False
    for nc in nets:
        if nc.hidden != hidden or nc.cov_type != "const":
            return False
        if nc.activation != "relu":
            return False
    return True


def _rb(batch: int) -> int:
    """Batch rows per grid invocation. rb=16 halves the per-invocation
    fixed cost that dominates this tiny-tensor kernel (the megakernel's
    rb lesson, pallas_step._row_block): measured at rb=8 the fused sweep
    was SLOWER than the scan body at M=16 (8.24 vs 6.69 ms/step — 396
    invocations of ~µs work); VMEM is no constraint here ([16, 72, 128]
    blocks ≈ 0.6 MB)."""
    return 16 if batch % 16 == 0 else ROW_BLOCK


def _stream_spec(shape, imap_t, rb):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = len(shape)
    return pl.BlockSpec(
        (1, rb, *shape[2:]),
        lambda b, t, _n=n, _f=imap_t: (_f(t), b) + (0,) * (_n - 2),
        memory_space=pltpu.VMEM,
    )


def _resident_spec(shape, rb, rows=True):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = len(shape)
    if rows:
        return pl.BlockSpec(
            (rb, *shape[1:]),
            lambda b, t, _n=n: (b,) + (0,) * (_n - 1),
            memory_space=pltpu.VMEM,
        )
    return pl.BlockSpec(
        shape, lambda b, t, _n=n: (0,) * _n, memory_space=pltpu.VMEM
    )


def _sm_scalar(sm0, lane: int):
    """[R, 1] per-row scalar from row 0 of an sm lane (rows > 0 are zero):
    the proven sublane-sum read pattern (pallas_step absc)."""
    return jnp.sum(sm0[:, :, lane : lane + 1], axis=1)


def _qin(xq, y3, dx: int, dy: int, pdq: int, mp: int):
    """Assemble the qb trunk input [R, PDQ, MP]: rows [x̃_{t+1} | y_t | pad |
    ones]. y broadcasts over the M lanes (constant per trajectory)."""
    r = xq.shape[0]
    parts = [
        xq[:, :dx, :],
        jnp.broadcast_to(y3[:, :dy, :], (r, dy, mp)),
    ]
    pad = pdq - dx - dy - 1
    if pad:
        parts.append(jnp.zeros((r, pad, mp), jnp.float32))
    parts.append(jnp.ones((r, 1, mp), jnp.float32))
    return jnp.concatenate(parts, axis=-2)


def _step_terms(z_f, z_g, eps_p, cf, cg, cb):
    """Per-step floored density terms, matching the jnp path term by term.
    Returns (lp_t [R, M], lq_t [R, M], and the three floor masks)."""
    sf2 = -0.5 * jnp.sum(z_f * z_f, axis=-2) + cf
    sg2 = -0.5 * jnp.sum(z_g * z_g, axis=-2) + cg
    se2 = -0.5 * jnp.sum(eps_p * eps_p, axis=-2) + cb
    fl_f, fl_g, fl_b = sf2 < _MIN_LOGP, sg2 < _MIN_LOGP, se2 < _MIN_LOGP
    lp_t = jnp.maximum(sf2, _MIN_LOGP) + jnp.maximum(sg2, _MIN_LOGP)
    lq_t = jnp.maximum(se2, _MIN_LOGP)
    return lp_t, lq_t, fl_f, fl_g, fl_b


def _fwd_kernel(
    dims, t_len,
    xanchor_ref, eps_ref, sm_ref, sconst_ref,
    wt1q_ref, wtmq_ref, wt3q_ref, wt1f_ref, wtmf_ref, wt3f_ref,
    wt1g_ref, wtmg_ref, wt3g_ref,
    xtilde_ref, xfirst_ref, lp_ref, lq_ref,
    xq, lp_c, lq_c,
):
    from jax.experimental import pallas as pl

    dx, dy, di, pdq, n_mid = dims
    t = pl.program_id(1)
    mp = xq.shape[-1]

    @pl.when(t == 0)
    def _():
        xq[:] = xanchor_ref[:]
        lp_c[:] = jnp.zeros_like(lp_c)
        lq_c[:] = jnp.zeros_like(lq_c)

    def net(w1, wm, w3):
        return (w1[:], [wm[j] for j in range(n_mid)], w3[:])

    sm0 = sm_ref[0]
    y3 = sm0[:, :, SM_Y : SM_Y + 1]  # rows 0:dy = y_t
    u3 = sm0[:, :, SM_U : SM_U + 1]  # rows dx:dx+di = u_{t+1}
    sfi3 = _col3(sconst_ref[:], SC_SFI)
    sgi3 = _col3(sconst_ref[:], SC_SGI)
    sb3 = _col3(sconst_ref[:], SC_SB)
    oc3 = _col3(sconst_ref[:], SC_OC)  # ones-channel row regenerator
    cf = _sm_scalar(sm0, SM_CF)
    cg = _sm_scalar(sm0, SM_CG)
    cb = _sm_scalar(sm0, SM_CB)

    q_in = _qin(xq[:], y3, dx, dy, pdq, mp)
    m_b, _ = _trunk(q_in, *net(wt1q_ref, wtmq_ref, wt3q_ref))
    eps_p = _pad_sub(eps_ref[0], xq.shape[1])
    x_t = m_b + sb3 * eps_p + oc3  # rows ≥ dx: m_b/sb/eps zero, OC row = 1

    f_in = x_t + u3  # u rides rows dx:dx+di (zero in x_t there)
    m_f, _ = _trunk(f_in, *net(wt1f_ref, wtmf_ref, wt3f_ref))
    m_g, _ = _trunk(x_t, *net(wt1g_ref, wtmg_ref, wt3g_ref))
    z_f = (xq[:] - m_f) * sfi3
    z_g = (y3 - m_g) * sgi3
    lp_t, lq_t, *_ = _step_terms(z_f, z_g, eps_p, cf, cg, cb)

    lp_c[:] += lp_t
    lq_c[:] += lq_t
    xq[:] = x_t
    xtilde_ref[:] = x_t[None]

    @pl.when(t == t_len - 1)
    def _():
        xfirst_ref[:] = x_t
        lp_ref[:] = lp_c[:]
        lq_ref[:] = lq_c[:]


def _bwd_kernel(
    dims, t_len,
    # streamed residuals (time-ASCENDING maps) + resident anchor
    xanchor_ref, eps_ref, sm_ref, sconst_ref,
    wt1q_ref, wtmq_ref, wt3q_ref, wt1f_ref, wtmf_ref, wt3f_ref,
    wt1g_ref, wtmg_ref, wt3g_ref,
    w1q_ref, wmq_ref, w3q_ref, w1f_ref, wmf_ref, w3f_ref,
    w1g_ref, wmg_ref, w3g_ref,
    xt_ref, xnext_ref,  # x̃_t and x̃_{t+1} (clamped; anchor selected at last)
    # cotangents
    dxt_s_ref, dxfirst_ref, dlp_ref, dlq_ref,
    # outputs
    dxanchor_ref, dsm_ref, dsconst_ref,
    dw1q_ref, dwmq_ref, dw3q_ref, dw1f_ref, dwmf_ref, dw3f_ref,
    dw1g_ref, dwmg_ref, dw3g_ref,
    # scratch
    dq_c,
):
    from jax.experimental import pallas as pl

    dx, dy, di, pdq, n_mid = dims
    b, s = pl.program_id(0), pl.program_id(1)  # time t = s, ascending
    last = s == t_len - 1
    pdo = dq_c.shape[1]
    mp = dq_c.shape[-1]

    def net(w1, wm, w3):
        return (w1[:], [wm[j] for j in range(n_mid)], w3[:])

    sm0 = sm_ref[0]
    y3 = sm0[:, :, SM_Y : SM_Y + 1]
    u3 = sm0[:, :, SM_U : SM_U + 1]
    sfi3 = _col3(sconst_ref[:], SC_SFI)
    sgi3 = _col3(sconst_ref[:], SC_SGI)
    cf = _sm_scalar(sm0, SM_CF)
    cg = _sm_scalar(sm0, SM_CG)
    cb = _sm_scalar(sm0, SM_CB)

    x_next = jnp.where(last, xanchor_ref[:], xnext_ref[0])
    x_t = xt_ref[0]
    eps_p = _pad_sub(eps_ref[0], pdo)

    # ---- recompute the step (activations kept for the backprop)
    q_in = _qin(x_next, y3, dx, dy, pdq, mp)
    m_b, hs_b = _trunk(q_in, *net(wt1q_ref, wtmq_ref, wt3q_ref))
    f_in = x_t + u3
    m_f, hs_f = _trunk(f_in, *net(wt1f_ref, wtmf_ref, wt3f_ref))
    m_g, hs_g = _trunk(x_t, *net(wt1g_ref, wtmg_ref, wt3g_ref))
    z_f = (x_next - m_f) * sfi3
    z_g = (y3 - m_g) * sgi3
    _, _, fl_f, fl_g, fl_b = _step_terms(z_f, z_g, eps_p, cf, cg, cb)

    # ---- density-term cotangents (lp/lq outputs are plain sums over t)
    d_lp_f = jnp.where(fl_f, 0.0, dlp_ref[:])  # [R, M]
    d_lp_g = jnp.where(fl_g, 0.0, dlp_ref[:])
    d_lq_b = jnp.where(fl_b, 0.0, dlq_ref[:])
    d_zf = -d_lp_f[:, None, :] * z_f
    d_zg = -d_lp_g[:, None, :] * z_g
    d_mf = -d_zf * sfi3
    d_mg = -d_zg * sgi3
    d_xnext_zf = d_zf * sfi3

    # ---- f / g trunk backprops → their x_t contributions
    d_fx, dw1f, dwmf, dw3f = _trunk_bwd(
        f_in, hs_f, d_mf, *net(w1f_ref, wmf_ref, w3f_ref)
    )
    d_gx, dw1g, dwmg, dw3g = _trunk_bwd(
        x_t, hs_g, d_mg, *net(w1g_ref, wmg_ref, w3g_ref)
    )
    # rows ≥ dx of d_fx land on u/ones/pad constants — mask them out
    row = jax.lax.broadcasted_iota(jnp.int32, d_fx.shape, 1)
    live = row < dx
    d_xt = (
        dxt_s_ref[0]
        + jnp.where(s == 0, dxfirst_ref[:], dq_c[:])
        + jnp.where(live, d_fx, 0.0)
        + jnp.where(live, d_gx, 0.0)
    )

    # ---- draw: x_t = m_b + s_b·ε + oc
    d_sb = _bias_grad8(d_xt * eps_p)  # [PDO, 8]
    d_qin, dw1q, dwmq, dw3q = _trunk_bwd(
        q_in, hs_b, d_xt, *net(w1q_ref, wmq_ref, w3q_ref)
    )
    rowq = jax.lax.broadcasted_iota(jnp.int32, d_qin.shape, 1)
    d_xnext_qb = jnp.where(rowq < dx, d_qin, 0.0)[:, :pdo, :]
    # pdq ≥ pdo always? pdq = round8(dx+dy+1) ≥ 8 = pdo when dx,dy ≤ 7
    dq_new = d_xnext_zf + d_xnext_qb
    dq_c[:] = dq_new

    @pl.when(last)
    def _():
        dxanchor_ref[:] = dq_new

    # ---- scale / constant grads, accumulated across the whole grid
    @pl.when((b == 0) & (s == 0))
    def _():
        dsconst_ref[:] = jnp.zeros_like(dsconst_ref)
        for ref in (dw1q_ref, dwmq_ref, dw3q_ref, dw1f_ref, dwmf_ref,
                    dw3f_ref, dw1g_ref, dwmg_ref, dw3g_ref):
            ref[:] = jnp.zeros_like(ref)

    dsconst_ref[:, SC_SFI : SC_SFI + 8] += _bias_grad8(d_zf * (x_next - m_f))
    dsconst_ref[:, SC_SGI : SC_SGI + 8] += _bias_grad8(d_zg * (y3 - m_g))
    dsconst_ref[:, SC_SB : SC_SB + 8] += d_sb

    # per-step sm cotangents: the c_f/c_g/c_b constants are param-dependent
    # (scale log-sums) — their grads return through the d_sm stream (row 0
    # of their lanes; y/u lanes stay zero — data)
    dsm_ref[:] = jnp.zeros_like(dsm_ref)
    dsm_ref[:, :, 0:1, SM_CF : SM_CF + 1] = _lane_sum(d_lp_f[:, None, :])[None]
    dsm_ref[:, :, 0:1, SM_CG : SM_CG + 1] = _lane_sum(d_lp_g[:, None, :])[None]
    dsm_ref[:, :, 0:1, SM_CB : SM_CB + 1] = _lane_sum(d_lq_b[:, None, :])[None]

    dw1q_ref[:] += dw1q
    dw3q_ref[:] += dw3q
    dw1f_ref[:] += dw1f
    dw3f_ref[:] += dw3f
    dw1g_ref[:] += dw1g
    dw3g_ref[:] += dw3g
    for j in range(n_mid):
        dwmq_ref[j] += dwmq[j]
        dwmf_ref[j] += dwmf[j]
        dwmg_ref[j] += dwmg[j]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def svo_scan(static, xanchor, eps, sm, sconst, wq, wf, wg):
    """static = (dx, dy, di, pdq, n_mid). xanchor [B, PDO, MP] (ones row
    pinned), eps [T-1, B, dx, MP] (reverse-time order follows the streams'
    natural [t] index — index maps reverse it), sm [T-1, B, 8, 128]
    (lane 0 rows 0:dy = y_t; lane 1 rows dx:dx+di = u_{t+1}), sconst
    [8, 128] (see SC_* lanes). w* = (wt1, wtms, wt3, w1, wms, w3) per net,
    augmented/transposed by `prepare`.

    Returns (x_first [B, PDO, MP], lp [B, MP], lq [B, MP],
    xtilde [T-1, B, PDO, MP] in time-ascending order)."""
    out, _ = _scan_fwd(static, xanchor, eps, sm, sconst, wq, wf, wg)
    return out


def _scan_fwd(static, xanchor, eps, sm, sconst, wq, wf, wg):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dx, dy, di, pdq, n_mid = static
    t_len, batch = eps.shape[0], eps.shape[1]
    pdo, mp = xanchor.shape[1], xanchor.shape[2]
    rb = _rb(batch)
    rev = lambda t: t_len - 1 - t

    in_specs = [
        _resident_spec(xanchor.shape, rb),
        _stream_spec(eps.shape, rev, rb),
        _stream_spec(sm.shape, rev, rb),
        _resident_spec(sconst.shape, rb, rows=False),
    ]
    operands = [xanchor, eps, sm, sconst]
    for w in (wq, wf, wg):
        for t in w[:3]:  # forward needs the transposed orientation only
            in_specs.append(_resident_spec(t.shape, rb, rows=False))
            operands.append(t)
    out_specs = [
        _stream_spec((t_len, batch, pdo, mp), rev, rb),   # xtilde
        _resident_spec((batch, pdo, mp), rb),             # x_first
        _resident_spec((batch, mp), rb),                  # lp
        _resident_spec((batch, mp), rb),                  # lq
    ]
    out_shape = [
        jax.ShapeDtypeStruct((t_len, batch, pdo, mp), jnp.float32),
        jax.ShapeDtypeStruct((batch, pdo, mp), jnp.float32),
        jax.ShapeDtypeStruct((batch, mp), jnp.float32),
        jax.ShapeDtypeStruct((batch, mp), jnp.float32),
    ]
    xtilde, x_first, lp, lq = pl.pallas_call(
        functools.partial(_fwd_kernel, (dx, dy, di, pdq, n_mid), t_len),
        grid=(batch // rb, t_len),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((rb, pdo, mp), jnp.float32),
            pltpu.VMEM((rb, mp), jnp.float32),
            pltpu.VMEM((rb, mp), jnp.float32),
        ],
        compiler_params=_vmem_params(),
        interpret=_INTERPRET,
    )(*operands)
    res = (xanchor, eps, sm, sconst, wq, wf, wg, xtilde)
    return (x_first, lp, lq, xtilde), res


def _scan_bwd(static, res, cots):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dx, dy, di, pdq, n_mid = static
    xanchor, eps, sm, sconst, wq, wf, wg, xtilde = res
    d_xfirst, d_lp, d_lq, d_xt_s = cots
    t_len, batch = eps.shape[0], eps.shape[1]
    pdo, mp = xanchor.shape[1], xanchor.shape[2]
    rb = _rb(batch)
    fwd_t = lambda t: t
    # grid step s handles time t = s; its query x̃_{t+1} sits at stream
    # index t+1 in the time-ascending xtilde (clamped; anchor used at last)
    nxt = lambda t: jnp.minimum(t + 1, t_len - 1)

    in_specs = [
        _resident_spec(xanchor.shape, rb),
        _stream_spec(eps.shape, fwd_t, rb),
        _stream_spec(sm.shape, fwd_t, rb),
        _resident_spec(sconst.shape, rb, rows=False),
    ]
    operands = [xanchor, eps, sm, sconst]
    # kernel signature order: ALL transposed orientations first, then all
    # untransposed (wt1q..wt3g, w1q..w3g)
    for sel in (slice(0, 3), slice(3, 6)):
        for w in (wq, wf, wg):
            for t in w[sel]:
                in_specs.append(_resident_spec(t.shape, rb, rows=False))
                operands.append(t)
    in_specs += [
        _stream_spec(xtilde.shape, fwd_t, rb),   # x̃_t
        _stream_spec(xtilde.shape, nxt, rb),     # x̃_{t+1}
        _stream_spec(d_xt_s.shape, fwd_t, rb),
        _resident_spec(d_xfirst.shape, rb),
        _resident_spec(d_lp.shape, rb),
        _resident_spec(d_lq.shape, rb),
    ]
    operands += [xtilde, xtilde, d_xt_s, d_xfirst, d_lp, d_lq]

    def shapes_of(w):
        return [w[3].shape, w[4].shape, w[5].shape]  # w1, wms, w3

    out_specs = [
        _resident_spec((batch, pdo, mp), rb),          # d xanchor
        _stream_spec(sm.shape, fwd_t, rb),             # d sm (constants')
        _resident_spec((8, _LANES), rb, rows=False),   # d sconst
    ]
    out_shape = [
        jax.ShapeDtypeStruct((batch, pdo, mp), jnp.float32),
        jax.ShapeDtypeStruct(sm.shape, jnp.float32),
        jax.ShapeDtypeStruct((8, _LANES), jnp.float32),
    ]
    for w in (wq, wf, wg):
        for sh in shapes_of(w):
            out_specs.append(_resident_spec(sh, rb, rows=False))
            out_shape.append(jax.ShapeDtypeStruct(sh, jnp.float32))

    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, (dx, dy, di, pdq, n_mid), t_len),
        grid=(batch // rb, t_len),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((rb, pdo, mp), jnp.float32)],
        compiler_params=_vmem_params(),
        interpret=_INTERPRET,
    )(*operands)
    d_xanchor, d_sm, d_sconst = outs[0], outs[1], outs[2]
    dws = outs[3:]
    zeros = jnp.zeros_like

    def wgrads(i, w):
        dw1, dwm, dw3 = dws[3 * i], dws[3 * i + 1], dws[3 * i + 2]
        # grads ride the untransposed w* slots; the wt* transposes get
        # zeros (both derive from one param tree outside — autodiff sums)
        return (zeros(w[0]), zeros(w[1]), zeros(w[2]), dw1, dwm, dw3)

    return (
        d_xanchor,
        zeros(eps),  # ε is raw RNG — no param dependence
        d_sm,        # only the c_f/c_g/c_b lanes carry grads; y/u are data
        d_sconst,
        wgrads(0, wq),
        wgrads(1, wf),
        wgrads(2, wg),
    )


svo_scan.defvjp(_scan_fwd, _scan_bwd)


# ---------------------------------------------------------------------------
# Public entry: pack/augment once per call (outside the sweep)
# ---------------------------------------------------------------------------


def run_svo_sweep(ssm, params, ys_tm, ctrl_tm, eps_scan, x_anchor, m: int):
    """Fused backward sweep. ys_tm [T, B, Dy]; ctrl_tm [T, B, Di];
    eps_scan [T-1, B, M, Dx] (the jnp path's bulk stream); x_anchor
    [B, M, Dx]. Returns (x_first [B, M, Dx], lp [B, M], lq [B, M],
    x_tilde [T-1, B, M, Dx] time-ascending) — the in-sweep log-density
    sums only; anchor/ρ_T/prior terms add outside, exactly like the
    FFBSi kernel's contract."""
    from psvo_tpu import networks

    dx, dy, di = ssm.dx, ssm.dy, ssm.di
    t_len, batch = eps_scan.shape[0], eps_scan.shape[1]
    hidden = ssm.nets["qb"].hidden
    n_mid = len(hidden) - 1
    pdo = 8
    pdq = _round_up(dx + dy + 1, 8)
    mp = _round_up(max(m, _LANES), _LANES)

    def lanes(a, fill=0.0):  # [..., M] -> [..., MP]
        pad = mp - a.shape[-1]
        if not pad:
            return a
        cfg = [(0, 0)] * (a.ndim - 1) + [(0, pad)]
        return jnp.pad(a, cfg, constant_values=fill)

    # channel-major + ones-channel anchor
    xa = jnp.swapaxes(x_anchor, -1, -2)  # [B, Dx, M]
    xa = jnp.pad(xa, ((0, 0), (0, pdo - dx), (0, 0)))
    xa = xa.at[:, pdo - 1, :].set(1.0)
    xa = lanes(xa)

    eps_cm = lanes(jnp.swapaxes(eps_scan, -1, -2))  # [T-1, B, Dx, MP]

    s_f = networks.scale_from_raw(params["f"]["raw_scale"], ssm.nets["f"].sigma_min)
    s_g = networks.scale_from_raw(params["g"]["raw_scale"], ssm.nets["g"].sigma_min)
    s_b = networks.scale_from_raw(params["qb"]["raw_scale"], ssm.nets["qb"].sigma_min)
    h2pi = 0.5 * math.log(2.0 * math.pi)

    # per-step packed vectors: lane SM_Y = y_t rows 0:dy; lane SM_U =
    # u_{t+1} at rows dx:dx+di; lanes SM_CF/CG/CB row 0 = the density
    # constants (param-dependent — their stream cotangents return via d_sm)
    sm = jnp.zeros((t_len, batch, pdo, _LANES), jnp.float32)
    sm = sm.at[:, :, :dy, SM_Y].set(ys_tm[:-1])
    if di:
        sm = sm.at[:, :, dx : dx + di, SM_U].set(ctrl_tm[1:])
    sm = sm.at[:, :, 0, SM_CF].set(-jnp.sum(jnp.log(s_f)) - dx * h2pi)
    sm = sm.at[:, :, 0, SM_CG].set(-jnp.sum(jnp.log(s_g)) - dy * h2pi)
    sm = sm.at[:, :, 0, SM_CB].set(-jnp.sum(jnp.log(s_b)) - dx * h2pi)

    sconst = jnp.zeros((pdo, _LANES), jnp.float32)
    sconst = sconst.at[:dx, SC_SFI].set(1.0 / s_f)
    sconst = sconst.at[:dy, SC_SGI].set(1.0 / s_g)
    sconst = sconst.at[:dx, SC_SB].set(s_b)
    sconst = sconst.at[pdo - 1, SC_OC].set(1.0)

    # shared ones-channel augmentation (pallas_step.aug_net), per net —
    # q_b/f/g have different input widths, each rounded to its own tile
    wq = aug_net(params["qb"], hidden, _round_up(dx + dy + 1, 8), pdo)
    wf = aug_net(params["f"], hidden, _round_up(dx + di + 1, 8), pdo)
    wg = aug_net(params["g"], hidden, _round_up(dx + 1, 8), pdo)

    x_first, lp, lq, xtilde = svo_scan(
        (dx, dy, di, pdq, n_mid), xa, eps_cm, sm, sconst, wq, wf, wg
    )
    x_first = jnp.swapaxes(x_first[:, :dx, :m], -1, -2)  # [B, M, Dx]
    x_tilde = jnp.swapaxes(xtilde[:, :, :dx, :m], -1, -2)  # [T-1, B, M, Dx]
    return x_first, lp[:, :m], lq[:, :m], x_tilde

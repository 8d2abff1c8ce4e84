"""Whole-sweep Pallas kernel for the FFBSi backward simulation (PSVO).

After the round-3 hoists the FFBSi reverse scan body is MLP-free: two MXU
contractions (the pairwise Mahalanobis expansion against precomputed
support-side terms), a Gumbel-argmax categorical draw, one-hot selections,
and the support gather. That is ~12 small XLA fusions per step forward and
~15 backward — launch-bound, like the filtering scan was before its
whole-scan fusion (ops/pallas_step.py). This module fuses the ENTIRE
reverse sweep into ONE pallas_call per direction, same architecture as the
filtering whole-scan kernels:

- grid (batch-blocks, T−1) with the time axis fastest-varying; the forward
  sweep streams step operands through REVERSED index maps (t = T−2 … 0),
  the VJP through ascending ones;
- the backward-trajectory carry x̃ lives in VMEM scratch across grid steps,
  as do the logp/logq accumulators; the VJP carries the query cotangent
  d x̃_{t+1} in scratch exactly where lax.scan's VJP carried it;
- the categorical draw consumes the SAME pre-generated Gumbel stream as the
  jnp path (objectives._gumbel_from_keys), so kernel and jnp paths are
  bit-comparable;
- the VJP recomputes the step (logits, argmax, one-hots, softmax) from the
  streamed residuals — nothing but the trajectories is saved.

Gradient semantics mirror the jnp path: the discrete ancestor index is
stop-grad (d gum = 0); cotangents flow to the support-side terms (r, mr,
c), the normalized weights, the bulk emission densities, and the support
particles (through the one-hot gather transpose), all of which backprop
further through their bulk precomputations OUTSIDE this op.

Eligibility (`usable`): diagonal transitions (the support terms carry the
r/mr/c form), K % 128 == 0, K ≤ 2048, B % 8 == 0, M % 8 == 0. Everything
else falls back to the lax.scan body in objectives.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from psvo_tpu.distributions import _MIN_LOGP
from psvo_tpu.ops.pallas_resample import ROW_BLOCK, _on_tpu, _round_up

_INTERPRET = False  # flipped by tests to run on CPU

ENABLE = True
MAX_K = 2048


def usable(ssm, k: int, batch: int, m: int) -> bool:
    from psvo_tpu.parallel.context import get_mesh

    return (
        ENABLE
        and (_on_tpu() or _INTERPRET)
        and get_mesh() is None  # GSPMD cannot partition the custom call
        and not (ssm.f_tril or ssm.f_tril_head)
        and k % 128 == 0
        and k <= MAX_K
        and batch % ROW_BLOCK == 0
        and m % 8 == 0
    )


def _lane_sum(x):
    ones = jnp.ones((x.shape[-1], 1), jnp.float32)
    return jax.lax.dot_general(
        x, ones,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )[..., 0]


def _dot_qk(lhs_mk, rhs_dk):
    """[R, M, K] × [R, D, K] -> [R, M, D]: contraction over the lane axis."""
    return jax.lax.dot_general(
        lhs_mk, rhs_dk,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )


def _dot_md(lhs_md, rhs_dk):
    """[R, M, D] × [R, D, K] -> [R, M, K]: lhs-lane (D) contraction."""
    return jax.lax.dot_general(
        lhs_md, rhs_dk,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )


def _step_fwd_math(k, q, r, mr, c, lwn, gum):
    """Shared forward recompute: logits, one-hot selection, lse pieces."""
    t1 = _dot_md(q * q, r)  # [R, M, K]
    t2 = _dot_md(q, mr)
    pair_raw = -0.5 * t1 + t2 + c[:, None, :]
    pair = jnp.maximum(pair_raw, _MIN_LOGP)
    logits = pair + lwn[:, None, :]
    v = logits + gum
    mx = jnp.max(v, axis=-1, keepdims=True)
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, k), 2)
    # first-max tie-break, matching jnp.argmax
    idx = jnp.min(jnp.where(v == mx, iota, k), axis=-1)  # [R, M]
    oh = (iota == idx[:, :, None]).astype(jnp.float32)  # [R, M, K]
    mxl = jnp.max(logits, axis=-1, keepdims=True)
    w = jnp.exp(logits - mxl)
    sw = _lane_sum(w)  # [R, M]
    return pair_raw, pair, logits, oh, w, sw, mxl


def _fwd_kernel(
    k, t_len,
    xanchor_ref, xs_ref, r_ref, mr_ref, c_ref, lwn_ref, lg_ref, gum_ref,
    xtilde_ref, xfirst_ref, logp_ref, logq_ref,
    xq, lp, lq,
):
    from jax.experimental import pallas as pl

    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        xq[:] = xanchor_ref[:]
        lp[:] = jnp.zeros_like(lp)
        lq[:] = jnp.zeros_like(lq)

    q = xq[:]  # [R, M, DP] — the query x̃_{t+1}
    pair_raw, pair, logits, oh, w, sw, mxl = _step_fwd_math(
        k, q, r_ref[0], mr_ref[0], c_ref[0], lwn_ref[0], gum_ref[0]
    )
    pair_sel = _lane_sum(oh * pair)  # [R, M]
    lwn_sel = _lane_sum(oh * lwn_ref[0][:, None, :])
    lg_sel = _lane_sum(oh * lg_ref[0][:, None, :])
    lse = jnp.log(sw) + mxl[..., 0]
    x_t = _dot_qk(oh, xs_ref[0])  # [R, M, DP] one-hot support gather

    lq[:] += pair_sel + lwn_sel - lse
    lp[:] += pair_sel + lg_sel
    xq[:] = x_t
    xtilde_ref[:] = x_t[None]

    @pl.when(t == t_len - 1)
    def _():
        xfirst_ref[:] = x_t
        logp_ref[:] = lp[:]
        logq_ref[:] = lq[:]


def _bwd_kernel(
    k, t_len,
    # streamed residuals (time-ASCENDING maps) + resident anchor
    xanchor_ref, xs_ref, r_ref, mr_ref, c_ref, lwn_ref, lg_ref, gum_ref,
    xtilde_next_ref,  # x̃_{t+1} (the step's query), clamped map; anchor at the end
    # cotangents
    dxt_ref, dxfirst_ref, dlogp_ref, dlogq_ref,
    # outputs
    dxanchor_ref, dxs_ref, dr_ref, dmr_ref, dc_ref, dlwn_ref, dlg_ref,
    # scratch
    dq_c,
):
    from jax.experimental import pallas as pl

    s = pl.program_id(1)  # time t = s, ascending
    last = s == t_len - 1

    q = jnp.where(last, xanchor_ref[:], xtilde_next_ref[0])  # [R, M, DP]
    r, mr, c = r_ref[0], mr_ref[0], c_ref[0]
    lwn, lg, gum = lwn_ref[0], lg_ref[0], gum_ref[0]
    pair_raw, pair, logits, oh, w, sw, mxl = _step_fwd_math(
        k, q, r, mr, c, lwn, gum
    )
    soft = w / sw[:, :, None]  # softmax(logits) [R, M, K]

    gp = dlogp_ref[:]  # [R, M] — constant across steps (the sums' cotangent)
    gq = dlogq_ref[:]

    # selections: logq += pair_sel + lwn_sel − lse; logp += pair_sel + lg_sel
    gsum = (gp + gq)[:, :, None]
    d_pair = oh * gsum - soft * gq[:, :, None]  # [R, M, K]
    d_pair = jnp.where(pair_raw < _MIN_LOGP, 0.0, d_pair)  # floor cut
    d_lwn = jnp.sum(oh * gq[:, :, None] - soft * gq[:, :, None], axis=1)
    d_lg = jnp.sum(oh * gp[:, :, None], axis=1)  # [R, K]

    # pair = −0.5·Σ_d q²r + Σ_d q·mr + c
    d_c = jnp.sum(d_pair, axis=1)  # [R, K]
    d_q = _dot_qk(d_pair, mr) - q * _dot_qk(d_pair, r)  # [R, M, DP]
    qT = jnp.swapaxes(q, 1, 2)  # [R, DP, M]
    d_mr = jax.lax.dot_general(  # [R, DP, K]
        qT, d_pair,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    d_r = -0.5 * jax.lax.dot_general(
        jnp.swapaxes(q * q, 1, 2), d_pair,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )

    # x_t = oh @ xsᵀ: cotangent of this step's OUTPUT trajectory point
    d_xt = dxt_ref[0] + jnp.where(s == 0, dxfirst_ref[:], dq_c[:])
    dxs_ref[:] = jax.lax.dot_general(  # [R, DP, K]
        jnp.swapaxes(d_xt, 1, 2), oh,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )[None]

    dr_ref[:] = d_r[None]
    dmr_ref[:] = d_mr[None]
    dc_ref[:] = d_c[None]
    dlwn_ref[:] = d_lwn[None]
    dlg_ref[:] = d_lg[None]
    dq_c[:] = d_q  # feeds step t+1's output cotangent

    @pl.when(last)
    def _():
        dxanchor_ref[:] = d_q


def _stream_spec(shape, imap_t):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = len(shape)
    return pl.BlockSpec(
        (1, ROW_BLOCK, *shape[2:]),
        lambda b, t, _n=n, _f=imap_t: (_f(t), b) + (0,) * (_n - 2),
        memory_space=pltpu.VMEM,
    )


def _resident_spec(shape, rows=True):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = len(shape)
    if rows:
        return pl.BlockSpec(
            (ROW_BLOCK, *shape[1:]),
            lambda b, t, _n=n: (b,) + (0,) * (_n - 1),
            memory_space=pltpu.VMEM,
        )
    return pl.BlockSpec(
        shape, lambda b, t, _n=n: (0,) * _n, memory_space=pltpu.VMEM
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def ffbsi_scan(static, x_anchor, xs, r, mr, c, lwn, lg, gum):
    """Fused FFBSi reverse sweep.

    x_anchor [B, M, DP]; xs/r/mr [T-1, B, DP, K]; c/lwn/lg [T-1, B, K];
    gum [T-1, B, M, K]. All channel dims pre-padded to DP (multiple of 8;
    zero-padding is inert: padded r/mr rows contribute nothing).

    Returns (x_first [B,M,DP], logp_acc [B,M], logq_acc [B,M],
    xtilde [T-1,B,M,DP]) — the accumulators hold only the in-sweep terms;
    the anchor/prior terms add outside (they are plain sums)."""
    out, _ = _scan_fwd(static, x_anchor, xs, r, mr, c, lwn, lg, gum)
    return out


def _scan_fwd(static, x_anchor, xs, r, mr, c, lwn, lg, gum):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    k = static
    t_len, batch = c.shape[0], c.shape[1]
    mp, dp = x_anchor.shape[1], x_anchor.shape[2]
    rev = lambda t: t_len - 1 - t

    in_specs = [
        _resident_spec(x_anchor.shape),
        _stream_spec(xs.shape, rev),
        _stream_spec(r.shape, rev),
        _stream_spec(mr.shape, rev),
        _stream_spec(c.shape, rev),
        _stream_spec(lwn.shape, rev),
        _stream_spec(lg.shape, rev),
        _stream_spec(gum.shape, rev),
    ]
    out_specs = [
        _stream_spec((t_len, batch, mp, dp), rev),
        _resident_spec((batch, mp, dp)),
        _resident_spec((batch, mp)),
        _resident_spec((batch, mp)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((t_len, batch, mp, dp), jnp.float32),
        jax.ShapeDtypeStruct((batch, mp, dp), jnp.float32),
        jax.ShapeDtypeStruct((batch, mp), jnp.float32),
        jax.ShapeDtypeStruct((batch, mp), jnp.float32),
    ]
    xtilde, x_first, logp, logq = pl.pallas_call(
        functools.partial(_fwd_kernel, k, t_len),
        grid=(batch // ROW_BLOCK, t_len),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((ROW_BLOCK, mp, dp), jnp.float32),
            pltpu.VMEM((ROW_BLOCK, mp), jnp.float32),
            pltpu.VMEM((ROW_BLOCK, mp), jnp.float32),
        ],
        interpret=_INTERPRET,
    )(x_anchor, xs, r, mr, c, lwn, lg, gum)
    res = (x_anchor, xs, r, mr, c, lwn, lg, gum, xtilde)
    return (x_first, logp, logq, xtilde), res


def _scan_bwd(static, res, cots):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    k = static
    x_anchor, xs, r, mr, c, lwn, lg, gum, xtilde = res
    d_xfirst, d_logp, d_logq, d_xt_s = cots
    t_len, batch = c.shape[0], c.shape[1]
    mp, dp = x_anchor.shape[1], x_anchor.shape[2]
    fwd_t = lambda t: t
    # the step-t query is x̃_{t+1}; the clamped block at t_len-1 is unused
    # (the kernel selects the anchor there)
    nxt = lambda t: jnp.minimum(t + 1, t_len - 1)

    in_specs = [
        _resident_spec(x_anchor.shape),
        _stream_spec(xs.shape, fwd_t),
        _stream_spec(r.shape, fwd_t),
        _stream_spec(mr.shape, fwd_t),
        _stream_spec(c.shape, fwd_t),
        _stream_spec(lwn.shape, fwd_t),
        _stream_spec(lg.shape, fwd_t),
        _stream_spec(gum.shape, fwd_t),
        _stream_spec(xtilde.shape, nxt),
        _stream_spec(d_xt_s.shape, fwd_t),
        _resident_spec(d_xfirst.shape),
        _resident_spec(d_logp.shape),
        _resident_spec(d_logq.shape),
    ]
    out_specs = [
        _resident_spec((batch, mp, dp)),              # d x_anchor
        _stream_spec((t_len, batch, dp, k), fwd_t),   # d xs
        _stream_spec((t_len, batch, dp, k), fwd_t),   # d r
        _stream_spec((t_len, batch, dp, k), fwd_t),   # d mr
        _stream_spec((t_len, batch, k), fwd_t),       # d c
        _stream_spec((t_len, batch, k), fwd_t),       # d lwn
        _stream_spec((t_len, batch, k), fwd_t),       # d lg
    ]
    out_shape = [
        jax.ShapeDtypeStruct((batch, mp, dp), jnp.float32),
        jax.ShapeDtypeStruct((t_len, batch, dp, k), jnp.float32),
        jax.ShapeDtypeStruct((t_len, batch, dp, k), jnp.float32),
        jax.ShapeDtypeStruct((t_len, batch, dp, k), jnp.float32),
        jax.ShapeDtypeStruct((t_len, batch, k), jnp.float32),
        jax.ShapeDtypeStruct((t_len, batch, k), jnp.float32),
        jax.ShapeDtypeStruct((t_len, batch, k), jnp.float32),
    ]
    (d_xanchor, d_xs, d_r, d_mr, d_c, d_lwn, d_lg) = pl.pallas_call(
        functools.partial(_bwd_kernel, k, t_len),
        grid=(batch // ROW_BLOCK, t_len),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((ROW_BLOCK, mp, dp), jnp.float32)],
        interpret=_INTERPRET,
    )(x_anchor, xs, r, mr, c, lwn, lg, gum, xtilde, d_xt_s,
      d_xfirst, d_logp, d_logq)
    return (d_xanchor, d_xs, d_r, d_mr, d_c, d_lwn, d_lg, jnp.zeros_like(gum))


ffbsi_scan.defvjp(_scan_fwd, _scan_bwd)


def run_ffbsi_scan(ssm, sup, xs, lwn, lg, gum, x_anchor, dx: int):
    """Pad to kernel shapes, run, slice back. sup = diag support terms."""
    k = xs.shape[-1]
    dp = _round_up(dx, 8)

    def padd(a):  # [..., D, K] -> [..., DP, K]
        return jnp.pad(a, (*[(0, 0)] * (a.ndim - 2), (0, dp - dx), (0, 0)))

    xa = jnp.pad(x_anchor, ((0, 0), (0, 0), (0, dp - dx)))
    x_first, lp, lq, xtilde = ffbsi_scan(
        k, xa, padd(xs), padd(sup["r"]), padd(sup["mr"]), sup["c"],
        lwn, lg, gum,
    )
    return x_first[:, :, :dx], lp, lq, xtilde[..., :dx]

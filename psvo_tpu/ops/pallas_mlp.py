"""Fused MLP (mean, scale) head as a Pallas TPU kernel with custom VJP.

The north-star kernel (BASELINE.json): proposal/transition/emission MLPs
"evaluated as fused Pallas matmul kernels". For each row-block the whole dense
chain (x -> hidden* -> mean) runs inside VMEM, so hidden activations never
round-trip HBM — the fusion XLA cannot do (it does not fuse matmuls into each
other). At SMC shapes (N = batch*particles rows, feature dims ≤ 128) the
filter is HBM-bandwidth-bound, so cutting per-layer activation traffic is the
win; the MXU work itself is tiny.

Autodiff: `fused_mlp_mean` carries a custom VJP whose backward pass is a
second Pallas kernel that *recomputes* the forward chain per block (flash-
style rematerialization) and accumulates dW/db across the sequential TPU grid
into VMEM-resident outputs. Gradient correctness is pinned by
tests/test_pallas.py (interpret mode vs the jnp path, plus vjp-vs-jvp checks
at the objective level in tests/test_smc.py).

Layout notes (see /opt/skills/guides/pallas_guide.md): feature dims pad to the
128-lane width; rows pad to the row-block; zero-padding is exact for
relu/tanh/gelu chains (act(0) = 0, zero weight columns) so no masking is
needed; `preferred_element_type=float32` keeps MXU accumulation in f32.

Public entry: `mlp_mean_scale(params, x, ...)` — signature-identical to
`psvo_tpu.networks.mlp_mean_scale`, dispatching to the kernel on TPU (const-
scale heads) and the jnp path otherwise.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from psvo_tpu import networks

# Set to False to force the jnp path globally (debugging / CPU benchmarking).
ENABLE = True
_INTERPRET = False  # flipped by tests to run kernels on CPU

LANE = 128
ROW_BLOCK = 512

_ACTS = {
    "relu": lambda z: jnp.maximum(z, 0.0),
    "tanh": jnp.tanh,
}
# derivative in terms of the PRE-activation z
_DACTS = {
    "relu": lambda z: (z > 0).astype(z.dtype),
    "tanh": lambda z: 1.0 - jnp.tanh(z) ** 2,
}


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def _pad_to(x: jax.Array, axis: int, size: int) -> jax.Array:
    pad = size - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def _pack(params) -> tuple[list, list, int, int]:
    """Pad every weight/bias to LANE-aligned shapes. Returns
    (weights [din_p, dout_p], biases [1, dout_p] — hidden layers then mean head)."""
    ws, bs = [], []
    for w, b in [*params["layers"], params["mean"]]:
        ws.append(_pad_to(_pad_to(w, 0, _round_up(w.shape[0], LANE)), 1, _round_up(w.shape[1], LANE)))
        bs.append(_pad_to(b, 0, _round_up(b.shape[0], LANE))[None, :])
    din = params["layers"][0][0].shape[0] if params["layers"] else params["mean"][0].shape[0]
    dout = params["mean"][0].shape[1]
    return ws, bs, din, dout


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(n_layers: int, activation: str, bf16: bool, x_ref, *refs):
    """refs = (w_0, b_0, ..., w_L, b_L, out_ref); layer L is the linear mean head.

    bf16=True casts matmul operands to bfloat16 (MXU native) with float32
    accumulation — activations/biases stay f32 so the log-density numerics
    downstream keep their mantissa.
    """
    act = _ACTS[activation]
    out_ref = refs[-1]

    def mm(h, w):
        if bf16:
            return jnp.dot(
                h.astype(jnp.bfloat16),
                w.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
        return jnp.dot(h, w, preferred_element_type=jnp.float32)

    h = x_ref[:]
    for i in range(n_layers):
        h = act(mm(h, refs[2 * i][:]) + refs[2 * i + 1][:])
    out_ref[:] = mm(h, refs[2 * n_layers][:]) + refs[2 * n_layers + 1][:]


def _fwd_pallas(ws, bs, x_p, n_layers, activation, bf16):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_p = x_p.shape[0]
    dout_p = ws[-1].shape[1]
    grid = (n_p // ROW_BLOCK,)

    def full(i):  # weights replicate to every block
        return (0, 0)

    in_specs = [
        pl.BlockSpec((ROW_BLOCK, x_p.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ]
    args = [x_p]
    for w, b in zip(ws, bs):
        in_specs.append(pl.BlockSpec(w.shape, full, memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec(b.shape, full, memory_space=pltpu.VMEM))
        args.extend([w, b])

    return pl.pallas_call(
        functools.partial(_fwd_kernel, n_layers, activation, bf16),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (ROW_BLOCK, dout_p), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_p, dout_p), jnp.float32),
        interpret=_INTERPRET,
    )(*args)


# ---------------------------------------------------------------------------
# Backward kernel: recompute-forward + backprop + cross-block dW accumulation
# ---------------------------------------------------------------------------


def _bwd_kernel(n_layers: int, activation: str, x_ref, g_ref, *refs):
    """refs = (w_0..w_L, b ignored layout) -> outputs (dx, dw_0, db_0, ..., dw_L, db_L).

    Sequential-grid accumulation: dW/db outputs use a constant index map, so
    every block adds into the same VMEM tile; block 0 initializes.
    """
    from jax.experimental import pallas as pl

    act, dact = _ACTS[activation], _DACTS[activation]
    ws = [refs[i][:] for i in range(n_layers + 1)]
    bs = [refs[n_layers + 1 + i][:] for i in range(n_layers + 1)]
    dx_ref = refs[2 * (n_layers + 1)]
    dw_refs = refs[2 * (n_layers + 1) + 1 : 2 * (n_layers + 1) + 2 + n_layers]
    db_refs = refs[2 * (n_layers + 1) + 2 + n_layers :]

    i = pl.program_id(0)

    # Recompute forward, caching pre-activations.
    h = x_ref[:]
    hs = [h]  # inputs to each layer
    zs = []
    for l in range(n_layers):
        z = jnp.dot(h, ws[l], preferred_element_type=jnp.float32) + bs[l]
        zs.append(z)
        h = act(z)
        hs.append(h)

    # Backprop.
    g = g_ref[:]  # d mean
    for l in range(n_layers, -1, -1):
        dw = jnp.dot(hs[l].T, g, preferred_element_type=jnp.float32)
        db = jnp.sum(g, axis=0, keepdims=True)

        @pl.when(i == 0)
        def _(dw=dw, db=db, l=l):
            dw_refs[l][:] = dw
            db_refs[l][:] = db

        @pl.when(i != 0)
        def _(dw=dw, db=db, l=l):
            dw_refs[l][:] += dw
            db_refs[l][:] += db

        g = jnp.dot(g, ws[l].T, preferred_element_type=jnp.float32)
        if l > 0:
            g = g * dact(zs[l - 1])
    dx_ref[:] = g


def _bwd_pallas(ws, bs, x_p, g_p, n_layers, activation):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_p, din_p = x_p.shape
    grid = (n_p // ROW_BLOCK,)

    def full(i):
        return (0, 0)

    in_specs = [
        pl.BlockSpec((ROW_BLOCK, din_p), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((ROW_BLOCK, g_p.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    args = [x_p, g_p]
    for w in ws:
        in_specs.append(pl.BlockSpec(w.shape, full, memory_space=pltpu.VMEM))
        args.append(w)
    for b in bs:
        in_specs.append(pl.BlockSpec(b.shape, full, memory_space=pltpu.VMEM))
        args.append(b)

    out_shape = [jax.ShapeDtypeStruct((n_p, din_p), jnp.float32)]
    out_specs = [
        pl.BlockSpec((ROW_BLOCK, din_p), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ]
    for w in ws:
        out_shape.append(jax.ShapeDtypeStruct(w.shape, jnp.float32))
        out_specs.append(pl.BlockSpec(w.shape, full, memory_space=pltpu.VMEM))
    for b in bs:
        out_shape.append(jax.ShapeDtypeStruct(b.shape, jnp.float32))
        out_specs.append(pl.BlockSpec(b.shape, full, memory_space=pltpu.VMEM))

    return pl.pallas_call(
        functools.partial(_bwd_kernel, n_layers, activation),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_INTERPRET,
    )(*args)


# ---------------------------------------------------------------------------
# custom_vjp wrapper over flat (x, weights..., biases...) arguments
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _fused_core(n_layers: int, activation: str, bf16: bool, x_p, ws, bs):
    return _fwd_pallas(list(ws), list(bs), x_p, n_layers, activation, bf16)


def _fused_core_fwd(n_layers, activation, bf16, x_p, ws, bs):
    return _fused_core(n_layers, activation, bf16, x_p, ws, bs), (x_p, ws, bs)


def _fused_core_bwd(n_layers, activation, bf16, res, g):
    # backward stays f32: dW accumulations need the mantissa
    x_p, ws, bs = res
    outs = _bwd_pallas(list(ws), list(bs), x_p, g, n_layers, activation)
    dx = outs[0]
    dws = tuple(outs[1 : 2 + n_layers])
    dbs = tuple(outs[2 + n_layers :])
    return dx, dws, dbs


_fused_core.defvjp(_fused_core_fwd, _fused_core_bwd)


def fused_mlp_mean(
    params, x: jax.Array, activation: str = "relu", bf16: bool = False
) -> jax.Array:
    """Fused mean-head MLP forward for arbitrary leading axes."""
    ws, bs, din, dout = _pack(params)
    lead = x.shape[:-1]
    n = int(np.prod(lead)) if lead else 1
    n_p = _round_up(max(n, 1), ROW_BLOCK)
    x2 = _pad_to(_pad_to(x.reshape(n, x.shape[-1]), 1, ws[0].shape[0]), 0, n_p)
    out = _fused_core(
        len(params["layers"]), activation, bf16, x2, tuple(ws), tuple(bs)
    )
    return out[:n, :dout].reshape(*lead, dout)


def usable(activation: str) -> bool:
    """THE gating predicate for the fused kernels — the only place the
    enable/platform/activation conditions live (callers must not re-derive
    them from module internals; two copies of this logic drifted once)."""
    return ENABLE and activation in _ACTS and (_on_tpu() or _INTERPRET)


def mlp_mean_scale(params, x, *, activation="relu", sigma_min=1e-3, bf16=False):
    """Fused (mean, scale) MLP forward. Falls back to jnp off-TPU, for
    activations without a registered derivative, or for scale-head networks
    (the scale head shares the trunk — handled by the jnp path for now)."""
    if not (usable(activation) and "raw_scale" in params):  # const-scale heads only
        return networks.mlp_mean_scale(
            params, x, activation=activation, sigma_min=sigma_min, bf16=bf16
        )
    mean = fused_mlp_mean(params, x, activation, bf16)
    scale = jnp.broadcast_to(
        networks.scale_from_raw(params["raw_scale"], sigma_min), mean.shape
    )
    return mean, scale

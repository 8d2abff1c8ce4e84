"""Fused MLP (mean, scale) head as a Pallas TPU kernel.

The north-star kernel (BASELINE.json): proposal/transition/emission MLPs
"evaluated as fused Pallas matmul kernels". The whole dense chain
(x -> hidden* -> mean[, scale]) runs in VMEM per row-block, so hidden
activations never round-trip HBM — the win XLA cannot give, since it does not
fuse matmuls into each other.

This module exposes `mlp_mean_scale(params, x, ...)`, signature-identical to
`psvo_tpu.networks.mlp_mean_scale`, dispatching to the kernel on TPU and the
jnp path elsewhere (equivalence-tested in tests/test_pallas.py).
"""

from __future__ import annotations

import jax

from psvo_tpu import networks

# Set to False to force the jnp path globally (debugging / CPU benchmarking).
ENABLE = True


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover - no backend at all
        return False


def mlp_mean_scale(params, x, *, activation="relu", sigma_min=1e-3, bf16=False):
    """Fused (mean, scale) MLP forward. Falls back to jnp off-TPU.

    NOTE: kernel implementation lands with milestone M4 (SURVEY.md §7); until
    then this dispatches to the jnp path everywhere so numerics are identical.
    """
    del bf16  # used by the fused kernel path once it lands
    return networks.mlp_mean_scale(
        params, x, activation=activation, sigma_min=sigma_min
    )

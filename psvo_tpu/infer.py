"""User-facing posterior inference on a trained model.

The reference exposes inference only implicitly (latent paths inside its
result pickles/plots); production users need it as an API. Both functions
take observations [B, T, Dy] and return time-major-free, batch-leading
arrays.

- `filter_posterior`  — filtering means (and optionally the particle cloud).
- `smooth_posterior`  — M smoothed trajectories via the model's smoothing
  machinery: FFBSi (PSVO) by default, or the learned backward proposal (SVO)
  when the config trained one.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from psvo_tpu.utils.rng import run_key
from psvo_tpu.config import Config
from psvo_tpu.models.ssm import SSM
from psvo_tpu.objectives import make_objective
from psvo_tpu.smc import forward_filter
from psvo_tpu.train import filtered_means


def _check_controls(ssm: SSM, controls) -> None:
    """A di>0 model inferred without its controls silently runs zeros through
    the transition heads — wrong posteriors with no error. Refuse instead."""
    if ssm.di and controls is None:
        raise ValueError(
            f"model conditions on di={ssm.di} control inputs; pass "
            "controls=[B, T, di] (the same exogenous inputs used in training)"
        )
    if not ssm.di and controls is not None:
        raise ValueError("model has di=0: controls were passed but never used")


def filter_posterior(
    ssm: SSM,
    params,
    ys,
    cfg: Config,
    key: Optional[jax.Array] = None,
    *,
    return_particles: bool = False,
    controls=None,
    encoder_inputs=None,
):
    """Filtering posterior: means [B, T, Dx] (+ particles/log-weights).

    Uses the config's particle count and resampling scheme; one jitted scan.
    controls [B, T, Di] are required when the model was trained with di > 0;
    encoder_inputs optionally replaces what the encoder proposal q2 sees
    (the reference's `q_uses_true_X` debug path).
    """
    _check_controls(ssm, controls)
    key = key if key is not None else run_key(cfg, 17)
    fwd = forward_filter(
        ssm,
        params,
        key,
        jnp.asarray(ys),
        cfg.smc,
        cache=return_particles,
        controls=None if controls is None else jnp.asarray(controls),
        encoder_inputs=(
            None if encoder_inputs is None else jnp.asarray(encoder_inputs)
        ),
    )
    means = filtered_means(fwd)
    if return_particles:
        # internal cache is channel-major [T, B, Dx, K]; the public API keeps
        # the reference-style [B, T, K, Dx] (cold path, one-off transpose)
        return (
            means,
            jnp.transpose(fwd.xs, (1, 0, 3, 2)),
            jnp.swapaxes(fwd.logws, 0, 1),
        )
    return means


def smooth_posterior(
    ssm: SSM,
    params,
    ys,
    cfg: Config,
    key: Optional[jax.Array] = None,
    *,
    n_samples: Optional[int] = None,
    method: Optional[str] = None,
    controls=None,
    encoder_inputs=None,
):
    """Smoothed posterior trajectories [B, M, T, Dx].

    method: "psvo" (FFBSi over the forward support — works for ANY trained
    model) or "svo" (the learned backward proposal — requires a trained qb
    head). Defaults to the config's objective when it is a smoothing one,
    else FFBSi. controls [B, T, Di] are required when the model was trained
    with di > 0.
    """
    _check_controls(ssm, controls)
    key = key if key is not None else run_key(cfg, 18)
    method = method or (cfg.smc.objective if cfg.smc.objective in ("svo", "psvo") else "psvo")
    m = n_samples or cfg.smc.n_smoothing_particles
    run_cfg = dataclasses.replace(
        cfg,
        smc=dataclasses.replace(cfg.smc, objective=method, n_smoothing_particles=m),
    )
    out = make_objective(ssm, run_cfg)(
        params,
        key,
        jnp.asarray(ys),
        encoder_inputs=(
            None if encoder_inputs is None else jnp.asarray(encoder_inputs)
        ),
        controls=None if controls is None else jnp.asarray(controls),
    )
    # smoothed is [T, B, M, Dx] -> [B, M, T, Dx]
    return jnp.transpose(out.smoothed, (1, 2, 0, 3))

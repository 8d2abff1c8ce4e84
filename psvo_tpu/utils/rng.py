"""Run-key construction honoring the configured PRNG implementation.

Every entry point (Trainer, CLI, benchmark, inference) derives its root keys
here so `train.rng_impl` applies uniformly: keys split/folded from an rbg
root stay rbg all the way into the per-scan bulk noise (the expensive part —
see TrainConfig.rng_impl). threefry remains the default for cross-backend
reproducibility.
"""

from __future__ import annotations

import jax


def run_key(cfg, salt: int = 0) -> jax.Array:
    """Root PRNG key for a run: seed + salt under cfg.train.rng_impl."""
    return jax.random.key(cfg.seed + salt, impl=cfg.train.rng_impl)

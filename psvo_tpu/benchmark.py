"""Benchmark harness: the BASELINE.json primary metric.

Measures jitted train-step throughput (full SMC forward + backprop + Adam) on
the FHN K=1024 FIVO config on the attached accelerator, and compares against
the "reference CPU" stand-in — the trusted NumPy reimplementation of the
reference's forward objective (tests/reference_numpy/numpy_smc.py; the
reference itself is unrunnable, SURVEY.md §0). The comparison is conservative
in our favor's *disfavor*: the baseline times only the forward pass while our
number includes gradients and the optimizer update.

Prints exactly ONE JSON line:
  {"metric": ..., "value": N, "unit": "steps/s", "vs_baseline": N}
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _time_loop(fn, n: int) -> float:
    """Time n chained calls ending in a REAL value fetch.

    On the tunneled TPU platform `block_until_ready` does not reliably wait
    for remote execution; converting the final loss to a Python float does —
    it forces the whole n-step dependency chain to complete.
    """
    t0 = time.perf_counter()
    out = None
    for _ in range(n):
        out = fn()
    float(out)
    return (time.perf_counter() - t0) / n


def main(preset_name: str = "fhn_fivo_k1024_bench", steps: int = 30) -> int:
    from psvo_tpu.config import preset
    from psvo_tpu.data import generate_dataset
    from psvo_tpu.models.ssm import init_ssm
    from psvo_tpu.train import make_optimizer, make_train_step

    try:  # the NumPy reference lives in the source checkout's tests/
        from tests.reference_numpy.numpy_smc import (
            NumpySSMParams,
            numpy_forward_filter,
        )
    except ModuleNotFoundError:
        NumpySSMParams = numpy_forward_filter = None

    cfg = preset(preset_name)
    dataset = generate_dataset(cfg.data, cfg.seed)
    ssm, params = init_ssm(cfg, jax.random.key(cfg.seed))
    optimizer = make_optimizer(cfg)
    opt_state = optimizer.init(params)
    train_step = make_train_step(ssm, cfg, optimizer)

    batch = jnp.asarray(dataset.obs_train[: cfg.train.batch_size])
    key = jax.random.key(1)

    # Warmup: compile + a couple of steady-state steps.
    p, s = params, opt_state
    for i in range(3):
        p, s, m = train_step(p, s, jax.random.fold_in(key, i), batch)
    float(m["loss"])  # real fetch: forces compile + warmup execution

    state = {"p": p, "s": s, "i": 3}

    def one_step():
        state["p"], state["s"], m = train_step(
            state["p"], state["s"], jax.random.fold_in(key, state["i"]), batch
        )
        state["i"] += 1
        return m["loss"]

    step_time = _time_loop(one_step, steps)
    steps_per_sec = 1.0 / step_time
    device = jax.devices()[0]
    print(
        f"# device={device.platform}:{device.device_kind} "
        f"config={cfg.name} K={cfg.smc.n_particles} T={cfg.data.t_steps} "
        f"B={cfg.train.batch_size} step_time={step_time*1e3:.2f}ms",
        file=sys.stderr,
    )

    if numpy_forward_filter is None:
        print(
            json.dumps(
                {
                    "metric": f"train_steps_per_sec_{cfg.name}",
                    "value": round(steps_per_sec, 3),
                    "unit": "steps/s",
                    "vs_baseline": None,
                }
            )
        )
        return 0

    # Reference-CPU baseline: NumPy forward objective on the same model/batch.
    model = NumpySSMParams.from_jax(p, ssm)
    ys_np = np.asarray(batch)
    t0 = time.perf_counter()
    reps = 2
    for r in range(reps):
        numpy_forward_filter(model, ys_np, cfg.smc.n_particles, seed=r)
    base_time = (time.perf_counter() - t0) / reps
    base_sps = 1.0 / base_time
    print(
        f"# numpy-cpu baseline: {base_time*1e3:.1f}ms/forward ({base_sps:.2f} steps/s)",
        file=sys.stderr,
    )

    print(
        json.dumps(
            {
                "metric": f"train_steps_per_sec_{cfg.name}",
                "value": round(steps_per_sec, 3),
                "unit": "steps/s",
                "vs_baseline": round(steps_per_sec / base_sps, 2),
            }
        )
    )
    return 0

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


def _time_windows(fn, n: int, windows: int = 3) -> list[float]:
    """Median-friendly timing: `windows` independent chained windows of n
    steps each (round-1 observed ±10% window-to-window variance through the
    relay — one window can mislead by that much)."""
    return [_time_loop(fn, n) for _ in range(windows)]


def _mlp_flops_per_row(din: int, hidden, dout: int) -> int:
    sizes = [din, *hidden, dout]
    return sum(2 * a * b for a, b in zip(sizes[:-1], sizes[1:]))


def analytic_cost(cfg) -> tuple[float, float]:
    """(GFLOP, GB) moved per train step — analytic lower bounds from the
    model structure, so the bench can report achieved FLOP/s and bytes/s
    next to steps/s (layout regressions show as a ratio, not just a
    throughput delta).

    FLOPs: per-timestep MLP matmuls over B·K rows (q1+f stacked, g; q2 runs
    per-trajectory) × T, × 4 for backward + remat recompute (bwd ≈ 2× fwd,
    remat re-runs the fwd). Bytes: the per-step particle-state HBM traffic —
    [B, Dp, K] carry read+write (+eps read, weights rw) with Dp the
    8-sublane-padded state dim, × 3 for the backward sweep.
    """
    b, k, t = cfg.train.batch_size, cfg.smc.n_particles, cfg.data.t_steps
    dx, dy, di = cfg.data.dx, cfg.data.dy, cfg.data.di
    nets = {name: c for name, c in cfg.nets}
    per_row = (
        _mlp_flops_per_row(dx + di, nets["q1"].hidden, dx)
        + _mlp_flops_per_row(dx + di, nets["f"].hidden, dx)
        + _mlp_flops_per_row(dx, nets["g"].hidden, dy)
    )
    flops = 4.0 * t * b * k * per_row  # fwd + bwd(2x) + remat recompute
    dp = -(-dx // 8) * 8
    bytes_per_ts = 4 * b * k * (2 * dp + dp + 3)  # x rw, eps r, logw/alpha rw
    gbytes = 3.0 * t * bytes_per_ts / 1e9
    return flops / 1e9, gbytes


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

    window_times = _time_windows(one_step, steps, windows=3)
    step_time = sorted(window_times)[len(window_times) // 2]  # median window
    steps_per_sec = 1.0 / step_time
    gflop, gbyte = analytic_cost(cfg)
    perf = {
        "value_windows": [round(1.0 / w, 3) for w in window_times],
        "gflops_per_step": round(gflop, 3),
        "achieved_gflops_per_sec": round(gflop / step_time, 2),
        "gbytes_per_step": round(gbyte, 3),
        "achieved_gbytes_per_sec": round(gbyte / step_time, 2),
    }
    device = jax.devices()[0]
    print(
        f"# device={device.platform}:{device.device_kind} "
        f"config={cfg.name} K={cfg.smc.n_particles} T={cfg.data.t_steps} "
        f"B={cfg.train.batch_size} step_time={step_time*1e3:.2f}ms "
        f"windows={[f'{1e3*w:.1f}ms' for w in window_times]} "
        f"achieved={perf['achieved_gflops_per_sec']} GFLOP/s "
        f"{perf['achieved_gbytes_per_sec']} GB/s (analytic)",
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
                    **perf,
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
                **perf,
            }
        )
    )
    return 0

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

from psvo_tpu.utils.rng import run_key


def device_preflight(timeout_s: float = 180.0, retries: int = 3) -> str | None:
    """Bounded liveness check of the attached accelerator.

    The TPU here is reached through a stdio relay (tunneled PJRT); a wedged
    relay makes the FIRST device execution block forever — uninterruptible
    from inside this process, which would hang the driver's end-of-round
    bench indefinitely (observed 2026-08-20: `jax.devices()` answered while
    a 128×128 matmul never returned). Probe with a tiny roundtrip in a
    killable subprocess before committing to the real measurement; retry a
    few times so a transient relay hiccup doesn't fail the bench. Returns
    None when healthy, else a short diagnostic string.
    """
    import subprocess
    import os

    src = (
        "import jax, jax.numpy as jnp\n"
        "y = float((jnp.ones((128,128)) @ jnp.ones((128,128))).sum())\n"
        "print('PREFLIGHT_OK', y)\n"
    )
    err = "unknown"
    for attempt in range(retries):
        try:
            p = subprocess.run(
                [sys.executable, "-c", src],
                timeout=timeout_s,
                capture_output=True,
                text=True,
                env=dict(os.environ),
            )
            if "PREFLIGHT_OK" in p.stdout:
                return None
            err = f"probe rc={p.returncode}: {p.stderr.strip()[-200:]}"
        except subprocess.TimeoutExpired:
            err = f"device roundtrip exceeded {timeout_s:.0f}s (relay wedged?)"
        print(
            f"# preflight attempt {attempt + 1}/{retries} failed: {err}",
            file=sys.stderr,
        )
        if attempt + 1 < retries:
            time.sleep(60)
    return err


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


def measure(cfg, steps: int = 30, adaptive: bool = False) -> dict:
    """Measure one config's jitted train-step throughput.

    Returns the machine-readable row: median + per-window steps/s, step
    time, analytic FLOP/s and GB/s. With adaptive=True the window length is
    re-chosen from a short probe so every row gets ~2 s windows regardless
    of its per-step cost (K=8192 vs K=16 differ by ~100×).
    """
    from psvo_tpu.data import generate_dataset
    from psvo_tpu.models.ssm import init_ssm
    from psvo_tpu.train import make_optimizer, make_train_step

    dataset = generate_dataset(cfg.data, cfg.seed)
    ssm, params = init_ssm(cfg, run_key(cfg))
    optimizer = make_optimizer(cfg)
    opt_state = optimizer.init(params)
    train_step = make_train_step(ssm, cfg, optimizer)

    batch = jnp.asarray(dataset.obs_train[: cfg.train.batch_size])
    key = run_key(cfg, 1)

    # steps_per_call presets: one jitted call scans n_call steps (the
    # dispatch-bound small-K rows); the bench times CALLS and reports
    # per-step numbers
    n_call = max(int(cfg.train.steps_per_call), 1)
    batch_flat = batch  # the numpy-baseline comparison wants [B, T, Dy]
    if n_call > 1:
        batch = jnp.stack([batch] * n_call)

    def _key(i):
        k = jax.random.fold_in(key, i)
        return jax.random.split(k, n_call) if n_call > 1 else k

    # Warmup: compile + a couple of steady-state steps.
    p, s = params, opt_state
    for i in range(3):
        p, s, m = train_step(p, s, _key(i), batch)
    float(m["loss"])  # real fetch: forces compile + warmup execution

    state = {"p": p, "s": s, "i": 3}

    def one_step():
        state["p"], state["s"], m = train_step(
            state["p"], state["s"], _key(state["i"]), batch
        )
        state["i"] += 1
        return m["loss"]

    if adaptive:
        est = _time_loop(one_step, 3)
        steps = max(5, min(steps, int(2.0 / max(est, 1e-4)) + 1))

    window_times = _time_windows(one_step, steps, windows=3)
    # median window; with chunked presets each timed call is n_call steps
    step_time = sorted(window_times)[len(window_times) // 2] / n_call
    gflop, gbyte = analytic_cost(cfg)
    row = {
        "metric": f"train_steps_per_sec_{cfg.name}",
        "value": round(1.0 / step_time, 3),
        "unit": "steps/s",
        "step_time_ms": round(step_time * 1e3, 3),
        "window_steps": steps,
        "value_windows": [round(n_call / w, 3) for w in window_times],
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
        f"achieved={row['achieved_gflops_per_sec']} GFLOP/s "
        f"{row['achieved_gbytes_per_sec']} GB/s (analytic)",
        file=sys.stderr,
    )
    row["_final_params"] = state["p"]  # for the numpy-baseline comparison
    row["_ssm"] = ssm
    row["_batch"] = batch_flat
    return row


def _numpy_baseline(row, cfg) -> float | None:
    """Reference-CPU stand-in: NumPy forward objective, same model/batch."""
    try:  # the NumPy reference lives in the source checkout's tests/
        from tests.reference_numpy.numpy_smc import (
            NumpySSMParams,
            numpy_forward_filter,
        )
    except ModuleNotFoundError:
        return None
    model = NumpySSMParams.from_jax(row["_final_params"], row["_ssm"])
    ys_np = np.asarray(row["_batch"])
    t0 = time.perf_counter()
    reps = 2
    for r in range(reps):
        numpy_forward_filter(model, ys_np, cfg.smc.n_particles, seed=r)
    base_time = (time.perf_counter() - t0) / reps
    print(
        f"# numpy-cpu baseline: {base_time*1e3:.1f}ms/forward "
        f"({1.0/base_time:.2f} steps/s)",
        file=sys.stderr,
    )
    return 1.0 / base_time


def _strip(row: dict) -> dict:
    return {k: v for k, v in row.items() if not k.startswith("_")}


def main(preset_name: str = "fhn_fivo_k1024_bench", steps: int = 30) -> int:
    from psvo_tpu.config import preset

    cfg = preset(preset_name)
    row = measure(cfg, steps)
    base_sps = _numpy_baseline(row, cfg)
    out = _strip(row)
    out["vs_baseline"] = (
        round(row["value"] / base_sps, 2) if base_sps else None
    )
    print(json.dumps(out))
    return 0


# The BASELINE.json benchmark table: the five reference configs + primary.
ALL_ROWS = (
    "fhn_iwae_k16",
    "fhn_fivo_k128",
    "lorenz63_svo_k256",
    "lorenz63_psvo_k1024",
    "lorenz96_fivo_k8192_sharded",
    "fhn_fivo_k1024_bench",
)


def main_all(steps: int = 30, out_path: str = "BENCH_ALL.json") -> int:
    """Measure every BASELINE row in one invocation (VERDICT r2 #8): one
    machine-readable blob per round, so the BASELINE.md table is
    reproducible and per-round regressions are visible. Runs a throwaway
    warmup config first (the first config in a fresh process carries a
    one-off relay warm-up penalty — BASELINE.md methodology note)."""
    import dataclasses

    from psvo_tpu.config import preset

    warm = dataclasses.replace(
        preset("fhn_fivo_k128"),
        data=dataclasses.replace(preset("fhn_fivo_k128").data, n_train=32, n_test=8),
    )
    print("# warmup (discarded)", file=sys.stderr)
    measure(warm, steps=3)

    rows = {}
    primary_vs = None
    for name in ALL_ROWS:
        cfg = preset(name)
        row = measure(cfg, steps, adaptive=True)
        if name == "fhn_fivo_k1024_bench":
            base = _numpy_baseline(row, cfg)
            primary_vs = round(row["value"] / base, 2) if base else None
        rows[name] = _strip(row)

    # the B=128 batch-scaling row (BASELINE.md tracks traj-steps/s here)
    b128 = dataclasses.replace(
        preset("fhn_fivo_k1024_bench"), name="fhn_fivo_k1024_b128"
    )
    b128 = dataclasses.replace(
        b128,
        train=dataclasses.replace(b128.train, batch_size=128),
        data=dataclasses.replace(b128.data, n_train=256),
    )
    rows["fhn_fivo_k1024_b128"] = _strip(measure(b128, steps, adaptive=True))

    device = jax.devices()[0]
    blob = {
        "device": f"{device.platform}:{device.device_kind}",
        "rows": rows,
        "primary": "fhn_fivo_k1024_bench",
        "vs_baseline": primary_vs,
    }
    with open(out_path, "w") as f:
        json.dump(blob, f, indent=1)
    print(f"# wrote {out_path}", file=sys.stderr)
    primary = dict(rows["fhn_fivo_k1024_bench"])
    primary["vs_baseline"] = primary_vs
    print(json.dumps(primary))
    return 0

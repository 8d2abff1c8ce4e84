"""Benchmark harness: the BASELINE.json primary metric.

Measures jitted train-step throughput (full SMC forward + backprop + Adam) on
the FHN K=1024 FIVO config on the attached accelerator, and compares against
the "reference CPU" stand-in — the trusted NumPy reimplementation of the
reference's forward objective (tests/reference_numpy/numpy_smc.py; the
reference itself is unrunnable, SURVEY.md §0). The comparison is conservative
in our favor's *disfavor*: the baseline times only the forward pass while our
number includes gradients and the optimizer update.

Prints exactly ONE JSON line:
  {"metric": ..., "value": N, "unit": "steps/s", "vs_baseline": N, ...}

Round-4 hardening (VERDICT r3 missing #1/#2, weak #4/#5, ADVICE r3):
- preflight is 2 bounded attempts (90 s then 60 s — a healthy-but-cold relay
  measured 70.7 s for its first matmul on 2026-08-20, so the first window
  must cover a cold start; a wedged relay costs ≤ ~2.6 min total, not 11);
- the probe subprocess runs in its own session and is killed as a process
  GROUP on timeout, with a bounded pipe drain (a stdio-relay grandchild
  inheriting our pipes can no longer wedge the preflight itself);
- the probe reports WHICH platform ran it: a silent CPU-fallback JAX init is
  a preflight failure unless PSVO_TPU_ALLOW_CPU_BENCH is set;
- every blob carries {git_sha, timestamp}; every row carries a timestamp
  (and a regime label where the measured kernel branch depends on it);
- `bench --all` writes a crash-safe partial BENCH_ALL.json after EVERY row —
  rows already measured survive a later hang;
- an on-device fused-vs-unfused equivalence smoke (losses + grad norms over
  a few real train steps) runs before timing and lands in the blob as
  `device_equiv_ok` — the CPU-only test suite cannot catch Mosaic lowering
  regressions (commit f289740 precedent);
- `bench --to-target` reproduces the second half of the BASELINE.json metric
  (wall-clock to a fixed test ELBO) every round.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from psvo_tpu.utils.rng import run_key

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_L96_CKPT = os.path.join(_REPO_ROOT, "checkpoints", "l96_pretrained.npz")

_PROBE_SRC = (
    "import jax, jax.numpy as jnp\n"
    "y = float((jnp.ones((128,128)) @ jnp.ones((128,128))).sum())\n"
    "print('PREFLIGHT_OK', jax.devices()[0].platform, y)\n"
)


def _run_probe(src: str, timeout_s: float):
    """Run the probe in a killable process GROUP with bounded pipe drains.

    subprocess.run's kill-then-read on timeout blocks forever when a
    grandchild (the PJRT stdio relay) inherited our pipes and outlives the
    child — the exact wedged-relay scenario this probe exists to detect
    (ADVICE r3 medium). Popen(start_new_session=True) + killpg reaps the
    whole group; if something still holds the pipes, the second drain is
    bounded and we abandon it.

    Returns (rc | None, stdout, stderr, timed_out).
    """
    import signal
    import subprocess

    p = subprocess.Popen(
        [sys.executable, "-c", src],
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        text=True,
        start_new_session=True,
        env=dict(os.environ),
    )
    try:
        out, err = p.communicate(timeout=timeout_s)
        return p.returncode, out, err, False
    except subprocess.TimeoutExpired:
        try:
            os.killpg(os.getpgid(p.pid), signal.SIGKILL)
        except (ProcessLookupError, PermissionError):
            p.kill()
        try:
            out, err = p.communicate(timeout=5.0)
        except subprocess.TimeoutExpired:
            out, err = "", ""  # an escaped pipe-holder: abandon the drain
        return None, out, err, True


def device_preflight(
    timeouts: tuple[float, ...] = (90.0, 60.0),
    probe_src: str | None = None,
    allow_cpu: bool | None = None,
) -> str | None:
    """Bounded liveness check of the attached accelerator.

    The TPU here is reached through a stdio relay (tunneled PJRT); a wedged
    relay makes the FIRST device execution block forever — uninterruptible
    from inside this process, which would hang the driver's end-of-round
    bench indefinitely (observed 2026-08-20: `jax.devices()` answered while
    a 128×128 matmul never returned). Probe with a tiny roundtrip in a
    killable subprocess before committing to the real measurement.

    Two attempts: 90 s (covers a measured 70.7 s relay cold start) then 60 s
    after a 5 s pause — worst case ~2.6 min, vs round 3's 11-minute envelope
    that consumed the driver's whole budget on a wedged relay (VERDICT r3
    missing #1). A transient error (e.g. the one-off FAILED_PRECONDITION
    observed right after relay recovery) is retried; a probe that ran on CPU
    when an accelerator was expected is a hard failure (ADVICE r3 low) unless
    PSVO_TPU_ALLOW_CPU_BENCH=1. Returns None when healthy, else a short
    diagnostic string.
    """
    if allow_cpu is None:
        allow_cpu = bool(os.environ.get("PSVO_TPU_ALLOW_CPU_BENCH"))
    src = probe_src if probe_src is not None else _PROBE_SRC
    err = "unknown"
    for attempt, t in enumerate(timeouts):
        rc, out, errtxt, timed_out = _run_probe(src, t)
        if timed_out:
            err = f"device roundtrip exceeded {t:.0f}s (relay wedged?)"
        elif "PREFLIGHT_OK" in out:
            # a truncated pipe flush can leave the marker with no trailing
            # token — treat that as a (retryable) failed probe, not an
            # IndexError that would crash past the driver's JSON contract
            tokens = out.split("PREFLIGHT_OK", 1)[1].split()
            if not tokens:
                err = "probe output truncated after PREFLIGHT_OK"
                print(
                    f"# preflight attempt {attempt + 1}/{len(timeouts)} "
                    f"failed: {err}",
                    file=sys.stderr,
                )
                if attempt + 1 < len(timeouts):
                    time.sleep(5)
                continue
            platform = tokens[0]
            if platform == "cpu" and not allow_cpu:
                # not retryable: the backend initialized, just on the wrong
                # device — a retry would measure CPU again
                return (
                    "probe ran on platform 'cpu' (accelerator expected; "
                    "set PSVO_TPU_ALLOW_CPU_BENCH=1 to bench CPU deliberately)"
                )
            return None
        else:
            err = f"probe rc={rc}: {errtxt.strip()[-200:]}"
        print(
            f"# preflight attempt {attempt + 1}/{len(timeouts)} failed: {err}",
            file=sys.stderr,
        )
        if attempt + 1 < len(timeouts):
            time.sleep(5)
    return err


def preflight_with_cooldown(
    cooldown_s: float | None = None, sleep=time.sleep
) -> str | None:
    """Preflight with ONE bounded cooldown-retry cycle (VERDICT r4 missing
    #1b). The wedged relay observed in rounds 3/4 self-heals in ~10 min
    (ROUND4.md environment lore); a single retry after a cooldown gives the
    driver's end-of-round capture a second shot at the window without
    reintroducing round 3's unbounded envelope. Worst case:
    ~2.6 min (first cycle) + cooldown (default 7 min) + 60 s (retry) ≈ 11
    min — and unlike round 3, a final failure now carries stale_last_good,
    so even the worst case is informative. Set
    PSVO_TPU_PREFLIGHT_COOLDOWN_S=0 to disable the retry."""
    err = device_preflight()
    if err is None:
        return None
    if cooldown_s is None:
        cooldown_s = float(os.environ.get("PSVO_TPU_PREFLIGHT_COOLDOWN_S", "420"))
    if cooldown_s <= 0:
        return err
    print(
        f"# preflight failed ({err}); cooling down {cooldown_s:.0f}s for the "
        "~10-min relay self-heal before one retry",
        file=sys.stderr,
    )
    sleep(cooldown_s)
    return device_preflight(timeouts=(60.0,))


def stale_last_good(blob_path: str = "BENCH_ALL.json", blob_text: str | None = None):
    """Primary row of the last COMMITTED canonical blob, for embedding in a
    preflight-failure JSON (VERDICT r4 missing #1a: two straight rounds of
    driver-stamped nulls while a builder-captured, equivalence-bitted blob
    sat on disk — the driver artifact should never be information-free).

    Reads `git show HEAD:BENCH_ALL.json` (the committed blob — the working
    tree copy could be a mid-write partial), falling back to the on-disk
    file. Returns None when no parseable blob with a primary row exists.
    `blob_text` injects content for tests."""
    import subprocess

    text = blob_text
    if text is None:
        try:
            r = subprocess.run(
                ["git", "show", f"HEAD:{blob_path}"],
                cwd=_REPO_ROOT,
                capture_output=True,
                text=True,
                timeout=10,
            )
            if r.returncode == 0:
                text = r.stdout
        except Exception:
            pass
    if text is None:
        try:
            with open(os.path.join(_REPO_ROOT, blob_path)) as f:
                text = f.read()
        except OSError:
            return None
    try:
        blob = json.loads(text)
        row = blob["rows"][blob.get("primary", "fhn_fivo_k1024_bench")]
    except (ValueError, KeyError, TypeError):
        return None
    out = {
        "stale": True,
        "metric": row.get("metric"),
        "value": row.get("value"),
        "unit": row.get("unit"),
        "step_time_ms": row.get("step_time_ms"),
        "row_timestamp": row.get("timestamp"),
        "git_sha": blob.get("git_sha"),
        "blob_timestamp": blob.get("timestamp"),
    }
    for bit in ("device_equiv_ok", "kernel_rng_equiv_ok", "trunk_rng_equiv_ok"):
        if bit in blob:
            out[bit] = blob[bit]
    return out


def preflight_failure_blob(
    err: str, metric_suffix: str, metric: str | None = None, unit: str = "steps/s"
) -> dict:
    """The honest-failure JSON line: bounded diagnostics + the last-good
    committed primary row, so a wedged relay at driver-capture time no
    longer yields a zero-information artifact. `metric` overrides the
    throughput-style name for modes whose success artifact is a different
    metric (--to-target emits seconds_to_test_elbo_*; a failure row must
    carry the same name so the driver attributes the outage correctly —
    round-5 review finding). stale_last_good always embeds the committed
    PRIMARY throughput row (it names its own metric), whatever mode failed."""
    fail = {
        "metric": metric or f"train_steps_per_sec_{metric_suffix}",
        "value": 0,
        "unit": unit,
        "vs_baseline": None,
        "error": f"accelerator unreachable: {err}",
        **run_metadata(),
    }
    stale = stale_last_good()
    if stale is not None:
        fail["stale_last_good"] = stale
    return fail


def run_with_watchdog(argv: list[str], deadline_s: float) -> int:
    """Re-exec the bench under a killable global deadline (round-5 lore:
    on 2026-08-21 a relay wedge hit AFTER a passing preflight and hung the
    measurement itself — which no in-process guard can interrupt, since
    the blocked value fetch never returns to Python). The child runs the
    real bench with stdout/stderr INHERITED (no pipes — a pipe-holding
    grandchild cannot wedge the parent, and the driver sees every line
    live); on expiry the parent SIGKILLs the child's process GROUP and
    prints the honest failure JSON itself, with stale_last_good and — for
    --all — the crash-safe partial blob's already-measured rows.

    Returns the exit code to pass to sys.exit. The child is marked via
    PSVO_TPU_BENCH_CHILD so it never recurses."""
    import signal
    import subprocess

    env = dict(os.environ)
    env["PSVO_TPU_BENCH_CHILD"] = "1"
    p = subprocess.Popen(
        [sys.executable, *argv], start_new_session=True, env=env
    )
    try:
        return p.wait(timeout=deadline_s)
    except subprocess.TimeoutExpired:
        try:
            os.killpg(os.getpgid(p.pid), signal.SIGKILL)
        except (ProcessLookupError, PermissionError):
            p.kill()
        try:
            p.wait(timeout=10)
        except subprocess.TimeoutExpired:
            pass
        fail = {
            "metric": "train_steps_per_sec_fhn_fivo_k1024_bench",
            "value": 0,
            "unit": "steps/s",
            "vs_baseline": None,
            "error": (
                f"bench hung mid-run past the {deadline_s:.0f}s watchdog "
                "deadline (relay wedged after a passing preflight?); child "
                "process group killed"
            ),
            **run_metadata(),
        }
        stale = stale_last_good()
        if stale is not None:
            fail["stale_last_good"] = stale
        if "--all" in argv:
            # the crash-safe blob holds every row measured before the hang
            try:
                with open(os.path.join(os.getcwd(), "BENCH_ALL.json")) as f:
                    partial = json.load(f)
                rows = partial.get("rows") or {}
                if rows:
                    fail["partial_rows_measured"] = {
                        name: row.get("value") for name, row in rows.items()
                    }
            except (OSError, ValueError):
                pass
        print(json.dumps(fail))
        return 1


def run_metadata() -> dict:
    """{git_sha, timestamp} provenance stamped into every blob (VERDICT r3
    weak #5: the canonical evidence must say when/at which commit it was
    taken, now that driver capture can fail and partial blobs survive)."""
    import subprocess

    sha = "unknown"
    try:
        r = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=_REPO_ROOT,
            capture_output=True,
            text=True,
            timeout=10,
        )
        sha = r.stdout.strip() or "unknown"
    except Exception:
        pass
    return {
        "git_sha": sha,
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }


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


def measure(
    cfg, steps: int = 30, adaptive: bool = False, params=None, regime: str | None = None
) -> dict:
    """Measure one config's jitted train-step throughput.

    Returns the machine-readable row: median + per-window steps/s, step
    time, analytic FLOP/s and GB/s, timestamp (+ regime label when given —
    e.g. the K=8192 row's kernel branch depends on the weight regime,
    VERDICT r3 missing #5). With adaptive=True the window length is
    re-chosen from a short probe so every row gets ~2 s windows regardless
    of its per-step cost (K=8192 vs K=16 differ by ~100×). `params`
    overrides the fresh initialization (trained-regime rows).
    """
    from psvo_tpu.data import generate_dataset
    from psvo_tpu.models.ssm import init_ssm
    from psvo_tpu.train import make_optimizer, make_train_step

    dataset = generate_dataset(cfg.data, cfg.seed)
    ssm, init_params = init_ssm(cfg, run_key(cfg))
    if params is None:
        params = init_params
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

    state = {"p": p, "s": s, "i": 3, "m": m}

    def one_step():
        state["p"], state["s"], m = train_step(
            state["p"], state["s"], _key(state["i"]), batch
        )
        state["i"] += 1
        state["m"] = m
        return m["loss"]

    if adaptive:
        est = _time_loop(one_step, 3)
        # dispatch-bound rows (sub-2 ms steps) get 4 s windows: at 2 s a
        # single relay hiccup moved the IWAE K=16 row's windows ±15%
        # (VERDICT r4 weak #5) — double the averaging where steps are cheap
        # (est times one CALL = n_call steps). No caller-steps cap: the old
        # `min(steps, ...)` clamped fast rows to 30 calls, so the window
        # target was unreachable exactly where it mattered (round-5 review
        # finding — the 4 s branch was dead code under the cap)
        target_s = 4.0 if est / n_call < 2e-3 else 2.0
        steps = max(5, int(target_s / max(est, 1e-4)) + 1)

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
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    if regime is not None:
        row["regime"] = regime
    if "ess_mean" in state["m"]:
        # the measured kernel branch at large K depends on the weight regime
        # (degenerate-init → compact-gather; trained → windowed fast path) —
        # record the evidence next to the label
        row["ess_mean"] = round(float(state["m"]["ess_mean"]), 2)
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


# ---------------------------------------------------------------------------
# On-device correctness smoke (VERDICT r3 missing #2)
# ---------------------------------------------------------------------------


def device_equiv_check(
    preset_name: str = "fhn_fivo_k1024_bench", n_steps: int = 3
) -> tuple[bool, str]:
    """Fused-vs-unfused equivalence ON THE ATTACHED DEVICE.

    The test suite forces CPU (tests/conftest.py) and runs the Pallas kernels
    in interpret mode, which does not catch Mosaic lowering breaks (commit
    f289740 precedent). This smoke runs a few REAL train steps of the primary
    config twice — whole-scan megakernel + resample kernel on, then the pure
    jnp scan — and compares per-step losses (= logZ path) and gradient norms.
    Both paths consume identical noise streams by construction, so tolerances
    are ordinary f32 accumulation-order slack (the CPU equivalence tests pass
    at loss rtol 2e-4 / grad rtol 5e-3; device tolerances are one notch
    looser to absorb MXU-vs-VPU reduction orders).

    Returns (ok, detail).
    """
    import dataclasses

    from psvo_tpu.config import preset
    from psvo_tpu.data import generate_dataset
    from psvo_tpu.models.ssm import init_ssm
    from psvo_tpu.train import make_optimizer, make_train_step

    base = preset(preset_name)
    base = dataclasses.replace(
        base,
        train=dataclasses.replace(base.train, steps_per_call=1),
        # kernel_rng draws different streams than the jnp path by
        # construction — pin it off so fused-vs-unfused is bit-comparable;
        # the kernel_rng path has its own replay-based check
        # (kernel_rng_equiv_check), run alongside when the preset uses it
        smc=dataclasses.replace(base.smc, kernel_rng=False),
    )
    out: dict[bool, tuple[list[float], list[float]]] = {}
    for fused in (True, False):
        cfg = dataclasses.replace(
            base,
            name=f"{base.name}_equiv_{'fused' if fused else 'unfused'}",
            use_pallas=fused,
            use_pallas_step=fused,
            use_pallas_resample=fused,
        )
        dataset = generate_dataset(cfg.data, cfg.seed)
        ssm, params = init_ssm(cfg, run_key(cfg))
        optimizer = make_optimizer(cfg)
        opt_state = optimizer.init(params)
        step = make_train_step(ssm, cfg, optimizer)
        batch = jnp.asarray(dataset.obs_train[: cfg.train.batch_size])
        key = run_key(cfg, 1)
        losses, gnorms = [], []
        for i in range(n_steps):
            params, opt_state, m = step(
                params, opt_state, jax.random.fold_in(key, i), batch
            )
            losses.append(float(m["loss"]))
            gnorms.append(float(m["grad_norm"]))
        out[fused] = (losses, gnorms)
    lf, gf = out[True]
    lu, gu = out[False]
    loss_ok = bool(np.allclose(lf, lu, rtol=1e-3, atol=1e-3))
    grad_ok = bool(np.allclose(gf, gu, rtol=5e-2, atol=1e-3))
    detail = (
        f"loss fused={[round(v, 4) for v in lf]} unfused={[round(v, 4) for v in lu]} "
        f"grad_norm fused={[round(v, 4) for v in gf]} unfused={[round(v, 4) for v in gu]}"
    )
    ok = loss_ok and grad_ok
    print(f"# device_equiv {'OK' if ok else 'MISMATCH'}: {detail}", file=sys.stderr)
    if not ok:
        print(
            "# DEVICE EQUIVALENCE FAILURE: the fused Pallas path disagrees "
            "with the unfused scan ON THIS DEVICE — a Mosaic lowering "
            "regression the CPU suite cannot see. The throughput numbers "
            "below time a kernel that computes the wrong thing.",
            file=sys.stderr,
        )
    return ok, detail


def kernel_rng_equiv_check(
    preset_name: str = "fhn_fivo_k1024_bench",
) -> tuple[bool, str]:
    """On-device equivalence of the in-kernel-RNG megakernel (TPU only).

    cfg.smc.kernel_rng draws ε/u from the hardware PRNG inside the kernels,
    so its streams cannot bit-match the jnp path. Instead the check replays
    the KERNEL'S OWN streams through the unfused jnp scan: the extractor
    kernel (pallas_step.generate_stream_noise — same helpers, same grid
    blocking, same draw order) materializes (ε, u), forward_filter's noise
    hook consumes them, and logZ + the full gradient tree must agree. This
    closes the only untested link of the kernel_rng path — that the
    backward kernel regenerates the forward's ε exactly.

    Returns (ok, detail).
    """
    import dataclasses

    from psvo_tpu.config import preset
    from psvo_tpu.data import generate_dataset
    from psvo_tpu.models.ssm import init_ssm
    from psvo_tpu.ops import pallas_step
    from psvo_tpu.smc import forward_filter

    base = preset(preset_name)
    cfg = dataclasses.replace(
        base, smc=dataclasses.replace(base.smc, kernel_rng=True)
    )
    dataset = generate_dataset(cfg.data, cfg.seed)
    ssm, params = init_ssm(cfg, run_key(cfg))
    cfg_u = dataclasses.replace(cfg, use_pallas=False, use_pallas_step=False,
                                use_pallas_resample=False)
    ssm_u, _ = init_ssm(cfg_u, run_key(cfg))
    ys = jnp.asarray(dataset.obs_train[: cfg.train.batch_size])
    key = run_key(cfg, 1)

    def loss_fused(p):
        fr = forward_filter(ssm, p, key, ys, cfg.smc, cache=False)
        return jnp.mean(fr.log_z)

    lf, gf = jax.jit(jax.value_and_grad(loss_fused))(params)

    # replay the kernel's streams: SAME seed derivation as _fused_preamble
    batch, t_steps, _ = ys.shape
    k, dx = cfg.smc.n_particles, ssm.dx
    k0, k_prop, _k_res = jax.random.split(key, 3)
    seeds = jax.random.randint(k_prop, (1, 2), 0, 1 << 24).astype(jnp.float32)
    pd = pallas_step._round_up(max(dx + ssm.di, ssm.dy) + 1, 8)
    eps_pd, u = pallas_step.generate_stream_noise(
        seeds, t_steps - 1, batch, pd, k, dx
    )
    noise = (
        jax.random.normal(k0, (batch, dx, k)),
        eps_pd[:, :, :dx, :],
        u,
    )

    def loss_ref(p):
        fr = forward_filter(
            ssm_u, p, key, ys, cfg.smc, cache=False, noise=noise
        )
        return jnp.mean(fr.log_z)

    lu, gu = jax.jit(jax.value_and_grad(loss_ref))(params)

    return _grads_agree(lf, lu, gf, gu, "kernel_rng_equiv")


def _grads_agree(lf, lu, gf, gu, label: str) -> tuple[bool, str]:
    """Shared device-level comparison for the RNG replay checks.

    Tolerance calibration (v5e 2026-08-20): even the NON-rng fused kernel
    vs the unfused scan WITH IDENTICAL streams shows logZ diffs ~0.05 and
    large relative errors on a few gradient entries at the primary config
    — occasional resample-index flips where a u lands within f32 rounding
    of a CDF boundary (tri-matmul cumsum vs jnp cumsum), whose downstream
    trajectories then diverge. Per-leaf allclose is therefore the wrong
    assertion for ANY device-level fused-vs-unfused comparison at scale;
    the meaningful invariants are logZ, the gradient norm, and the
    gradient DIRECTION (cosine) — an ε-regeneration bug would wreck all
    three, an index flip none of them."""
    lf, lu = float(lf), float(lu)
    fa = np.concatenate(
        [np.asarray(x, np.float64).ravel() for x in jax.tree_util.tree_leaves(gf)]
    )
    ua = np.concatenate(
        [np.asarray(x, np.float64).ravel() for x in jax.tree_util.tree_leaves(gu)]
    )
    nf, nu = float(np.linalg.norm(fa)), float(np.linalg.norm(ua))
    cos = float(fa @ ua / max(nf * nu, 1e-30))
    ok = (
        bool(np.allclose(lf, lu, rtol=1e-3, atol=1e-3))
        and abs(nf - nu) <= 1e-2 * max(nf, nu) + 1e-3
        and cos >= 0.99
    )
    detail = (
        f"logZ kernel_rng={lf:.4f} replayed={lu:.4f} "
        f"grad_norm {nf:.4f} vs {nu:.4f} cosine={cos:.6f}"
    )
    print(f"# {label} {'OK' if ok else 'MISMATCH'}: {detail}", file=sys.stderr)
    return ok, detail


def trunk_rng_equiv_check(
    preset_name: str = "lorenz96_fivo_k8192_sharded",
    k: int = 2048,
    t_steps: int = 20,
) -> tuple[bool, str]:
    """On-device equivalence of the in-kernel-RNG trunk path (TPU only):
    the extractor kernel (pallas_trunk.generate_trunk_noise) materializes
    the exact per-tile ε draws and the unfused jnp scan replays them via
    forward_filter's noise hook — logZ, grad norm, and gradient cosine
    must agree (the kernel_rng_equiv_check contract; per-leaf allclose is
    the wrong assertion on device — see that function's calibration note).

    Runs at reduced K/T by default: the kernel code is shape-generic
    (same tile math at every grid size — K=2048 still spans 2 K-tiles at
    PD=48), and the full-size UNFUSED replay compile killed the remote
    compile server (broken pipe after ~20 min, v5e 2026-08-20).
    """
    import dataclasses

    from psvo_tpu.config import preset
    from psvo_tpu.data import generate_dataset
    from psvo_tpu.models.ssm import init_ssm
    from psvo_tpu.ops import pallas_trunk
    from psvo_tpu.ops import resampling as resampling_mod
    from psvo_tpu.smc import forward_filter

    base = preset(preset_name)
    cfg = dataclasses.replace(
        base,
        smc=dataclasses.replace(base.smc, kernel_rng=True, n_particles=k),
        data=dataclasses.replace(
            base.data, t_steps=t_steps, n_train=16, n_test=8
        ),
        mesh=dataclasses.replace(base.mesh, data=1, particle=1),
    )
    dataset = generate_dataset(cfg.data, cfg.seed)
    ssm, params = init_ssm(cfg, run_key(cfg))
    cfg_u = dataclasses.replace(cfg, use_pallas=False, use_pallas_step=False,
                                use_pallas_resample=False)
    ssm_u, _ = init_ssm(cfg_u, run_key(cfg))
    ys = jnp.asarray(dataset.obs_train[: cfg.train.batch_size])
    key = run_key(cfg, 1)

    def loss_fused(p):
        return jnp.mean(forward_filter(ssm, p, key, ys, cfg.smc, cache=False).log_z)

    lf, gf = jax.jit(jax.value_and_grad(loss_fused))(params)

    # replay: SAME seed/stream derivation as _fused_preamble("trunk")
    batch, t_steps, _ = ys.shape
    k, dx = cfg.smc.n_particles, ssm.dx
    k0, k_prop, k_res = jax.random.split(key, 3)
    seeds = jax.random.randint(k_prop, (2,), 0, 1 << 24).astype(jnp.float32)
    ts = jnp.arange(t_steps - 1, dtype=jnp.float32)
    seeds_t = jnp.concatenate(
        [
            jnp.broadcast_to(seeds[None], (t_steps - 1, 2)),
            ts[:, None],
            jnp.zeros((t_steps - 1, 1), jnp.float32),
        ],
        axis=1,
    )
    from psvo_tpu.ops.pallas_resample import _round_up

    pd = _round_up(max(dx + ssm.di, ssm.dy) + 1, 8)
    eps_pd = pallas_trunk.generate_trunk_noise(seeds_t, batch, pd, k, dx)
    noise = (
        jax.random.normal(k0, (batch, dx, k)),
        eps_pd[:, :, :dx, :],
        resampling_mod.bulk_positions(
            k_res, t_steps - 1, batch, k, cfg.smc.resampling
        ),
    )

    def loss_ref(p):
        return jnp.mean(
            forward_filter(ssm_u, p, key, ys, cfg.smc, cache=False, noise=noise).log_z
        )

    lu, gu = jax.jit(jax.value_and_grad(loss_ref))(params)
    return _grads_agree(lf, lu, gf, gu, "trunk_rng_equiv")


# ---------------------------------------------------------------------------
# Trained-regime params for the K=8192 row (VERDICT r3 missing #5)
# ---------------------------------------------------------------------------


def save_params_npz(params, path: str) -> None:
    """Flat .npz snapshot of a params pytree (keyed by tree path)."""
    from jax.tree_util import keystr, tree_flatten_with_path

    leaves, _ = tree_flatten_with_path(params)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez(path, **{keystr(kp): np.asarray(v) for kp, v in leaves})


def load_params_npz(params_template, path: str):
    """Rebuild a params pytree from a flat .npz against a same-structure
    template (shapes must match — it's a snapshot, not a checkpoint)."""
    from jax.tree_util import keystr, tree_flatten_with_path, tree_unflatten

    data = np.load(path)
    leaves, treedef = tree_flatten_with_path(params_template)
    new = []
    for kp, leaf in leaves:
        arr = data[keystr(kp)]
        if arr.shape != np.shape(leaf):
            raise ValueError(
                f"{path}: leaf {keystr(kp)} has shape {arr.shape}, "
                f"template wants {np.shape(leaf)}"
            )
        new.append(jnp.asarray(arr))
    return tree_unflatten(treedef, new)


def l96_trained_params(cfg, pretrain_steps: int = 300):
    """Params for the trained-regime K=8192 row.

    Fresh-init weights put the L96 filter at mean ESS ≈ 1.3, so the fresh
    row 5 measures the compact-gather branch built for that pathology — not
    the windowed fast path real training exercises after warm-up. Loads the
    committed snapshot (checkpoints/l96_pretrained.npz) when present; else
    pretrains briefly at K=512 (params are K-independent — only net shapes
    matter) and saves the snapshot for future rounds.
    """
    import dataclasses

    from psvo_tpu.models.ssm import init_ssm
    from psvo_tpu.train import make_optimizer, make_train_step
    from psvo_tpu.data import generate_dataset

    _, template = init_ssm(cfg, run_key(cfg))
    if os.path.exists(_L96_CKPT):
        try:
            return load_params_npz(template, _L96_CKPT)
        except Exception as e:  # shape drift after a config change: retrain
            print(f"# l96 snapshot unusable ({e}); pretraining", file=sys.stderr)

    pre = dataclasses.replace(
        cfg,
        name="l96_pretrain",
        smc=dataclasses.replace(cfg.smc, n_particles=512),
        mesh=dataclasses.replace(cfg.mesh, data=1, particle=1),
        train=dataclasses.replace(cfg.train, steps_per_call=1),
    )
    dataset = generate_dataset(pre.data, pre.seed)
    ssm, params = init_ssm(pre, run_key(pre))
    optimizer = make_optimizer(pre)
    opt_state = optimizer.init(params)
    step = make_train_step(ssm, pre, optimizer)
    batch = jnp.asarray(dataset.obs_train[: pre.train.batch_size])
    key = run_key(pre, 1)
    t0 = time.perf_counter()
    for i in range(pretrain_steps):
        params, opt_state, m = step(params, opt_state, jax.random.fold_in(key, i), batch)
    print(
        f"# l96 pretrain: {pretrain_steps} steps K=512 in "
        f"{time.perf_counter()-t0:.1f}s (loss {float(m['loss']):.1f})",
        file=sys.stderr,
    )
    try:
        save_params_npz(params, _L96_CKPT)
        print(f"# wrote {_L96_CKPT}", file=sys.stderr)
    except OSError as e:
        print(f"# could not save l96 snapshot: {e}", file=sys.stderr)
    return params


# ---------------------------------------------------------------------------
# Entry points
# ---------------------------------------------------------------------------


def main(
    preset_name: str = "fhn_fivo_k1024_bench",
    steps: int = 30,
    equiv: bool = True,
) -> int:
    from psvo_tpu.config import preset

    cfg = preset(preset_name)
    equiv_ok, equiv_detail = (None, None)
    krng_ok, krng_detail = (None, None)
    if equiv:
        equiv_ok, equiv_detail = device_equiv_check(preset_name)
        if cfg.smc.kernel_rng:
            # the RNG check must match the PATH the preset runs: the
            # megakernel's scan-mode streams for its shape class, the
            # K-tiled trunk kernel's per-tile streams otherwise (their
            # seed folds differ — replaying the wrong one would report a
            # spurious mismatch, and the trunk check also reduces K/T so
            # the unfused replay compile stays tractable)
            if (
                max(cfg.data.dx + cfg.data.di, cfg.data.dy) <= 7
                and cfg.smc.n_particles <= 2048
            ):
                krng_ok, krng_detail = kernel_rng_equiv_check(preset_name)
            else:
                krng_ok, krng_detail = trunk_rng_equiv_check(preset_name)
    row = measure(cfg, steps)
    base_sps = _numpy_baseline(row, cfg)
    out = _strip(row)
    out["vs_baseline"] = (
        round(row["value"] / base_sps, 2) if base_sps else None
    )
    out.update(run_metadata())
    if equiv_ok is not None:
        out["device_equiv_ok"] = equiv_ok
        if not equiv_ok:
            out["device_equiv_detail"] = equiv_detail
    if krng_ok is not None:
        out["kernel_rng_equiv_ok"] = krng_ok
        if not krng_ok:
            out["kernel_rng_equiv_detail"] = krng_detail
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


def main_all(
    steps: int = 30, out_path: str = "BENCH_ALL.json", equiv: bool = True
) -> int:
    """Measure every BASELINE row in one invocation (VERDICT r2 #8): one
    machine-readable blob per round, so the BASELINE.md table is
    reproducible and per-round regressions are visible. Runs a throwaway
    warmup config first (the first config in a fresh process carries a
    one-off relay warm-up penalty — BASELINE.md methodology note).

    Crash-safe: the blob is rewritten after every row with partial=true —
    a mid-run hang or kill leaves the rows already measured on disk
    (VERDICT r3 missing #1)."""
    import dataclasses

    from psvo_tpu.config import preset

    meta = run_metadata()
    blob: dict = {"partial": True, "rows": {}, **meta}

    def _flush():
        with open(out_path, "w") as f:
            json.dump(blob, f, indent=1)

    warm = dataclasses.replace(
        preset("fhn_fivo_k128"),
        data=dataclasses.replace(preset("fhn_fivo_k128").data, n_train=32, n_test=8),
    )
    print("# warmup (discarded)", file=sys.stderr)
    measure(warm, steps=3)

    if equiv:
        equiv_ok, equiv_detail = device_equiv_check()
        blob["device_equiv_ok"] = equiv_ok
        if not equiv_ok:
            blob["device_equiv_detail"] = equiv_detail
        if preset("fhn_fivo_k1024_bench").smc.kernel_rng:
            krng_ok, krng_detail = kernel_rng_equiv_check()
            blob["kernel_rng_equiv_ok"] = krng_ok
            if not krng_ok:
                blob["kernel_rng_equiv_detail"] = krng_detail
        if preset("lorenz96_fivo_k8192_sharded").smc.kernel_rng:
            trng_ok, trng_detail = trunk_rng_equiv_check()
            blob["trunk_rng_equiv_ok"] = trng_ok
            if not trng_ok:
                blob["trunk_rng_equiv_detail"] = trng_detail
        _flush()

    primary_vs = None
    for name in ALL_ROWS:
        cfg = preset(name)
        regime = "degenerate-init" if name == "lorenz96_fivo_k8192_sharded" else None
        row = measure(cfg, steps, adaptive=True, regime=regime)
        if name == "fhn_fivo_k1024_bench":
            base = _numpy_baseline(row, cfg)
            primary_vs = round(row["value"] / base, 2) if base else None
        blob["rows"][name] = _strip(row)
        print(f"#row {json.dumps(blob['rows'][name])}", file=sys.stderr)
        _flush()

    # trained-regime K=8192 row: realistic ESS exercises the windowed fast
    # path instead of the degenerate-init compact-gather branch
    cfg5 = preset("lorenz96_fivo_k8192_sharded")
    trained = l96_trained_params(cfg5)
    cfg5t = dataclasses.replace(cfg5, name="lorenz96_fivo_k8192_trained")
    blob["rows"]["lorenz96_fivo_k8192_trained"] = _strip(
        measure(cfg5t, steps, adaptive=True, params=trained, regime="trained")
    )
    print(
        f"#row {json.dumps(blob['rows']['lorenz96_fivo_k8192_trained'])}",
        file=sys.stderr,
    )
    _flush()

    # informational row: large K in a HEALTHY-ESS regime. At D=40 the ESS
    # stays O(1) no matter how trained the weights are (measured: fresh-init
    # 1.26, 2000-step-pretrained 4.68 — high-dimensional weight degeneracy
    # is intrinsic), so BOTH K=8192 L96 rows exercise the compact-gather
    # branch; this dx=3 row is where the windowed sorted-index movement
    # path actually serves at K=8192.
    l63k8 = dataclasses.replace(
        preset("lorenz63_psvo_k1024"),
        name="lorenz63_fivo_k8192",
        smc=dataclasses.replace(
            preset("lorenz63_psvo_k1024").smc,
            objective="fivo",
            n_particles=8192,
            kernel_rng=False,
        ),
        train=dataclasses.replace(
            preset("lorenz63_psvo_k1024").train,
            batch_size=8,
            steps_per_call=1,
        ),
        data=dataclasses.replace(
            preset("lorenz63_psvo_k1024").data, n_train=16, n_test=8
        ),
    )
    blob["rows"]["lorenz63_fivo_k8192"] = _strip(
        measure(l63k8, steps, adaptive=True, regime="windowed-healthy-ess")
    )
    print(
        f"#row {json.dumps(blob['rows']['lorenz63_fivo_k8192'])}",
        file=sys.stderr,
    )
    _flush()

    # long-T row (VERDICT r4 missing #2): L63 PSVO at T=1025 with the
    # fused segmented forward (8 segments, megakernel per segment under
    # jax.checkpoint). The long-sequence story's hardware evidence: at
    # this size both modes fit (segmented trades ~1.75× step time for the
    # bounded O(T/S) forward residuals); at T=8193 the unsegmented step
    # needs 24.25 GB and cannot compile while this path runs at ~1019
    # ms/step in 13.4 GB (PARITY.md round-5 long-T table).
    longt = dataclasses.replace(
        preset("lorenz63_psvo_k1024"),
        name="lorenz63_psvo_k1024_t1025_seg8",
        data=dataclasses.replace(
            preset("lorenz63_psvo_k1024").data,
            t_steps=1025, n_train=16, n_test=8,
        ),
        smc=dataclasses.replace(
            preset("lorenz63_psvo_k1024").smc, ffbsi_segments=8
        ),
        train=dataclasses.replace(
            preset("lorenz63_psvo_k1024").train,
            batch_size=8, steps_per_call=1,
        ),
    )
    blob["rows"]["lorenz63_psvo_k1024_t1025_seg8"] = _strip(
        measure(longt, steps, adaptive=True, regime="long-T-segmented")
    )
    print(
        f"#row {json.dumps(blob['rows']['lorenz63_psvo_k1024_t1025_seg8'])}",
        file=sys.stderr,
    )
    _flush()

    # informational row: SVO at M=64 — the fused whole-sweep kernel's
    # regime (ops/pallas_svo.py is flat in M and gated to M ≥ 32; the
    # M=16 preset row above keeps the measured-faster scan path)
    svo64 = dataclasses.replace(
        preset("lorenz63_svo_k256"),
        name="lorenz63_svo_k256_m64",
        smc=dataclasses.replace(
            preset("lorenz63_svo_k256").smc, n_smoothing_particles=64
        ),
    )
    blob["rows"]["lorenz63_svo_k256_m64"] = _strip(
        measure(svo64, steps, adaptive=True, regime="fused-sweep")
    )
    print(
        f"#row {json.dumps(blob['rows']['lorenz63_svo_k256_m64'])}",
        file=sys.stderr,
    )
    _flush()

    # the B=128 batch-scaling row (BASELINE.md tracks traj-steps/s here)
    b128 = dataclasses.replace(
        preset("fhn_fivo_k1024_bench"), name="fhn_fivo_k1024_b128"
    )
    b128 = dataclasses.replace(
        b128,
        train=dataclasses.replace(b128.train, batch_size=128),
        data=dataclasses.replace(b128.data, n_train=256),
    )
    blob["rows"]["fhn_fivo_k1024_b128"] = _strip(measure(b128, steps, adaptive=True))
    print(f"#row {json.dumps(blob['rows']['fhn_fivo_k1024_b128'])}", file=sys.stderr)
    _flush()  # crash-safety covers EVERY row — to_target trains for a while

    # wall-clock-to-target-ELBO IN the per-round blob (VERDICT r3 #4);
    # compiles are warm by now so this is ~15 s of training
    try:
        blob["to_target"] = measure_to_target()
    except Exception as e:  # a failed training run must not void the rows
        blob["to_target"] = {"error": str(e)[:300]}
    _flush()

    device = jax.devices()[0]
    blob["device"] = f"{device.platform}:{device.device_kind}"
    blob["primary"] = "fhn_fivo_k1024_bench"
    blob["vs_baseline"] = primary_vs
    blob["partial"] = False
    _flush()
    print(f"# wrote {out_path}", file=sys.stderr)
    primary = dict(blob["rows"]["fhn_fivo_k1024_bench"])
    primary["vs_baseline"] = primary_vs
    primary.update(meta)
    for bit in ("device_equiv_ok", "kernel_rng_equiv_ok", "trunk_rng_equiv_ok"):
        if bit in blob:
            primary[bit] = blob[bit]
    print(json.dumps(primary))
    return 0


def measure_to_target(
    preset_name: str = "fhn_fivo_k1024_bench",
    target_elbo: float = -15.0,
    max_steps: int = 3000,
    eval_every: int = 50,
) -> dict:
    """The second half of the BASELINE.json metric — wall-clock (and steps)
    to reach a fixed held-out ELBO on the primary config, from scratch at a
    fixed seed (VERDICT r3 missing #4; last measured in round 2).

    Times THE CANONICAL Trainer loop, driven in eval_every-sized chunks
    with a target-stop between chunks — an earlier hand-rolled loop here
    walked a different key chain and (before review) fed each jitted call
    one repeated minibatch; the repeat was a real comparability bug, and
    the rewritten distinct-batch loop then diverged at seed 0 while the
    real Trainer converges (test ELBO −15.3 by step 600, verified on
    device) — reimplementing training semantics for a metric about
    training semantics was the mistake. Reports total seconds (incl.
    compile) and steady seconds (excluding the first chunk, which carries
    compile; the persistent cache amortizes it across runs)."""
    import dataclasses

    from psvo_tpu.config import preset
    from psvo_tpu.data import generate_dataset
    from psvo_tpu.models.ssm import init_ssm
    from psvo_tpu.train import Trainer

    cfg = preset(preset_name)
    spc = max(int(cfg.train.steps_per_call), 1)
    if eval_every % spc:
        eval_every = -(-eval_every // spc) * spc
    cfg = dataclasses.replace(
        cfg,
        train=dataclasses.replace(
            cfg.train,
            eval_every=eval_every,
            save_every=max_steps,
            n_steps=max_steps,
            patience=10**6,  # the target-stop below is the only stop
            # chunked driving would otherwise snap params back to the best
            # snapshot at every chunk boundary (Trainer.run's keep_best
            # epilogue) — a different trajectory than one long run
            keep_best=False,
        ),
    )

    dataset = generate_dataset(cfg.data, cfg.seed)
    ssm, params = init_ssm(cfg, run_key(cfg))
    trainer = Trainer(cfg, ssm, params)

    t0 = time.perf_counter()
    t_first = None
    reached = None
    while trainer.state.step < max_steps:
        trainer.run(
            dataset.obs_train,
            dataset.obs_test,
            n_steps=min(trainer.state.step + eval_every, max_steps),
        )
        if t_first is None:
            t_first = time.perf_counter()
        elbo = trainer.history[-1]["test_elbo"]
        if elbo >= target_elbo:
            reached = elbo
            break

    t_end = time.perf_counter()
    return {
        "metric": f"seconds_to_test_elbo_{target_elbo:g}_{cfg.name}",
        "value": round(t_end - t0, 2),
        "unit": "s",
        "seconds_steady": round(t_end - (t_first or t0), 2),
        "steps": trainer.state.step,
        "test_elbo": reached,
        "reached": reached is not None,
        "eval_every": eval_every,
        **run_metadata(),
    }


def main_to_target(
    preset_name: str = "fhn_fivo_k1024_bench", target_elbo: float = -15.0
) -> int:
    out = measure_to_target(preset_name, target_elbo)
    print(json.dumps(out))
    return 0 if out["reached"] else 1

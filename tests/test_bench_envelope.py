"""Bench envelope hardening tests (VERDICT r3 missing #1, ADVICE r3).

The round-3 driver bench produced a null blob because a wedged TPU relay
hung the capture and the recovery path ate the budget. These tests pin the
round-4 guarantees WITHOUT a device: the preflight gives up within its
bounded envelope even when a grandchild inherits its pipes (the exact wedge
scenario), a CPU-fallback probe is a failure rather than a silently wrong
measurement, and `bench --all` leaves measured rows on disk when a later
row dies.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from psvo_tpu import benchmark

pytestmark = pytest.mark.fast


# --- device_preflight ------------------------------------------------------


def test_preflight_simulated_wedge_bounded():
    """A probe that never answers — and leaves a grandchild holding our
    stdout pipe — must fail within the envelope, not hang the drain."""
    wedge = (
        "import subprocess, sys, time\n"
        # grandchild in its own session, inheriting stdout/stderr: survives
        # the child's killpg and holds the pipes open (ADVICE r3 medium)
        "subprocess.Popen([sys.executable, '-c', 'import time; time.sleep(60)'],\n"
        "                 start_new_session=True)\n"
        "time.sleep(60)\n"
    )
    t0 = time.perf_counter()
    err = benchmark.device_preflight(timeouts=(1.0, 1.0), probe_src=wedge)
    elapsed = time.perf_counter() - t0
    assert err is not None and "exceeded" in err
    # 2 × (1 s timeout + ≤5 s drain) + 5 s sleep + slack
    assert elapsed < 25.0, f"preflight took {elapsed:.1f}s on a wedged probe"


def test_preflight_cpu_fallback_is_failure():
    """A probe that ran on CPU when an accelerator was expected must fail
    (a silent CPU-fallback JAX init would otherwise bench the wrong device,
    ADVICE r3 low) — and pass when CPU is explicitly allowed."""
    fake_cpu = "print('PREFLIGHT_OK cpu 1.0')\n"
    err = benchmark.device_preflight(
        timeouts=(5.0,), probe_src=fake_cpu, allow_cpu=False
    )
    assert err is not None and "cpu" in err
    ok = benchmark.device_preflight(
        timeouts=(5.0,), probe_src=fake_cpu, allow_cpu=True
    )
    assert ok is None


def test_preflight_healthy_probe_passes():
    err = benchmark.device_preflight(
        timeouts=(10.0,), probe_src="print('PREFLIGHT_OK tpu 2.0')\n"
    )
    assert err is None


def test_preflight_error_rc_reported():
    err = benchmark.device_preflight(
        timeouts=(5.0, 5.0),
        probe_src="import sys; print('boom', file=sys.stderr); sys.exit(3)\n",
    )
    assert err is not None and "rc=3" in err and "boom" in err


# --- stale_last_good + cooldown retry (VERDICT r4 missing #1) --------------


def test_stale_last_good_from_committed_blob():
    """The repo's committed BENCH_ALL.json must yield a stale payload with
    value, provenance, and the on-device equivalence bits."""
    out = benchmark.stale_last_good()
    assert out is not None and out["stale"] is True
    assert out["value"] > 0 and out["unit"] == "steps/s"
    assert out["metric"].startswith("train_steps_per_sec_")
    assert out["git_sha"] and out["row_timestamp"]
    assert out["device_equiv_ok"] is True


def test_stale_last_good_injected_and_garbage():
    blob = {
        "primary": "p",
        "rows": {"p": {"metric": "train_steps_per_sec_p", "value": 7.5,
                       "unit": "steps/s", "timestamp": "t1"}},
        "git_sha": "abc1234",
        "timestamp": "t0",
        "device_equiv_ok": True,
    }
    out = benchmark.stale_last_good(blob_text=json.dumps(blob))
    assert out["value"] == 7.5 and out["git_sha"] == "abc1234"
    # unparseable / structurally wrong content → None, not a crash
    assert benchmark.stale_last_good(blob_text="not json{") is None
    assert benchmark.stale_last_good(blob_text='{"rows": {}}') is None


def test_preflight_failure_blob_carries_stale_payload():
    """The simulated-wedge failure JSON must embed the last committed
    primary row (the round-5 contract: driver artifacts are never
    information-free when a canonical blob exists)."""
    fail = benchmark.preflight_failure_blob(
        "device roundtrip exceeded 60s (relay wedged?)", "fhn_fivo_k1024_bench"
    )
    assert fail["value"] == 0 and "unreachable" in fail["error"]
    assert fail["metric"] == "train_steps_per_sec_fhn_fivo_k1024_bench"
    sl = fail["stale_last_good"]
    assert sl["stale"] is True and sl["value"] > 0 and sl["git_sha"]


def test_preflight_with_cooldown_retries_once(monkeypatch):
    """First cycle fails → one bounded cooldown sleep → one more cycle;
    success on the retry clears the error, a second failure is final."""
    calls = {"n": 0}
    slept = []

    def flaky_preflight(timeouts=(90.0, 60.0), **kw):
        calls["n"] += 1
        return "wedged" if calls["n"] == 1 else None

    monkeypatch.setattr(benchmark, "device_preflight", flaky_preflight)
    err = benchmark.preflight_with_cooldown(cooldown_s=3.0, sleep=slept.append)
    assert err is None and calls["n"] == 2 and slept == [3.0]

    calls["n"] = 0
    monkeypatch.setattr(
        benchmark, "device_preflight", lambda **kw: "still wedged"
    )
    err = benchmark.preflight_with_cooldown(cooldown_s=1.0, sleep=slept.append)
    assert err == "still wedged"
    # cooldown_s=0 disables the retry entirely
    calls2 = {"n": 0}

    def count(**kw):
        calls2["n"] += 1
        return "wedged"

    monkeypatch.setattr(benchmark, "device_preflight", count)
    assert benchmark.preflight_with_cooldown(cooldown_s=0.0) == "wedged"
    assert calls2["n"] == 1


# --- params snapshot roundtrip --------------------------------------------


def test_params_npz_roundtrip(tmp_path):
    params = {
        "f": {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.ones((3,))},
        "scales": (jnp.float32(2.0), jnp.zeros((4,))),
    }
    path = str(tmp_path / "snap.npz")
    benchmark.save_params_npz(params, path)
    template = jax.tree_util.tree_map(jnp.zeros_like, params)
    back = benchmark.load_params_npz(template, path)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params,
        back,
    )


def test_params_npz_shape_mismatch_raises(tmp_path):
    params = {"w": jnp.ones((2, 3))}
    path = str(tmp_path / "snap.npz")
    benchmark.save_params_npz(params, path)
    with pytest.raises(ValueError, match="shape"):
        benchmark.load_params_npz({"w": jnp.ones((4, 3))}, path)


# --- crash-safe partial BENCH_ALL blob ------------------------------------


def test_main_all_partial_blob_survives_crash(tmp_path, monkeypatch):
    """If a row dies mid-run, the rows already measured are on disk with
    partial=true and provenance metadata."""
    calls = {"n": 0}

    def fake_measure(cfg, steps=30, adaptive=False, params=None, regime=None):
        calls["n"] += 1
        if calls["n"] >= 4:  # warmup + 2 rows succeed, 3rd row dies
            raise RuntimeError("relay wedged mid-row")
        row = {
            "metric": f"train_steps_per_sec_{cfg.name}",
            "value": 1.0,
            "unit": "steps/s",
            "timestamp": "t",
            "_final_params": None,
            "_ssm": None,
            "_batch": None,
        }
        if regime is not None:
            row["regime"] = regime
        return row

    monkeypatch.setattr(benchmark, "measure", fake_measure)
    monkeypatch.setattr(benchmark, "device_equiv_check", lambda *a, **k: (True, ""))
    monkeypatch.setattr(benchmark, "kernel_rng_equiv_check", lambda *a, **k: (True, ""))
    monkeypatch.setattr(benchmark, "measure_to_target", lambda *a, **k: {"value": 1.0, "reached": True})
    monkeypatch.setattr(benchmark, "trunk_rng_equiv_check", lambda *a, **k: (True, ""))
    monkeypatch.setattr(benchmark, "_numpy_baseline", lambda row, cfg: None)
    out = str(tmp_path / "BENCH_ALL.json")
    with pytest.raises(RuntimeError, match="wedged"):
        benchmark.main_all(steps=3, out_path=out)
    blob = json.load(open(out))
    assert blob["partial"] is True
    assert blob["device_equiv_ok"] is True
    assert "git_sha" in blob and "timestamp" in blob
    # warmup isn't recorded; the two completed rows are
    assert list(blob["rows"]) == list(benchmark.ALL_ROWS[:2])


def test_main_all_complete_blob(tmp_path, monkeypatch):
    """A full run flips partial=false, labels the K=8192 regimes, and
    carries the trained-regime row."""

    def fake_measure(cfg, steps=30, adaptive=False, params=None, regime=None):
        row = {
            "metric": f"train_steps_per_sec_{cfg.name}",
            "value": 2.0,
            "unit": "steps/s",
            "timestamp": "t",
            "_final_params": None,
            "_ssm": None,
            "_batch": None,
        }
        if regime is not None:
            row["regime"] = regime
        if params is not None:
            row["used_params_override"] = True
        return row

    monkeypatch.setattr(benchmark, "measure", fake_measure)
    monkeypatch.setattr(benchmark, "device_equiv_check", lambda *a, **k: (True, ""))
    monkeypatch.setattr(benchmark, "kernel_rng_equiv_check", lambda *a, **k: (True, ""))
    monkeypatch.setattr(benchmark, "measure_to_target", lambda *a, **k: {"value": 1.0, "reached": True})
    monkeypatch.setattr(benchmark, "trunk_rng_equiv_check", lambda *a, **k: (True, ""))
    monkeypatch.setattr(benchmark, "_numpy_baseline", lambda row, cfg: 0.5)
    monkeypatch.setattr(benchmark, "l96_trained_params", lambda cfg: {"dummy": 1})
    out = str(tmp_path / "BENCH_ALL.json")
    rc = benchmark.main_all(steps=3, out_path=out)
    assert rc == 0
    blob = json.load(open(out))
    assert blob["partial"] is False
    rows = blob["rows"]
    assert rows["lorenz96_fivo_k8192_sharded"]["regime"] == "degenerate-init"
    assert rows["lorenz96_fivo_k8192_trained"]["regime"] == "trained"
    assert rows["lorenz96_fivo_k8192_trained"]["used_params_override"] is True
    assert "fhn_fivo_k1024_b128" in rows
    assert rows["lorenz63_fivo_k8192"]["regime"] == "windowed-healthy-ess"
    assert blob["to_target"]["reached"] is True
    assert blob["vs_baseline"] == 4.0  # 2.0 steps/s vs 0.5 baseline


def test_preflight_failure_blob_to_target_metric():
    """--to-target failures must carry that mode's seconds metric, not the
    throughput name (round-5 review finding)."""
    fail = benchmark.preflight_failure_blob(
        "wedged", "fhn_fivo_k1024_bench",
        metric="seconds_to_test_elbo_-15_fhn_fivo_k1024_bench", unit="s",
    )
    assert fail["metric"] == "seconds_to_test_elbo_-15_fhn_fivo_k1024_bench"
    assert fail["unit"] == "s" and fail["value"] == 0
    # the stale payload still names its own (throughput) metric
    assert fail["stale_last_good"]["metric"].startswith("train_steps_per_sec_")


# --- mid-run watchdog (round-5: wedge AFTER a passing preflight) -----------


def test_watchdog_kills_hung_child_and_reports(capsys):
    """A child that hangs past the deadline is group-killed and the parent
    prints an honest failure JSON with the stale payload."""
    t0 = time.perf_counter()
    rc = benchmark.run_with_watchdog(
        ["-c", "import time; time.sleep(60)"], deadline_s=2.0
    )
    elapsed = time.perf_counter() - t0
    assert rc == 1 and elapsed < 20.0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    fail = json.loads(out)
    assert fail["value"] == 0 and "watchdog" in fail["error"]
    assert fail["stale_last_good"]["value"] > 0


def test_watchdog_passes_through_healthy_child(capsys):
    """A child that finishes in time: its exit code passes through and the
    parent prints nothing extra (the child's own JSON line is the output)."""
    rc = benchmark.run_with_watchdog(
        ["-c", "print('{\"ok\": 1}'); import sys; sys.exit(0)"], deadline_s=30.0
    )
    assert rc == 0
    # parent adds no failure line of its own
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    assert not any("watchdog" in l for l in lines)


def test_watchdog_collects_partial_rows(tmp_path, monkeypatch, capsys):
    """On expiry of an --all run, the crash-safe partial blob's measured
    rows ride the failure JSON."""
    monkeypatch.chdir(tmp_path)
    with open(tmp_path / "BENCH_ALL.json", "w") as f:
        json.dump(
            {"partial": True,
             "rows": {"fhn_fivo_k128": {"value": 351.6, "unit": "steps/s"}}},
            f,
        )
    rc = benchmark.run_with_watchdog(
        ["-c", "import time; time.sleep(60)", "--all"], deadline_s=2.0
    )
    assert rc == 1
    fail = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert fail["partial_rows_measured"] == {"fhn_fivo_k128": 351.6}

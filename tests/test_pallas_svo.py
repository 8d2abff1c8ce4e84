"""Fused SVO backward-sweep kernel equivalence (interpret mode on CPU).

The whole-sweep Pallas kernel (ops/pallas_svo.py) consumes the same bulk ε
stream as the lax.scan body and floors every density term identically, so
the SVO objective's value AND gradients must match the unfused sweep
closely (float reassociation only) — including the smoothed trajectories
and the exogenous-controls variant.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

_FAST = pytest.mark.fast  # <2 min verification subset (VERDICT r3 #7)

from psvo_tpu.config import Config, DataConfig, NetConfig, SMCConfig
from psvo_tpu.models.ssm import init_ssm
from psvo_tpu.objectives import make_objective
from psvo_tpu.ops import pallas_resample, pallas_step, pallas_svo


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setattr(pallas_svo, "_INTERPRET", True)
    monkeypatch.setattr(pallas_step, "_INTERPRET", True)
    monkeypatch.setattr(pallas_resample, "_INTERPRET", True)
    # the production M ≥ 32 floor is a measured perf gate, not a
    # correctness bound — drop it so tiny-M tests exercise the kernel
    monkeypatch.setattr(pallas_svo, "MIN_M", 1)


def _cfg(di=0, m=8, hidden=(16,), dx=2, dy=2):
    net = NetConfig(hidden=hidden)
    return Config(
        name="svo_kernel_test",
        data=DataConfig(datatype="fhn", dx=dx, dy=dy, di=di, t_steps=5),
        smc=SMCConfig(
            objective="svo",
            n_particles=128,
            resampling="systematic",
            n_smoothing_particles=m,
        ),
    ).with_nets(
        q0=net, q1=net, q2=net, f=net, g=dataclasses.replace(net, sigma_init=0.5),
        qb=net,
    )


def _setup(cfg, fused: bool, monkeypatch):
    """Build a runner whose path choice BINDS AT CALL TIME.

    pallas_svo.ENABLE is read when the objective traces, not when it is
    built — a monkeypatch at setup time would be overridden by the next
    _setup call before anything traced, silently comparing fused against
    fused (this exact bug shipped in this file's first version; caught in
    review — the on-device A/B, which set the flag immediately before each
    call, was always genuine)."""
    del monkeypatch  # path choice is per-call, below
    ssm, params = init_ssm(cfg, jax.random.key(0))
    if fused:
        assert pallas_svo.usable(ssm, 8, cfg.smc.n_smoothing_particles)
    obj = make_objective(ssm, cfg)
    ys = jax.random.normal(jax.random.key(1), (8, cfg.data.t_steps, cfg.data.dy))
    ctrl = (
        jax.random.normal(jax.random.key(2), (8, cfg.data.t_steps, cfg.data.di))
        if cfg.data.di
        else None
    )

    def run(p):
        old = pallas_svo.ENABLE
        pallas_svo.ENABLE = fused
        try:
            return obj(p, jax.random.key(3), ys, None, ctrl)
        finally:
            pallas_svo.ENABLE = old

    return params, run


@pytest.mark.parametrize("hidden", [(16,), (16, 16)])
@_FAST
def test_svo_sweep_matches_scan(hidden, monkeypatch):
    cfg = _cfg(hidden=hidden)
    params, run_u = _setup(cfg, fused=False, monkeypatch=monkeypatch)
    _, run_f = _setup(cfg, fused=True, monkeypatch=monkeypatch)

    out_u = run_u(params)
    out_f = run_f(params)
    np.testing.assert_allclose(
        np.asarray(out_f.elbo), np.asarray(out_u.elbo), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(out_f.smoothed), np.asarray(out_u.smoothed), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        float(out_f.metrics["elbo_svo"]),
        float(out_u.metrics["elbo_svo"]),
        rtol=2e-4,
    )

    g_u = jax.grad(lambda p: run_u(p).loss)(params)
    g_f = jax.grad(lambda p: run_f(p).loss)(params)
    flat_f, _ = jax.tree_util.tree_flatten_with_path(g_f)
    flat_u = jax.tree_util.tree_leaves(g_u)
    for (path, a), b in zip(flat_f, flat_u):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-4,
            err_msg=jax.tree_util.keystr(path),
        )


def test_svo_sweep_controls_match_scan(monkeypatch):
    """Di > 0: u_{t+1} rides rows dx:dx+di of the packed sm operand into
    the f trunk — values and gradients must match the scan body."""
    cfg = _cfg(di=2)
    params, run_u = _setup(cfg, fused=False, monkeypatch=monkeypatch)
    _, run_f = _setup(cfg, fused=True, monkeypatch=monkeypatch)
    np.testing.assert_allclose(
        np.asarray(run_f(params).elbo), np.asarray(run_u(params).elbo),
        rtol=2e-4, atol=2e-4,
    )
    g_u = jax.tree_util.tree_leaves(jax.grad(lambda p: run_u(p).loss)(params))
    g_f = jax.tree_util.tree_leaves(jax.grad(lambda p: run_f(p).loss)(params))
    for a, b in zip(g_f, g_u):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-4)


def test_svo_sweep_m_not_multiple_of_lanes(monkeypatch):
    """M=4 pads to 128 lanes; the pad lanes must not leak into values."""
    cfg = _cfg(m=4)
    params, run_u = _setup(cfg, fused=False, monkeypatch=monkeypatch)
    _, run_f = _setup(cfg, fused=True, monkeypatch=monkeypatch)
    np.testing.assert_allclose(
        np.asarray(run_f(params).elbo), np.asarray(run_u(params).elbo),
        rtol=2e-4, atol=2e-4,
    )


def test_svo_sweep_usable_gates():
    cfg = _cfg()
    ssm, _ = init_ssm(cfg, jax.random.key(0))
    assert pallas_svo.usable(ssm, 8, 8)
    assert not pallas_svo.usable(ssm, 7, 8)  # batch % ROW_BLOCK
    # qb_rnn falls back (the GRU summary is not in the kernel's input set)
    cfg_rnn = dataclasses.replace(
        cfg, smc=dataclasses.replace(cfg.smc, qb_rnn=True)
    )
    ssm_rnn, _ = init_ssm(cfg_rnn, jax.random.key(0))
    assert not pallas_svo.usable(ssm_rnn, 8, 8)
    # wide states fall back (qb input must fit one sublane tile)
    cfg_wide = _cfg(dx=4, dy=4)
    ssm_wide, _ = init_ssm(cfg_wide, jax.random.key(0))
    assert not pallas_svo.usable(ssm_wide, 8, 8)

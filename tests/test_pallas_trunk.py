"""K-tiled trunk-kernel equivalence (interpret mode on CPU).

The trunk-fused scan (smc._forward_filter_trunk + ops/pallas_trunk.py) must
reproduce the plain XLA scan body — same RNG keys, same resample kernels —
on values AND gradients, for the large-PD configs the whole-step megakernel
excludes (e.g. Lorenz-96's Dx=40), including multi-K-tile grids, IWAE
(no resampling), ESS-adaptive resampling, and the score-function FIVO
gradient.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

_FAST = pytest.mark.fast  # <2 min verification subset (VERDICT r3 #7)

from psvo_tpu.config import Config, DataConfig, NetConfig, SMCConfig
from psvo_tpu.models.ssm import init_ssm
from psvo_tpu.ops import pallas_resample, pallas_step, pallas_trunk
from psvo_tpu.smc import forward_filter


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setattr(pallas_step, "_INTERPRET", True)
    monkeypatch.setattr(pallas_resample, "_INTERPRET", True)
    monkeypatch.setattr(pallas_trunk, "_INTERPRET", True)
    # the strict per-leaf equivalence below pins the f32 VJP machinery;
    # the production bf16 residual stream has its own bounded-rounding
    # test (test_trunk_bf16_residuals_bounded_rounding)
    monkeypatch.setattr(pallas_trunk, "BF16_RESIDUALS", False)


def _cfg(objective="fivo", k=128, hidden=(16, 16), dx=10, dy=10, t=5, **smc_kw):
    """dx=10 → PD=16 > 8: outside the megakernel box, inside the trunk box."""
    net = NetConfig(hidden=hidden)
    cfg = Config(
        name="trunk_test",
        data=DataConfig(datatype="lorenz96", dx=dx, dy=dy, t_steps=t),
        smc=SMCConfig(
            objective=objective,
            n_particles=k,
            n_smoothing_particles=4,
            **smc_kw,
        ),
    ).with_nets(
        q0=net, q1=net, q2=net, f=net, g=dataclasses.replace(net, sigma_init=0.5),
        qb=net,
    )
    return cfg


def _make_loss(cfg, fused, cache=False, batch=8, controls=None):
    run_cfg = dataclasses.replace(cfg, use_pallas_step=fused)
    ssm, params = init_ssm(run_cfg, jax.random.key(0))
    if fused:
        # the megakernel must NOT supersede (that's what this file tests)
        assert not pallas_step.usable(ssm, run_cfg.smc, batch)
        assert pallas_trunk.usable(ssm, run_cfg.smc, batch)
    ys = jax.random.normal(jax.random.key(1), (batch, cfg.data.t_steps, cfg.data.dy))

    def run(p):
        return forward_filter(
            ssm, p, jax.random.key(3), ys, run_cfg.smc, cache=cache,
            controls=controls,
        )

    return params, run


def _assert_filter_close(got, want, rtol=2e-4, atol=2e-4):
    for name in ("log_z", "increments", "filtered_means", "x_last", "xs", "logws"):
        a, b = getattr(got, name), getattr(want, name)
        if b is None:
            assert a is None
            continue
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=rtol, atol=atol, err_msg=name
        )
    np.testing.assert_allclose(
        np.asarray(got.ess), np.asarray(want.ess), rtol=2e-3, atol=2e-3
    )


@pytest.mark.parametrize("resampling", ["systematic", "multinomial", "none"])
@_FAST
def test_trunk_forward_matches_plain(resampling):
    cfg = _cfg(
        objective="iwae" if resampling == "none" else "fivo",
        resampling=resampling,
    )
    params, run_p = _make_loss(cfg, fused=False, cache=True)
    _, run_f = _make_loss(cfg, fused=True, cache=True)
    _assert_filter_close(run_f(params), run_p(params))


def test_trunk_multi_tile_grid(monkeypatch):
    """K=256 with K_TILE forced to 128: two K tiles per batch block — the
    d_sm / param-grad accumulation across the kt grid axis must be exact."""
    monkeypatch.setattr(pallas_trunk, "K_TILE", 128)
    cfg = _cfg(k=256)
    params, run_p = _make_loss(cfg, fused=False, cache=True)
    _, run_f = _make_loss(cfg, fused=True, cache=True)
    _assert_filter_close(run_f(params), run_p(params))

    def loss(run):
        return lambda p: jnp.mean(run(p).log_z)

    g_f = jax.grad(loss(run_f))(params)
    g_u = jax.grad(loss(run_p))(params)
    for (path, a), b in zip(
        jax.tree_util.tree_flatten_with_path(g_f)[0],
        jax.tree_util.tree_leaves(g_u),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-4,
            err_msg=jax.tree_util.keystr(path),
        )


@pytest.mark.parametrize("use_2q", [True, False])
def test_trunk_gradients_match_plain(use_2q):
    cfg = _cfg(use_2q=use_2q)
    params, run_p = _make_loss(cfg, fused=False)
    _, run_f = _make_loss(cfg, fused=True)

    def loss(run):
        return lambda p: jnp.mean(run(p).log_z)

    np.testing.assert_allclose(
        float(loss(run_f)(params)), float(loss(run_p)(params)), rtol=2e-4
    )
    g_f = jax.grad(loss(run_f))(params)
    g_u = jax.grad(loss(run_p))(params)
    for (path, a), b in zip(
        jax.tree_util.tree_flatten_with_path(g_f)[0],
        jax.tree_util.tree_leaves(g_u),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-4,
            err_msg=jax.tree_util.keystr(path),
        )


def test_trunk_cache_gradients_flow():
    """SVO/PSVO consume the cached xs/logws — cotangents must flow through
    the kernel's α and the resample VJP chain."""
    cfg = _cfg(t=4)

    def loss(run):
        def f(p):
            fwd = run(p)
            return (
                jnp.mean(jnp.sin(fwd.logws) * 0.3)
                + jnp.mean(jnp.cos(fwd.xs))
                + jnp.mean(fwd.log_z)
            )

        return f

    params, run_p = _make_loss(cfg, fused=False, cache=True)
    _, run_f = _make_loss(cfg, fused=True, cache=True)
    np.testing.assert_allclose(
        float(loss(run_f)(params)), float(loss(run_p)(params)), rtol=2e-4
    )
    g_f = jax.tree_util.tree_leaves(jax.grad(loss(run_f))(params))
    g_u = jax.tree_util.tree_leaves(jax.grad(loss(run_p))(params))
    for a, b in zip(g_f, g_u):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-4)


def test_trunk_adaptive_ess_and_score_function():
    """ESS-adaptive resampling and the use_stop_gradient=False score term
    run OUTSIDE the kernel — both must match the plain body exactly."""
    cfg = _cfg(ess_threshold=0.7, use_stop_gradient=False)
    params, run_p = _make_loss(cfg, fused=False)
    _, run_f = _make_loss(cfg, fused=True)

    def loss(run):
        def f(p):
            fwd = run(p)
            s = fwd.score_surrogate
            return jnp.mean(fwd.log_z + s - jax.lax.stop_gradient(s))

        return f

    np.testing.assert_allclose(
        float(loss(run_f)(params)), float(loss(run_p)(params)), rtol=2e-4
    )
    # the score term sums B·K log-normalized-weight picks, amplifying
    # last-bit α differences between the packed and plain formulations by
    # ~K — verified noise, not estimator drift (the α Jacobians agree
    # pointwise to 1e-6 relative in a JVP probe): per-leaf atol scales
    # with the leaf's own gradient magnitude
    g_f = jax.tree_util.tree_leaves(jax.grad(loss(run_f))(params))
    g_u = jax.tree_util.tree_leaves(jax.grad(loss(run_p))(params))
    for a, b in zip(g_f, g_u):
        b_np = np.asarray(b)
        np.testing.assert_allclose(
            np.asarray(a), b_np, rtol=5e-3,
            atol=max(5e-4, 1e-4 * float(np.max(np.abs(b_np)))),
        )


def test_trunk_controls_match_plain():
    """Di > 0 rides the carry pad rows exactly as in the megakernel."""
    cfg = _cfg(t=4)
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, di=2, control_scale=0.5)
    )
    ctrl = 0.5 * jax.random.normal(jax.random.key(11), (8, cfg.data.t_steps, 2))
    params, run_p = _make_loss(cfg, fused=False, controls=ctrl)
    _, run_f = _make_loss(cfg, fused=True, controls=ctrl)
    np.testing.assert_allclose(
        np.asarray(run_f(params).log_z), np.asarray(run_p(params).log_z),
        rtol=2e-4, atol=2e-4,
    )


def test_trunk_usable_gates():
    cfg = _cfg()
    ssm, _ = init_ssm(cfg, jax.random.key(0))
    assert pallas_trunk.usable(ssm, cfg.smc, 8)
    assert not pallas_trunk.usable(ssm, cfg.smc, 9)  # batch not row-aligned
    # trunk accepts what the megakernel rejects (adaptive ESS, no stop-grad)
    assert pallas_trunk.usable(
        ssm, dataclasses.replace(cfg.smc, ess_threshold=0.5), 8
    )
    assert pallas_trunk.usable(
        ssm, dataclasses.replace(cfg.smc, resampling="none"), 8
    )
    # ... but not the network classes outside the fused math
    cfg_tril = cfg.with_nets(f=NetConfig(hidden=(16, 16), cov_type="tril"))
    ssm_tril, _ = init_ssm(cfg_tril, jax.random.key(0))
    assert not pallas_trunk.usable(ssm_tril, cfg_tril.smc, 8)
    assert not pallas_trunk.usable(
        ssm, dataclasses.replace(cfg.smc, use_bootstrap=True), 8
    )
    # K not divisible into tiles
    assert not pallas_trunk.usable(
        ssm, dataclasses.replace(cfg.smc, n_particles=3 * 1024), 8
    ) or pallas_trunk.K_TILE >= 3 * 1024
    # PD over the box
    cfg_big = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, dx=60, dy=60)
    )
    ssm_big, _ = init_ssm(cfg_big, jax.random.key(0))
    assert not pallas_trunk.usable(ssm_big, cfg_big.smc, 8)


@_FAST
def test_trunk_bf16_residuals_bounded_rounding(monkeypatch):
    """The production bf16 (x_res, x_new) residual stream (round-5,
    movement-bound K=8192 rows: 153.4 → 148.4 ms/step on v5e) must keep
    gradients directionally exact against the f32 plain path: forward
    values bit-match the f32 fused path (residual dtype only affects the
    backward), total gradient cosine ≥ 0.9999 and norm within 1%."""
    monkeypatch.setattr(pallas_trunk, "BF16_RESIDUALS", True)
    cfg = _cfg(k=256, dx=26)  # PD=32: a 16-multiple, the bf16 gate opens
    params, run_p = _make_loss(cfg, fused=False)
    _, run_f = _make_loss(cfg, fused=True)

    # forward unaffected by the residual dtype
    np.testing.assert_allclose(
        np.asarray(run_f(params).log_z),
        np.asarray(run_p(params).log_z),
        rtol=2e-4,
        atol=2e-4,
    )

    def loss(run):
        return lambda p: jnp.mean(run(p).log_z)

    g_f = jax.grad(loss(run_f))(params)
    g_u = jax.grad(loss(run_p))(params)
    fa = np.concatenate(
        [np.asarray(x, np.float64).ravel() for x in jax.tree_util.tree_leaves(g_f)]
    )
    ua = np.concatenate(
        [np.asarray(x, np.float64).ravel() for x in jax.tree_util.tree_leaves(g_u)]
    )
    nf, nu = np.linalg.norm(fa), np.linalg.norm(ua)
    cos = float(fa @ ua / max(nf * nu, 1e-30))
    assert cos >= 0.9999, f"gradient cosine {cos}"
    assert abs(nf - nu) <= 1e-2 * max(nf, nu), f"grad norms {nf} vs {nu}"

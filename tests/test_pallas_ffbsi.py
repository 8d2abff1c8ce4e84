"""Fused FFBSi reverse-sweep kernel equivalence (interpret mode on CPU).

The whole-sweep Pallas kernel consumes the same bulk streams and Gumbel
noise as the lax.scan body, so values AND gradients must match it closely
(float reassociation only) — including the direct-bound variant where logq̃
carries gradients.
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
from psvo_tpu.ops import pallas_ffbsi, pallas_resample, pallas_step


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setattr(pallas_ffbsi, "_INTERPRET", True)
    monkeypatch.setattr(pallas_step, "_INTERPRET", True)
    monkeypatch.setattr(pallas_resample, "_INTERPRET", True)


def _cfg(**smc_kw):
    net = NetConfig(hidden=(16,))
    return Config(
        name="ffbsi_kernel_test",
        data=DataConfig(datatype="fhn", dx=2, dy=2, t_steps=5),
        smc=SMCConfig(
            objective="psvo",
            n_particles=128,
            resampling="systematic",
            n_smoothing_particles=8,
            **smc_kw,
        ),
    ).with_nets(
        q0=net, q1=net, q2=net, f=net, g=dataclasses.replace(net, sigma_init=0.5),
        qb=net,
    )


def _loss_fn(cfg, fused: bool, monkeypatch):
    monkeypatch.setattr(pallas_ffbsi, "ENABLE", fused)
    ssm, params = init_ssm(cfg, jax.random.key(0))
    obj = make_objective(ssm, cfg)
    ys = jax.random.normal(jax.random.key(1), (8, cfg.data.t_steps, cfg.data.dy))

    def loss(p):
        out = obj(p, jax.random.key(3), ys)
        return out.loss, out

    return params, loss


@pytest.mark.parametrize("bound", ["forward", "direct"])
@_FAST
def test_ffbsi_kernel_matches_scan(bound, monkeypatch):
    cfg = _cfg(psvo_bound=bound)
    params, loss_f = _loss_fn(cfg, True, monkeypatch)
    (lf, out_f), gf = jax.value_and_grad(loss_f, has_aux=True)(params)
    _, loss_u = _loss_fn(cfg, False, monkeypatch)
    (lu, out_u), gu = jax.value_and_grad(loss_u, has_aux=True)(params)

    np.testing.assert_allclose(float(lf), float(lu), rtol=2e-4)
    np.testing.assert_allclose(
        np.asarray(out_f.elbo), np.asarray(out_u.elbo), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(out_f.smoothed), np.asarray(out_u.smoothed),
        rtol=2e-4, atol=2e-4,
    )
    flat_f, _ = jax.tree_util.tree_flatten_with_path(gf)
    flat_u = jax.tree_util.tree_leaves(gu)
    for (path, a), b in zip(flat_f, flat_u):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-4,
            err_msg=jax.tree_util.keystr(path),
        )


def test_ffbsi_kernel_segmented_matches_scan(monkeypatch):
    """The long-T path runs the fused sweep per segment."""
    cfg = _cfg(ffbsi_segments=2)
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, t_steps=5)
    )  # T-1 = 4 -> two 2-step segments
    params, loss_f = _loss_fn(cfg, True, monkeypatch)
    (lf, out_f), gf = jax.value_and_grad(loss_f, has_aux=True)(params)
    _, loss_u = _loss_fn(cfg, False, monkeypatch)
    (lu, out_u), gu = jax.value_and_grad(loss_u, has_aux=True)(params)
    np.testing.assert_allclose(float(lf), float(lu), rtol=2e-4)
    np.testing.assert_allclose(
        np.asarray(out_f.smoothed), np.asarray(out_u.smoothed),
        rtol=2e-4, atol=2e-4,
    )
    for a, b in zip(jax.tree_util.tree_leaves(gf), jax.tree_util.tree_leaves(gu)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-4)


def test_ffbsi_kernel_usable_gates():
    cfg = _cfg()
    ssm, _ = init_ssm(cfg, jax.random.key(0))
    assert pallas_ffbsi.usable(ssm, 128, 8, 8)
    assert not pallas_ffbsi.usable(ssm, 100, 8, 8)   # K % 128
    assert not pallas_ffbsi.usable(ssm, 128, 9, 8)   # B % 8
    assert not pallas_ffbsi.usable(ssm, 128, 8, 4)   # M % 8
    assert not pallas_ffbsi.usable(ssm, 4096, 8, 8)  # K cap

"""Posterior-inference API: shapes + LGSSM oracle sanity."""

import jax
import numpy as np

from psvo_tpu.infer import filter_posterior, smooth_posterior
from tests import helpers
from tests.reference_numpy import rts_smoother


def test_infer_api_matches_rts_on_lgssm():
    p = helpers.default_lgssm()
    rng = np.random.default_rng(3)
    t = 15
    xs, ys = helpers.simulate_lgssm(rng, t_steps=t, batch=3, **p)
    cfg, ssm, params = helpers.lgssm_setup(
        objective="psvo", n_particles=1024, n_smoothing=64, t_steps=t, **p
    )

    means = filter_posterior(ssm, params, ys, cfg)
    assert means.shape == (3, t, 2)

    sm = smooth_posterior(ssm, params, ys, cfg, n_samples=64)
    assert sm.shape == (3, 64, t, 2)

    q = p["q_scale"] ** 2 * np.eye(2)
    r = p["r_scale"] ** 2 * np.eye(2)
    s0 = p["s0_scale"] ** 2 * np.eye(2)
    rts = np.stack(
        [rts_smoother(ys[b], p["a"], p["c"], q, r, p["mu0"], s0)[0] for b in range(3)]
    )
    rmse = np.sqrt(np.mean((np.asarray(sm.mean(axis=1)) - rts) ** 2))
    assert rmse < 0.15, rmse


def test_infer_with_particles():
    p = helpers.default_lgssm()
    rng = np.random.default_rng(4)
    _, ys = helpers.simulate_lgssm(rng, t_steps=8, batch=2, **p)
    cfg, ssm, params = helpers.lgssm_setup(
        objective="fivo", n_particles=64, t_steps=8, **p
    )
    means, particles, logws = filter_posterior(
        ssm, params, ys, cfg, return_particles=True
    )
    assert particles.shape == (2, 8, 64, 2)
    assert logws.shape == (2, 8, 64)
    # weighted particle mean must reproduce the emitted filtering means
    w = np.exp(np.asarray(logws) - np.max(np.asarray(logws), axis=-1, keepdims=True))
    w = w / w.sum(-1, keepdims=True)
    manual = np.einsum("btk,btkd->btd", w, np.asarray(particles))
    np.testing.assert_allclose(np.asarray(means), manual, rtol=1e-4, atol=1e-5)

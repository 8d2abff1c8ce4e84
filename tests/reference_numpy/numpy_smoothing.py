"""Trusted NumPy reimplementations of the smoothing objectives' backward
passes (SURVEY.md §4.2: "a slow, trusted NumPy reimplementation of each
objective" — the stand-in for the numerics north star, since the reference
TF source is unreadable, SURVEY.md §0).

These mirror the math of `psvo_tpu.objectives._svo_backward` /
`_ffbsi_backward` in plain NumPy loops with an independent RNG, so the JAX
path is checked *statistically* (means over replicates within combined
standard-error bands), not bitwise.

Implements, per SURVEY.md §3.3:
- SVO: backward simulation with the learned continuous proposal
  q_b(x_t | x_{t+1}, y_t), anchored on final-time filter particles with the
  density-consistent ρ_T surrogate; the bound is
  logsumexp_m(log p − log q̃) − log M.
- PSVO/FFBSi: reverse categorical re-weighting of the cached forward
  support w̃ ∝ Ŵ_t · f(x̃_{t+1} | X_t); returns both the model log-joint
  along the smoothed paths (the EM surrogate the JAX path optimizes) and
  the reference-form sampled-trajectory quantity log p − log q̃_pmf (the
  "direct" PSVO number — see objectives.py on its support-size offset).
"""

from __future__ import annotations

import numpy as np

from tests.reference_numpy.numpy_smc import (
    NumpySSMParams,
    _logsumexp,
    _mlp_mean_scale,
    _mvn_logpdf_diag,
    _softplus,
    _systematic_indices,
)


def numpy_forward_filter_cached(
    model: NumpySSMParams, ys, k, seed=0, resampling="systematic"
):
    """Forward SMC caching the per-step support. Returns
    (log_z [B], xs [T,B,K,Dx], logws [T,B,K], increments [T,B])."""
    rng = np.random.default_rng(seed)
    p = model.params
    batch, t_steps, _ = ys.shape
    dx = p["prior"]["mean"].shape[0]
    ms = lambda net, x: _mlp_mean_scale(net, x, model.activation, model.sigma_min)

    prior_mean = p["prior"]["mean"]
    prior_scale = _softplus(p["prior"]["raw_scale"]) + 1e-3

    xs = np.zeros((t_steps, batch, k, dx))
    logws = np.zeros((t_steps, batch, k))
    incs = np.zeros((t_steps, batch))

    if model.use_bootstrap:
        mean0 = np.broadcast_to(prior_mean, (batch, 1, dx))
        scale0 = np.broadcast_to(prior_scale, (batch, 1, dx))
    else:
        m0, s0 = ms(p["q0"], ys[:, 0])
        mean0, scale0 = m0[:, None, :], s0[:, None, :]
    x = mean0 + scale0 * rng.standard_normal((batch, k, dx))
    gm, gs = ms(p["g"], x)
    log_g = _mvn_logpdf_diag(ys[:, 0][:, None, :], gm, gs)
    if model.use_bootstrap:
        logw = log_g
    else:
        logw = (
            _mvn_logpdf_diag(x, prior_mean, prior_scale)
            + log_g
            - _mvn_logpdf_diag(x, mean0, scale0)
        )
    xs[0], logws[0] = x, logw
    incs[0] = _logsumexp(logw) - np.log(k)

    for t in range(1, t_steps):
        if resampling != "none":
            w = np.exp(logw - _logsumexp(logw)[:, None])
            idx = _systematic_indices(rng, w)
            x = np.take_along_axis(x, idx[..., None], axis=1)
            logw = np.zeros_like(logw)

        if model.use_bootstrap:
            mq, sq = ms(p["f"], x)
        else:
            m1, s1 = ms(p["q1"], x)
            if model.use_2q:
                m2, s2 = ms(p["q2"], ys[:, t])
                m2, s2 = m2[:, None, :], s2[:, None, :]
                prec = 1.0 / (s1 * s1) + 1.0 / (s2 * s2)
                var = 1.0 / prec
                mq = var * (m1 / (s1 * s1) + m2 / (s2 * s2))
                sq = np.sqrt(var)
            else:
                mq, sq = m1, s1
        x_new = mq + sq * rng.standard_normal(x.shape)

        gm, gs = ms(p["g"], x_new)
        log_g = _mvn_logpdf_diag(ys[:, t][:, None, :], gm, gs)
        if model.use_bootstrap:
            alpha = log_g
        else:
            fm, fs = ms(p["f"], x)
            alpha = (
                _mvn_logpdf_diag(x_new, fm, fs)
                + log_g
                - _mvn_logpdf_diag(x_new, mq, sq)
            )
        logw_new = logw + alpha
        incs[t] = _logsumexp(logw_new) - _logsumexp(logw)
        logw = logw_new
        x = x_new
        xs[t], logws[t] = x, logw

    return np.sum(incs, axis=0), xs, logws, incs


def _categorical_rows(rng, logits):
    """Sample one index per row of logits [..., K] (Gumbel-max)."""
    g = rng.gumbel(size=logits.shape)
    return np.argmax(logits + g, axis=-1)


def _sample_anchors(rng, xs, logws, m):
    """Draw M anchors from the final filtering distribution."""
    batch, k, dx = xs[-1].shape
    logw_norm = logws[-1] - _logsumexp(logws[-1])[:, None]
    idx = np.stack(
        [_categorical_rows(rng, np.broadcast_to(logw_norm[b], (m, k))) for b in range(batch)]
    )  # [B, M]
    x_t = np.take_along_axis(xs[-1], idx[..., None], axis=1)  # [B, M, Dx]
    return x_t, idx


def _pairwise_f_logp(model, x_support, x_query):
    """log f(x_query^m | x_support^j): [B,K,Dx] × [B,M,Dx] -> [B,M,K]."""
    fm, fs = _mlp_mean_scale(
        model.params["f"], x_support, model.activation, model.sigma_min
    )  # [B, K, Dx]
    diff = x_query[:, :, None, :] - fm[:, None, :, :]  # [B, M, K, Dx]
    z = diff / fs[:, None, :, :]
    return np.sum(
        -0.5 * z * z - np.log(fs[:, None, :, :]) - 0.5 * np.log(2 * np.pi), axis=-1
    )


def numpy_ffbsi(model: NumpySSMParams, ys, xs, logws, m, seed=0):
    """FFBSi backward simulation over the cached forward support.

    Returns (x_tilde [T,B,M,Dx], logp_joint [B,M], logq_pmf [B,M]) where
    logq_pmf is the discrete path pmf (anchor + per-step categorical) —
    the reference-form sampled-trajectory proposal mass.
    """
    rng = np.random.default_rng(seed)
    p = model.params
    t_steps, batch, k, dx = xs.shape
    ms = lambda net, x: _mlp_mean_scale(net, x, model.activation, model.sigma_min)

    x_t, idx = _sample_anchors(rng, xs, logws, m)
    logw_norm_t = logws[-1] - _logsumexp(logws[-1])[:, None]
    logq = np.take_along_axis(logw_norm_t, idx, axis=1)  # [B, M]
    gm, gs = ms(p["g"], x_t)
    logp = _mvn_logpdf_diag(ys[:, -1][:, None, :], gm, gs)

    x_tilde = np.zeros((t_steps, batch, m, dx))
    x_tilde[-1] = x_t
    x_next = x_t
    for t in range(t_steps - 2, -1, -1):
        logw_norm = logws[t] - _logsumexp(logws[t])[:, None]  # [B, K]
        pair = _pairwise_f_logp(model, xs[t], x_next)  # [B, M, K]
        logits = pair + logw_norm[:, None, :]
        probs_log = logits - _logsumexp(logits)[..., None]
        j = _categorical_rows(rng, logits)  # [B, M]
        logq = logq + np.take_along_axis(probs_log, j[..., None], axis=-1)[..., 0]
        x_t = np.take_along_axis(xs[t], j[..., None], axis=1)  # [B, M, Dx]

        fm_t, fs_t = ms(p["f"], x_t)
        logp = logp + _mvn_logpdf_diag(x_next, fm_t, fs_t)
        gm, gs = ms(p["g"], x_t)
        logp = logp + _mvn_logpdf_diag(ys[:, t][:, None, :], gm, gs)
        x_tilde[t] = x_t
        x_next = x_t

    prior_mean = p["prior"]["mean"]
    prior_scale = _softplus(p["prior"]["raw_scale"]) + 1e-3
    logp = logp + _mvn_logpdf_diag(x_next, prior_mean, prior_scale)
    return x_tilde, logp, logq


def numpy_svo_backward(model: NumpySSMParams, ys, xs, logws, incs, m, seed=0):
    """SVO backward simulation with the learned proposal q_b; returns the
    per-trajectory log-weights logw_traj [B, M] whose
    logsumexp − log M is the SVO bound (objectives.py docstring math)."""
    rng = np.random.default_rng(seed)
    p = model.params
    t_steps, batch, k, dx = xs.shape
    ms = lambda net, x: _mlp_mean_scale(net, x, model.activation, model.sigma_min)

    x_t, _ = _sample_anchors(rng, xs, logws, m)

    # q-side T-term: continuous filter surrogate ρ_T
    gm, gs = ms(p["g"], x_t)
    log_g_t = _mvn_logpdf_diag(ys[:, -1][:, None, :], gm, gs)
    logw_norm = logws[-2] - _logsumexp(logws[-2])[:, None]
    pair = _pairwise_f_logp(model, xs[-2], x_t)  # [B, M, K]
    log_pred = _logsumexp(pair + logw_norm[:, None, :], axis=-1)
    log_rho_t = log_g_t + log_pred - incs[-1][:, None]

    logp = log_g_t
    logq = log_rho_t
    x_next = x_t
    for t in range(t_steps - 2, -1, -1):
        inp = np.concatenate(
            [x_next, np.broadcast_to(ys[:, t][:, None, :], (batch, m, ys.shape[-1]))],
            axis=-1,
        )
        mb, sb = ms(p["qb"], inp)
        x_t = mb + sb * rng.standard_normal(mb.shape)
        fm_t, fs_t = ms(p["f"], x_t)
        gm, gs = ms(p["g"], x_t)
        logp = (
            logp
            + _mvn_logpdf_diag(x_next, fm_t, fs_t)
            + _mvn_logpdf_diag(ys[:, t][:, None, :], gm, gs)
        )
        logq = logq + _mvn_logpdf_diag(x_t, mb, sb)
        x_next = x_t

    prior_mean = p["prior"]["mean"]
    prior_scale = _softplus(p["prior"]["raw_scale"]) + 1e-3
    logp = logp + _mvn_logpdf_diag(x_next, prior_mean, prior_scale)
    return logp - logq


def numpy_svo_elbo(model, ys, k, m, seed=0):
    """End-to-end NumPy SVO bound estimate (one replicate)."""
    _, xs, logws, incs = numpy_forward_filter_cached(model, ys, k, seed=seed)
    logw_traj = numpy_svo_backward(model, ys, xs, logws, incs, m, seed=seed + 1)
    return _logsumexp(logw_traj) - np.log(m)  # [B]


def numpy_psvo_terms(model, ys, k, m, seed=0):
    """End-to-end NumPy PSVO quantities (one replicate): returns
    (log_z_fwd [B], log_joint_smoothed mean over M [B], direct bound [B])."""
    log_z, xs, logws, _ = numpy_forward_filter_cached(model, ys, k, seed=seed)
    _, logp, logq = numpy_ffbsi(model, ys, xs, logws, m, seed=seed + 1)
    direct = _logsumexp(logp - logq) - np.log(m)  # [B]
    return log_z, np.mean(logp, axis=1), direct

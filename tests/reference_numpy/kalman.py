"""Exact linear-Gaussian oracles: Kalman filter log-likelihood + RTS smoother.

The reference implementation cannot be executed (SURVEY.md §0), so numerics
parity is established against *exact* oracles instead (SURVEY.md §4.2): on a
linear-Gaussian SSM, every SMC objective's log Ẑ must converge to the Kalman
log-likelihood as K grows, and FFBSi smoothed means must match RTS means.

Model: x_t = A x_{t-1} + w, w ~ N(0, Q);  y_t = C x_t + v, v ~ N(0, R);
x_1 ~ N(mu0, S0). Observations y: [T, Dy]. Pure NumPy, trusted by inspection.
"""

from __future__ import annotations

import numpy as np


def _mvn_logpdf(y, mean, cov):
    d = y.shape[-1]
    diff = y - mean
    chol = np.linalg.cholesky(cov)
    z = np.linalg.solve(chol, diff)
    logdet = 2.0 * np.sum(np.log(np.diag(chol)))
    return -0.5 * (z @ z + logdet + d * np.log(2.0 * np.pi))


def kalman_filter(ys, a, c, q, r, mu0, s0):
    """Returns (loglik, filtered means [T,Dx], filtered covs [T,Dx,Dx],
    predicted means [T,Dx], predicted covs [T,Dx,Dx]).

    Convention matches the SSM in psvo_tpu: the *first* observation y_1 is
    emitted from x_1 ~ N(mu0, S0) directly (no transition before it).
    """
    t_steps, _ = ys.shape
    dx = a.shape[0]
    m_pred = np.zeros((t_steps, dx))
    p_pred = np.zeros((t_steps, dx, dx))
    m_filt = np.zeros((t_steps, dx))
    p_filt = np.zeros((t_steps, dx, dx))

    loglik = 0.0
    m, p = mu0.copy(), s0.copy()
    for t in range(t_steps):
        if t > 0:
            m = a @ m
            p = a @ p @ a.T + q
        m_pred[t], p_pred[t] = m, p

        s = c @ p @ c.T + r
        loglik += _mvn_logpdf(ys[t], c @ m, s)
        k_gain = p @ c.T @ np.linalg.inv(s)
        m = m + k_gain @ (ys[t] - c @ m)
        p = p - k_gain @ c @ p
        m_filt[t], p_filt[t] = m, p

    return loglik, m_filt, p_filt, m_pred, p_pred


def rts_smoother(ys, a, c, q, r, mu0, s0):
    """Rauch–Tung–Striebel smoother: returns (smoothed means [T,Dx], covs)."""
    _, m_filt, p_filt, m_pred, p_pred = kalman_filter(ys, a, c, q, r, mu0, s0)
    t_steps = ys.shape[0]
    m_sm = m_filt.copy()
    p_sm = p_filt.copy()
    for t in range(t_steps - 2, -1, -1):
        g = p_filt[t] @ a.T @ np.linalg.inv(p_pred[t + 1])
        m_sm[t] = m_filt[t] + g @ (m_sm[t + 1] - m_pred[t + 1])
        p_sm[t] = p_filt[t] + g @ (p_sm[t + 1] - p_pred[t + 1]) @ g.T
    return m_sm, p_sm

"""Pallas kernel equivalence tests (interpret mode on CPU — SURVEY.md §5
"Pallas kernels validated in interpret=True mode"): the branch-free
resampling kernel must match the inverse-CDF oracle exactly. (The fused-MLP
kernel this file also covered through round 4 was retired — it lost to
XLA's own fusion at every measured config; docs/ROADMAP.md dead-end list.)"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

_FAST = pytest.mark.fast  # <2 min verification subset (VERDICT r3 #7)

from psvo_tpu import networks
from psvo_tpu.ops import pallas_resample, resampling


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setattr(pallas_resample, "_INTERPRET", True)


# ---------------------------------------------------------------------------
# Fused resample+gather kernel (channel-major [B, D, K], banded inverse-CDF)
# ---------------------------------------------------------------------------


def _oracle_idx(logw, u):
    logw_norm, _ = resampling.log_normalize(logw, axis=-1)
    cumw = jnp.cumsum(jnp.exp(logw_norm), axis=-1)
    return np.asarray(resampling.inverse_cdf_indices(cumw, u))


@pytest.mark.parametrize("method", ["systematic", "multinomial"])
@pytest.mark.parametrize("k,d", [(128, 3), (256, 2), (1024, 11)])
@_FAST
def test_fused_resample_and_gather_matches_oracle(method, k, d):
    """d=11 exercises the D-tiling grid (two D_TILE=8 steps with padding)."""
    rng = np.random.default_rng(5)
    batch = 16
    logw = jnp.asarray(rng.standard_normal((batch, k)).astype(np.float32) * 2)
    x = jnp.asarray(rng.standard_normal((batch, d, k)).astype(np.float32))
    u_raw = jnp.asarray(
        rng.uniform(size=(batch,) if method == "systematic" else (batch, k)).astype(
            np.float32
        )
    )
    u = resampling.quantile_positions_from_raw(u_raw, k, method)
    idx, x_res = pallas_resample.resample_and_gather(u, logw, x)

    want_idx = _oracle_idx(logw, u)
    got_idx = np.asarray(idx)
    # kernel normalizes as `u * total` vs oracle's `cumw / total`: float ties
    # at CDF boundaries may flip an index by ±1; anything more is a bug.
    diff = np.abs(got_idx.astype(np.int64) - want_idx.astype(np.int64))
    assert diff.max() <= 1 and np.mean(diff == 0) > 0.99, (diff.max(), np.mean(diff == 0))
    # the gather must be consistent with the kernel's OWN indices (exact)
    np.testing.assert_array_equal(
        np.asarray(x_res), np.asarray(resampling.gather_particles(x, idx))
    )


@_FAST
def test_fused_resample_degenerate_weights():
    """ESS=1 corner: all mass on one particle — the band is a single tile."""
    batch, d, k = 8, 2, 256
    logw = jnp.where(jnp.arange(k) == 137, 0.0, -200.0)[None].repeat(batch, 0)
    x = jax.random.normal(jax.random.key(0), (batch, d, k))
    u = resampling.quantile_positions_from_raw(
        jax.random.uniform(jax.random.key(1), (batch,)), k, "systematic"
    )
    idx, x_res = pallas_resample.resample_and_gather(u, logw, x)
    np.testing.assert_array_equal(np.asarray(idx), 137)
    np.testing.assert_allclose(
        np.asarray(x_res), np.broadcast_to(np.asarray(x[:, :, 137:138]), x.shape)
    )


def test_fused_resample_gather_gradient_is_exact_scatter():
    rng = np.random.default_rng(6)
    batch, d, k = 8, 2, 128
    logw = jnp.asarray(rng.standard_normal((batch, k)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((batch, d, k)).astype(np.float32))
    u = resampling.quantile_positions_from_raw(
        jnp.asarray(rng.uniform(size=(batch,)).astype(np.float32)), k, "systematic"
    )
    cot = jnp.asarray(rng.standard_normal((batch, d, k)).astype(np.float32))

    def f(x):
        _, x_res = pallas_resample.resample_and_gather(u, logw, x)
        return jnp.sum(x_res * cot)

    gx = np.asarray(jax.grad(f)(x))
    idx = np.asarray(pallas_resample.resample_and_gather(u, logw, x)[0])
    want = np.zeros_like(gx)
    for b in range(batch):
        for q in range(k):
            want[b, :, idx[b, q]] += np.asarray(cot)[b, :, q]
    np.testing.assert_allclose(gx, want, rtol=1e-6, atol=1e-6)
    # stop-gradient semantics through the discrete choice
    glw = np.asarray(jax.grad(lambda lw: jnp.sum(
        pallas_resample.resample_and_gather(u, lw, x)[1]))(logw))
    np.testing.assert_array_equal(glw, 0.0)


@pytest.mark.parametrize("method", ["systematic", "multinomial"])
def test_fused_resample_fallback_large_k(method):
    """K > MAX_K takes the indices-only kernel + XLA gather (still correct,
    ±1 float-boundary ties tolerated); K > MAX_K_IDX falls all the way to
    jnp. Includes the ESS=1 degenerate corner (single-tile mass)."""
    rng = np.random.default_rng(1)
    batch, d, k = 8, 2, 2 * pallas_resample.MAX_K
    logw = jnp.asarray(rng.standard_normal((batch, k)).astype(np.float32) * 3)
    x = jnp.asarray(rng.standard_normal((batch, d, k)).astype(np.float32))
    u_raw = jnp.asarray(
        rng.uniform(size=(batch,) if method == "systematic" else (batch, k)).astype(
            np.float32
        )
    )
    u = resampling.quantile_positions_from_raw(u_raw, k, method)
    idx, x_res = pallas_resample.resample_and_gather(u, logw, x)
    diff = np.abs(np.asarray(idx).astype(np.int64) - _oracle_idx(logw, u).astype(np.int64))
    # tile-wise vs sequential cumsum reassociation: boundary ties can flip an
    # index by a couple of positions at K=4096; anything larger is a bug
    assert diff.max() <= 2 and np.mean(diff == 0) > 0.999, (diff.max(), np.mean(diff == 0))
    assert np.all(np.diff(np.asarray(idx), axis=-1) >= 0)  # ranks stay monotone
    np.testing.assert_array_equal(
        np.asarray(x_res), np.asarray(resampling.gather_particles(x, idx))
    )
    # degenerate: all mass on one particle
    logw_d = jnp.where(jnp.arange(k) == 3131, 0.0, -200.0)[None].repeat(batch, 0)
    idx_d, _ = pallas_resample.resample_and_gather(u, logw_d, x)
    np.testing.assert_array_equal(np.asarray(idx_d), 3131)
    # beyond MAX_K_IDX: pure jnp path
    k2 = 2 * pallas_resample.MAX_K_IDX
    logw2 = jnp.asarray(rng.standard_normal((batch, k2)).astype(np.float32))
    x2 = jnp.asarray(rng.standard_normal((batch, d, k2)).astype(np.float32))
    u2 = resampling.quantile_positions_from_raw(
        jnp.asarray(rng.uniform(size=(batch,)).astype(np.float32)), k2, "systematic"
    )
    idx2, _ = pallas_resample.resample_and_gather(u2, logw2, x2)
    np.testing.assert_array_equal(np.asarray(idx2), _oracle_idx(logw2, u2))


def test_windowed_gather_scatter_large_k():
    """The windowed sorted-index kernels (large-K path) are exact on healthy
    weights AND on window-overflowing inputs (runtime lax.cond fallback)."""
    rng = np.random.default_rng(9)
    batch, d, k = 8, 5, 2 * pallas_resample.MAX_K  # d=5 pads to D_TILE=8
    x = jnp.asarray(rng.standard_normal((batch, d, k)).astype(np.float32))

    def check(idx_np, atol=1e-5):
        idx = jnp.asarray(idx_np, jnp.int32)
        got = pallas_resample._win_gather(idx, x, k)
        np.testing.assert_array_equal(
            np.asarray(got), np.asarray(resampling.gather_particles(x, idx))
        )
        g = jnp.asarray(rng.standard_normal((batch, d, k)).astype(np.float32))
        got_dx = np.asarray(pallas_resample._win_scatter(idx, g, k))
        # f64 ground truth: the overflow branch (_sorted_segsum) forms each
        # segment sum as a difference of f32 prefixes, so its entries carry
        # absolute error ~eps·|prefix| — compare both branches against the
        # exact sum with a branch-appropriate atol
        want = np.zeros((batch, d, k), np.float64)
        g64 = np.asarray(g, np.float64)
        for b in range(batch):
            for q in range(k):
                want[b, :, idx_np[b, q]] += g64[b, :, q]
        np.testing.assert_allclose(got_dx, want, rtol=1e-6, atol=atol)

    # healthy: near-identity sorted indices (windows trivially fit)
    base = np.clip(
        np.sort(np.arange(k) + rng.integers(-60, 60, size=(batch, k)), axis=-1),
        0, k - 1,
    )
    _, ok = pallas_resample._gather_meta(jnp.asarray(base, jnp.int32), k,
                                         pallas_resample.W_TILES)
    assert bool(ok)
    check(base)

    # overflow: one query tile spans the whole support — gather meta must
    # flag it and the cond must take the exact XLA branch
    bad = base.copy()
    bad[:, : k // 2 + 64] = 0  # +64: the jump lands mid-tile
    bad[:, k // 2 + 64 :] = k - 1
    _, ok = pallas_resample._gather_meta(jnp.asarray(bad, jnp.int32), k,
                                         pallas_resample.W_TILES)
    assert not bool(ok)
    check(bad, atol=3e-4)

    # scatter overflow: > W_TILES·128 offspring of one source tile
    many = np.sort(rng.integers(0, 128, size=(batch, k)), axis=-1)
    _, ok = pallas_resample._scatter_meta(jnp.asarray(many, jnp.int32), k,
                                          pallas_resample.W_TILES)
    assert not bool(ok)
    check(many, atol=3e-4)


def test_compact_gather_degenerate_regime():
    """Window overflow with FEW distinct ancestors (the early-training
    ESS ≈ 1 regime, BASELINE.md row-5 note) takes the compact branch —
    distinct-lane gather + windowed kernel in compact index space — and is
    exact; > W·Q distinct ancestors AND a straddling tile falls through to
    the XLA gather. Both asserted against the dense gather."""
    rng = np.random.default_rng(11)
    batch, d, k = 8, 5, 2 * pallas_resample.MAX_K
    w = pallas_resample.W_TILES
    x = jnp.asarray(rng.standard_normal((batch, d, k)).astype(np.float32))

    def run_and_check(idx_np):
        idx = jnp.asarray(idx_np, jnp.int32)
        got = pallas_resample._win_gather(idx, x, k)
        np.testing.assert_array_equal(
            np.asarray(got), np.asarray(resampling.gather_particles(x, idx))
        )
        _, ok_win = pallas_resample._gather_meta(idx, k, w)
        n_dist = (np.diff(idx_np, axis=-1) != 0).sum(axis=-1) + 1
        return bool(ok_win), int(n_dist.max())

    # two spikes far apart: the straddling tile overflows any W-window but
    # n_distinct = 2 — compact branch territory
    spikes = np.where(np.arange(k) < k // 2 + 37, 10, k - 20)
    spikes = np.broadcast_to(spikes, (batch, k)).copy()
    ok_win, n_dist = run_and_check(spikes)
    assert not ok_win and n_dist <= w * pallas_resample.Q

    # a handful of scattered ancestors (realistic ESS ≈ 5): still compact
    anc = np.sort(rng.integers(0, k, size=6))
    few = np.sort(rng.choice(anc, size=(batch, k)), axis=-1)
    ok_win, n_dist = run_and_check(few)
    assert not ok_win and n_dist <= w * pallas_resample.Q

    # both structures fail: near-identity indices (every ancestor distinct)
    # with one > W-window jump mid-tile — the XLA fallback branch
    jump = np.arange(k, dtype=np.int64).copy()
    jump[: k // 2 + 64] = np.arange(k // 2 + 64) // 2
    both = np.broadcast_to(np.clip(jump, 0, k - 1), (batch, k)).copy()
    ok_win, n_dist = run_and_check(both)
    assert not ok_win and n_dist > w * pallas_resample.Q


def test_large_k_gradient_is_exact_scatter():
    """resample_and_gather's VJP above MAX_K (windowed scatter kernel)."""
    rng = np.random.default_rng(10)
    batch, d, k = 8, 3, 2 * pallas_resample.MAX_K
    logw = jnp.asarray(rng.standard_normal((batch, k)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((batch, d, k)).astype(np.float32))
    u = resampling.quantile_positions_from_raw(
        jnp.asarray(rng.uniform(size=(batch,)).astype(np.float32)), k, "systematic"
    )
    cot = jnp.asarray(rng.standard_normal((batch, d, k)).astype(np.float32))

    def f(x):
        _, x_res = pallas_resample.resample_and_gather(u, logw, x)
        return jnp.sum(x_res * cot)

    gx = np.asarray(jax.grad(f)(x))
    idx = np.asarray(pallas_resample.resample_and_gather(u, logw, x)[0])
    want = np.zeros_like(gx)
    for b in range(batch):
        for q in range(k):
            want[b, :, idx[b, q]] += np.asarray(cot)[b, :, q]
    np.testing.assert_allclose(gx, want, rtol=1e-6, atol=1e-5)


@pytest.mark.parametrize("k", [128, 1024])
def test_tri_cumsum_matches_jnp(k):
    """The MXU triangular-contraction cumsum (the kernel's hot formulation)."""
    rng = np.random.default_rng(3)
    w = jnp.asarray(rng.uniform(size=(8, k)).astype(np.float32))
    got = pallas_resample._tri_cumsum(w)
    np.testing.assert_allclose(np.asarray(got), np.cumsum(w, axis=-1), rtol=3e-5)

"""Unit tests: ODE steppers vs scipy.integrate (SURVEY.md §4.1)."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.integrate import solve_ivp

from psvo_tpu.models import dynamics as dyn


@pytest.mark.parametrize(
    "model",
    [dyn.FitzHughNagumo(dt=0.25), dyn.Lorenz63(dt=0.01), dyn.Lorenz96(dim=10, dt=0.01)],
)
def test_rk4_matches_scipy(model):
    rng = np.random.default_rng(1)
    x0 = rng.standard_normal(model.dim).astype(np.float32)
    if isinstance(model, dyn.Lorenz63):
        x0 = x0 + np.array([0.0, 0.0, 25.0], np.float32)

    got = np.asarray(model.step(jnp.asarray(x0)))
    sol = solve_ivp(
        lambda t, x: np.asarray(model.drift(jnp.asarray(x, dtype=jnp.float64))),
        (0.0, model.dt),
        x0.astype(np.float64),
        rtol=1e-10,
        atol=1e-12,
    )
    np.testing.assert_allclose(got, sol.y[:, -1], rtol=2e-4, atol=2e-4)


def test_lorenz96_drift_matches_loop():
    rng = np.random.default_rng(2)
    model = dyn.Lorenz96(dim=12)
    x = rng.standard_normal(12)
    want = np.array(
        [
            (x[(i + 1) % 12] - x[i - 2]) * x[i - 1] - x[i] + model.forcing
            for i in range(12)
        ]
    )
    np.testing.assert_allclose(np.asarray(model.drift(jnp.asarray(x))), want, rtol=1e-6)


def test_steppers_batch_broadcast():
    model = dyn.FitzHughNagumo()
    x = jnp.ones((4, 8, 2))
    assert model.step(x).shape == (4, 8, 2)


def test_fhn_limit_cycle_bounded():
    """FHN with standard params orbits a bounded limit cycle."""
    model = dyn.FitzHughNagumo()
    x = jnp.array([0.0, 0.0])
    for _ in range(2000):
        x = model.step(x)
    assert np.all(np.abs(np.asarray(x)) < 5.0)

"""Ground-truth nonlinear dynamics: FitzHugh–Nagumo, Lorenz-63, Lorenz-96.

Covers the reference's hand-coded ODE integrators `transformation/fhn.py` and
`transformation/lorenz.py` (SURVEY.md §2-A, unverified paths), which serve two
roles there and here:

1. Data generation — simulate the true state-space model to create
   (hidden, obs) datasets (`psvo_tpu.data`).
2. Known-dynamics mode — use the true drift as the transition mean f when
   learning only proposals/emissions (SMCConfig.transition="known", the
   reference's bootstrap-style ablation; wired in models/ssm.py).

All steppers are pure jnp functions over an arbitrary state axis (default
last; the SMC hot path passes axis=-2 for the channel-major [B, D, K]
particle layout) and vectorize over every other axis, so the same code runs
per-trajectory on host-side data gen and per-particle inside the jitted SMC
scan. Integration is RK4 (`integrator="rk4"`) or Euler, fixed step `dt` —
fixed shapes, no adaptive control flow, as XLA requires.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp

Drift = Callable[[jnp.ndarray], jnp.ndarray]


def _comp(x: jnp.ndarray, i: int, axis: int) -> jnp.ndarray:
    """State component i along `axis` (the steppers' axis-generic accessor)."""
    return jax.lax.index_in_dim(x, i, axis=axis if axis >= 0 else x.ndim + axis, keepdims=False)


def euler_step(drift: Drift, x: jnp.ndarray, dt: float) -> jnp.ndarray:
    return x + dt * drift(x)


def rk4_step(drift: Drift, x: jnp.ndarray, dt: float) -> jnp.ndarray:
    k1 = drift(x)
    k2 = drift(x + 0.5 * dt * k1)
    k3 = drift(x + 0.5 * dt * k2)
    k4 = drift(x + dt * k3)
    return x + (dt / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)


_STEPPERS = {"euler": euler_step, "rk4": rk4_step}


@dataclass(frozen=True)
class FitzHughNagumo:
    """2-D neuron model: dv = v - v^3/3 - w + I ; dw = (v + a - b w) / tau."""

    a: float = 0.7
    b: float = 0.8
    tau: float = 12.5
    current: float = 1.0
    dt: float = 0.25
    integrator: str = "rk4"
    dim = 2

    def drift(self, x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
        v, w = _comp(x, 0, axis), _comp(x, 1, axis)
        dv = v - (v**3) / 3.0 - w + self.current
        dw = (v + self.a - self.b * w) / self.tau
        return jnp.stack([dv, dw], axis=axis)

    def step(self, x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
        return _STEPPERS[self.integrator](lambda z: self.drift(z, axis), x, self.dt)


@dataclass(frozen=True)
class Lorenz63:
    """Classic chaotic 3-D system (sigma, rho, beta) = (10, 28, 8/3)."""

    sigma: float = 10.0
    rho: float = 28.0
    beta: float = 8.0 / 3.0
    dt: float = 0.01
    integrator: str = "rk4"
    dim = 3

    def drift(self, x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
        a, b, c = _comp(x, 0, axis), _comp(x, 1, axis), _comp(x, 2, axis)
        return jnp.stack(
            [
                self.sigma * (b - a),
                a * (self.rho - c) - b,
                a * b - self.beta * c,
            ],
            axis=axis,
        )

    def step(self, x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
        return _STEPPERS[self.integrator](lambda z: self.drift(z, axis), x, self.dt)


@dataclass(frozen=True)
class Lorenz96:
    """D-dimensional cyclic advection model: dx_i = (x_{i+1}-x_{i-2}) x_{i-1} - x_i + F.

    The scaled benchmark config (BASELINE.json config #5) uses D=40, the
    classic Lorenz-96 setting with forcing F=8. Implemented with jnp.roll so
    the whole drift is three shifted elementwise products — pure VPU work.
    """

    dim: int = 40
    forcing: float = 8.0
    dt: float = 0.05
    integrator: str = "rk4"

    def drift(self, x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
        xp1 = jnp.roll(x, -1, axis=axis)
        xm1 = jnp.roll(x, 1, axis=axis)
        xm2 = jnp.roll(x, 2, axis=axis)
        return (xp1 - xm2) * xm1 - x + self.forcing

    def step(self, x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
        return _STEPPERS[self.integrator](lambda z: self.drift(z, axis), x, self.dt)


@dataclass(frozen=True)
class LinearDynamics:
    """x_{t+1} = A x_t + c — used by the linear-Gaussian oracle tests."""

    matrix: tuple  # row-major nested tuple so the dataclass stays hashable
    offset: tuple = ()

    @property
    def dim(self) -> int:
        return len(self.matrix)

    def step(self, x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
        a = jnp.asarray(self.matrix, jnp.float32)
        if axis in (-1, x.ndim - 1):
            out = x @ a.T
            if self.offset:
                out = out + jnp.asarray(self.offset, jnp.float32)
            return out
        assert axis in (-2, x.ndim - 2)
        out = jnp.einsum("ij,...jk->...ik", a, x)
        if self.offset:
            out = out + jnp.asarray(self.offset, jnp.float32)[:, None]
        return out


DYNAMICS = {
    "fhn": FitzHughNagumo,
    "lorenz63": Lorenz63,
    "lorenz96": Lorenz96,
}


def make_stepper(data_cfg):
    """Ground-truth stepper for a DataConfig — shared by data generation and
    the known-dynamics transition mode (SMCConfig.transition="known")."""
    if data_cfg.datatype == "lgssm":
        # Stable rotation-ish linear system for oracle tests.
        theta = 0.3
        a = [
            [0.9 * jnp.cos(theta), -0.9 * jnp.sin(theta)],
            [0.9 * jnp.sin(theta), 0.9 * jnp.cos(theta)],
        ]
        mat = tuple(
            tuple(float(v) for v in row)
            for row in jnp.asarray(a)[: data_cfg.dx, : data_cfg.dx].tolist()
        )
        return LinearDynamics(matrix=mat)
    return make_dynamics(data_cfg.datatype, **dict(data_cfg.dyn_overrides))


def make_dynamics(name: str, **overrides):
    """Instantiate a named dynamics model; overrides map to dataclass fields."""
    try:
        cls = DYNAMICS[name]
    except KeyError:
        raise ValueError(f"unknown dynamics {name!r}; options: {sorted(DYNAMICS)}")
    return cls(**overrides)

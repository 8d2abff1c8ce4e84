"""State-space model bundle: proposals q0/q1/q2, transition f, emission g.

Covers the reference's `model.py` (SURVEY.md §2-A, unverified path): the class
that assembles learnable (transformation, distribution) pairs from flags —
initial proposal q0(x_0|y_0), dynamics proposal q1(x_t|x_{t-1}), encoder
proposal q2(x_t|y_t), transition f(x_t|x_{t-1}), emission g(y_t|x_t) — with
bootstrap mode (proposal := f) and two-proposal Gaussian fusion (`use_2_q`,
SURVEY.md §3.2).

TPU-first shape: `SSM` is a *static* description (dims, net configs, flags) —
hashable, safe to close over in jit — while all learnable state lives in one
params dict pytree `{"q0","q1","q2","f","g","qb","prior"}`. Every method is a
pure function `(params, arrays) -> arrays` that broadcasts over [B, K, ...]
leading axes, so `smc.py` never reshapes for the model.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from psvo_tpu import distributions as dist
from psvo_tpu import networks
from psvo_tpu.config import Config, NetConfig

Params = dict[str, Any]


class SSM:
    """Static model description; learnable params live in the pytree from `init`."""

    def __init__(self, cfg: Config):
        self.dx = cfg.data.dx
        self.dy = cfg.data.dy
        self.emission = cfg.data.emission
        self.use_2q = cfg.smc.use_2q
        self.use_bootstrap = cfg.smc.use_bootstrap
        # q_uses_true_X debug flag: the encoder head q2 (and q0) see the true
        # latents, so their input dimension is Dx instead of Dy.
        self.enc_dim = cfg.data.dx if cfg.smc.q_uses_true_x else cfg.data.dy
        self.nets = {k: v for k, v in cfg.nets}
        self.use_pallas_mlp = cfg.use_pallas and cfg.use_pallas_mlp
        self.use_pallas_resample = cfg.use_pallas and cfg.use_pallas_resample
        self.bf16_matmuls = cfg.train.bf16_matmuls

    # -- init ---------------------------------------------------------------

    def init(self, key: jax.Array) -> Params:
        keys = jax.random.split(key, 7)
        dx, dy = self.dx, self.dy
        g_cov = "none" if self.emission == "poisson" else self.nets["g"].cov_type

        def head(k, cfg: NetConfig, din, dout, cov=None):
            return networks.init_mlp_head(
                k,
                din,
                dout,
                cfg.hidden,
                cov_type=cov if cov is not None else cfg.cov_type,
                sigma_init=cfg.sigma_init,
                sigma_min=cfg.sigma_min,
            )

        return {
            "q0": head(keys[0], self.nets["q0"], self.enc_dim, dx),
            "q1": head(keys[1], self.nets["q1"], dx, dx),
            "q2": head(keys[2], self.nets["q2"], self.enc_dim, dx),
            "f": head(keys[3], self.nets["f"], dx, dx),
            "g": head(keys[4], self.nets["g"], dx, dy, cov=g_cov),
            "qb": head(keys[5], self.nets["qb"], dx + dy, dx),
            # learned initial prior p(x_0) = N(mu0, diag(scale0^2))
            "prior": {
                "mean": jnp.zeros((dx,), jnp.float32),
                "raw_scale": jnp.zeros((dx,), jnp.float32),  # softplus(0)+min ~ 0.69
            },
        }

    # -- net application (routes to fused Pallas kernel when enabled) --------

    def _mean_scale(self, net: Params, cfg: NetConfig, x: jax.Array):
        if self.use_pallas_mlp:
            from psvo_tpu.ops import pallas_mlp

            return pallas_mlp.mlp_mean_scale(
                net,
                x,
                activation=cfg.activation,
                sigma_min=cfg.sigma_min,
                bf16=self.bf16_matmuls,
            )
        return networks.mlp_mean_scale(
            net,
            x,
            activation=cfg.activation,
            sigma_min=cfg.sigma_min,
            bf16=self.bf16_matmuls,
        )

    def _mean(self, net: Params, cfg: NetConfig, x: jax.Array):
        """Mean-only head (Poisson log-rate / Dirac): same kernel/bf16
        dispatch as _mean_scale — this is the hottest per-step MLP for
        Poisson emissions."""
        if self.use_pallas_mlp:
            from psvo_tpu.ops import pallas_mlp

            if pallas_mlp.usable(cfg.activation):
                return pallas_mlp.fused_mlp_mean(
                    net, x, cfg.activation, self.bf16_matmuls
                )
        return networks.mlp_mean(
            net, x, activation=cfg.activation, bf16=self.bf16_matmuls
        )

    # -- prior ----------------------------------------------------------------

    def prior_params(self, params: Params):
        p = params["prior"]
        return p["mean"], networks.scale_from_raw(p["raw_scale"], 1e-3)

    def prior_log_prob(self, params: Params, x: jax.Array) -> jax.Array:
        mean, scale = self.prior_params(params)
        return dist.mvn_diag_log_prob(x, mean, scale)

    # -- proposals ------------------------------------------------------------

    def propose_initial(self, params: Params, y0: jax.Array):
        """q0(x_0 | y_0) -> (mean, scale); bootstrap mode proposes from the prior."""
        if self.use_bootstrap:
            mean, scale = self.prior_params(params)
            return jnp.broadcast_to(mean, (*y0.shape[:-1], self.dx)), jnp.broadcast_to(
                scale, (*y0.shape[:-1], self.dx)
            )
        return self._mean_scale(params["q0"], self.nets["q0"], y0)

    def propose(self, params: Params, x_prev: jax.Array, y_t: jax.Array):
        """q(x_t | x_{t-1}, y_t): q1 ⊗ q2 precision-weighted fusion under use_2q,
        plain q1 otherwise, and the transition f itself in bootstrap mode."""
        if self.use_bootstrap:
            return self.transition_params(params, x_prev)
        m1, s1 = self._mean_scale(params["q1"], self.nets["q1"], x_prev)
        if not self.use_2q:
            return m1, s1
        m2, s2 = self._mean_scale(params["q2"], self.nets["q2"], y_t)
        return dist.mvn_product(m1, s1, m2, s2)

    def backward_propose(self, params: Params, x_next: jax.Array, y_t: jax.Array):
        """SVO's learned backward proposal q_b(x_t | x_{t+1}, y_t) (SURVEY.md §3.3)."""
        inp = jnp.concatenate(
            [x_next, jnp.broadcast_to(y_t, (*x_next.shape[:-1], self.dy))], axis=-1
        )
        return self._mean_scale(params["qb"], self.nets["qb"], inp)

    def step_heads(self, params: Params, x_prev: jax.Array, y_t: jax.Array):
        """All per-step conditionals on x_prev in one go:
        returns (mean_q, scale_q, mean_f, scale_f).

        q1 and f consume the SAME input, so when their architectures match
        (the default) they evaluate as ONE stacked vmapped MLP — XLA emits a
        single batched matmul chain, halving per-step MLP op count (the scan
        is latency-bound on TPU, so op count ≈ time). Also returns the
        transition parameters so the incremental weight α_t never re-runs the
        f network.
        """
        if self.use_bootstrap:
            mean_f, scale_f = self.transition_params(params, x_prev)
            return mean_f, scale_f, mean_f, scale_f

        q1_cfg, f_cfg = self.nets["q1"], self.nets["f"]
        stackable = (
            q1_cfg.hidden == f_cfg.hidden
            and q1_cfg.activation == f_cfg.activation
            and q1_cfg.cov_type == f_cfg.cov_type == "const"
            and q1_cfg.sigma_min == f_cfg.sigma_min
            and not self.use_pallas_mlp  # fused kernel handles its own batching
        )
        if stackable:
            stacked = jax.tree_util.tree_map(
                lambda a, b: jnp.stack([a, b]), params["q1"], params["f"]
            )
            means, scales = jax.vmap(
                lambda net: networks.mlp_mean_scale(
                    net,
                    x_prev,
                    activation=q1_cfg.activation,
                    sigma_min=q1_cfg.sigma_min,
                    bf16=self.bf16_matmuls,
                )
            )(stacked)
            m1, s1 = means[0], scales[0]
            mean_f, scale_f = means[1], scales[1]
        else:
            m1, s1 = self._mean_scale(params["q1"], q1_cfg, x_prev)
            mean_f, scale_f = self.transition_params(params, x_prev)

        if self.use_2q:
            m2, s2 = self._mean_scale(params["q2"], self.nets["q2"], y_t)
            mean_q, scale_q = dist.mvn_product(m1, s1, m2, s2)
        else:
            mean_q, scale_q = m1, s1
        return mean_q, scale_q, mean_f, scale_f

    # -- channel-major variants (the forward filter's hot path) ---------------
    #
    # The filter keeps particle tensors as [B, Dx, K] — K on the 128-lane
    # axis, the tiny feature dim on sublanes (see
    # distributions.mvn_diag_log_prob_cm for the layout rationale). These
    # methods mirror their feature-last counterparts above, which remain for
    # the cold paths (backward smoothing over M≈16 draws, k-step eval,
    # data generation).

    def _mean_scale_cm(self, net: Params, cfg: NetConfig, x: jax.Array):
        return networks.mlp_mean_scale_cm(
            net,
            x,
            activation=cfg.activation,
            sigma_min=cfg.sigma_min,
            bf16=self.bf16_matmuls,
        )

    def prior_log_prob_cm(self, params: Params, x: jax.Array) -> jax.Array:
        """x [..., Dx, K] -> [..., K]."""
        mean, scale = self.prior_params(params)
        return dist.mvn_diag_log_prob_cm(x, mean[:, None], scale[:, None])

    def transition_params_cm(self, params: Params, x_prev: jax.Array):
        """x_prev [..., Dx, K] -> (mean, scale) [..., Dx, K]."""
        return self._mean_scale_cm(params["f"], self.nets["f"], x_prev)

    def step_heads_cm(self, params: Params, x_prev: jax.Array, y_t: jax.Array):
        """Channel-major `step_heads`: x_prev [B, Dx, K], y_t [B, E] ->
        (mean_q, scale_q, mean_f, scale_f), each [B, Dx, K].

        The encoder head q2 runs feature-last on the [B, E] observation (one
        row per trajectory — no K broadcast ever materializes) and joins the
        fusion as [B, Dx, 1].
        """
        if self.use_bootstrap:
            mean_f, scale_f = self.transition_params_cm(params, x_prev)
            return mean_f, scale_f, mean_f, scale_f

        q1_cfg, f_cfg = self.nets["q1"], self.nets["f"]
        stackable = (
            q1_cfg.hidden == f_cfg.hidden
            and q1_cfg.activation == f_cfg.activation
            and q1_cfg.cov_type == f_cfg.cov_type == "const"
            and q1_cfg.sigma_min == f_cfg.sigma_min
        )
        if stackable:
            stacked = jax.tree_util.tree_map(
                lambda a, b: jnp.stack([a, b]), params["q1"], params["f"]
            )
            means, scales = jax.vmap(
                lambda net: networks.mlp_mean_scale_cm(
                    net,
                    x_prev,
                    activation=q1_cfg.activation,
                    sigma_min=q1_cfg.sigma_min,
                    bf16=self.bf16_matmuls,
                )
            )(stacked)
            m1, s1 = means[0], scales[0]
            mean_f, scale_f = means[1], scales[1]
        else:
            m1, s1 = self._mean_scale_cm(params["q1"], q1_cfg, x_prev)
            mean_f, scale_f = self.transition_params_cm(params, x_prev)

        if self.use_2q:
            m2, s2 = self._mean_scale(params["q2"], self.nets["q2"], y_t)  # [B, Dx]
            mean_q, scale_q = dist.mvn_product(
                m1, s1, m2[..., None], s2[..., None]
            )
        else:
            mean_q, scale_q = m1, s1
        return mean_q, scale_q, mean_f, scale_f

    def emission_log_prob_cm(
        self, params: Params, x: jax.Array, y: jax.Array
    ) -> jax.Array:
        """x [B, Dx, K], y [B, Dy] -> [B, K]."""
        if self.emission == "poisson":
            log_rate = networks.mlp_mean_cm(
                params["g"],
                x,
                activation=self.nets["g"].activation,
                bf16=self.bf16_matmuls,
            )
            return dist.poisson_log_prob_cm(y[..., :, None], log_rate)
        mean, scale = self._mean_scale_cm(params["g"], self.nets["g"], x)
        return dist.mvn_diag_log_prob_cm(y[..., :, None], mean, scale)

    # -- transition / emission -------------------------------------------------

    def transition_params(self, params: Params, x_prev: jax.Array):
        return self._mean_scale(params["f"], self.nets["f"], x_prev)

    def transition_log_prob(
        self, params: Params, x_prev: jax.Array, x: jax.Array
    ) -> jax.Array:
        mean, scale = self.transition_params(params, x_prev)
        return dist.mvn_diag_log_prob(x, mean, scale)

    def emission_log_prob(self, params: Params, x: jax.Array, y: jax.Array) -> jax.Array:
        if self.emission == "poisson":
            log_rate = self._mean(params["g"], self.nets["g"], x)
            return dist.poisson_log_prob(y, log_rate)
        mean, scale = self._mean_scale(params["g"], self.nets["g"], x)
        return dist.mvn_diag_log_prob(y, mean, scale)

    def emission_mean(self, params: Params, x: jax.Array) -> jax.Array:
        """Mean observation ŷ(x) — used by k-step prediction R² (SURVEY.md §3.4)."""
        if self.emission == "poisson":
            return jnp.exp(self._mean(params["g"], self.nets["g"], x))
        return self._mean_scale(params["g"], self.nets["g"], x)[0]


def init_ssm(cfg: Config, key: jax.Array) -> tuple[SSM, Params]:
    ssm = SSM(cfg)
    return ssm, ssm.init(key)

"""psvo_tpu — a TPU-native JAX framework for variational sequential Monte Carlo.

A from-scratch rebuild of the capabilities of the reference `amoretti86/PSVO`
(see SURVEY.md): the full variational-SMC objective family (IWAE, FIVO/AESMC,
SVO, PSVO) for learning nonlinear state-space models, designed TPU-first:

- Time is a `lax.scan`; batch and particle axes are plain tensor axes that
  shard over a `jax.sharding.Mesh(("data", "particle"))`.
- Neural proposal / transition / emission MLPs run inside the fused
  whole-step / trunk Pallas kernels (`psvo_tpu.ops.pallas_step`,
  `psvo_tpu.ops.pallas_trunk`) with a pure-jnp fallback.
- Resampling (multinomial + systematic) is a branch-free on-device
  cumsum + searchsorted gather (`psvo_tpu.ops.resampling`, Pallas kernel in
  `psvo_tpu.ops.pallas_resample`).
- The PSVO FFBSi smoother is a second, reverse-time `lax.scan` over cached
  forward particles and log-weights.

Reference parity map: SURVEY.md §2 inventories the reference components
(`runner_flag.py`, `runner.py`, `model.py`, `distribution/`, `transformation/`,
`SMC/{SMC_base,IWAE,AESMC,SVO,PSVO}.py`, `trainer.py`, `rslts_saving/`); each
module here cites the component it covers.
"""

__version__ = "0.2.0"

import os as _os

# Persistent XLA compilation cache: remote TPU compiles through this
# environment's relay run 15 s–10 min, dominating iteration time; caching
# them makes every later invocation of the same program near-instant
# (ROADMAP #9). Opt out with PSVO_TPU_NO_CACHE=1.
if not _os.environ.get("PSVO_TPU_NO_CACHE"):
    import jax as _jax

    _cache_dir = _os.environ.get(
        "PSVO_TPU_CACHE_DIR",
        _os.path.join(_os.path.expanduser("~"), ".cache", "psvo_tpu_xla"),
    )
    try:
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover — cache is best-effort
        pass

from psvo_tpu import distributions
from psvo_tpu import networks
from psvo_tpu.data import Dataset, generate_dataset, load_dataset, save_dataset
from psvo_tpu.infer import filter_posterior, smooth_posterior
from psvo_tpu.smc import (
    FilterResult,
    forward_filter,
    forward_filter_segmented,
)
from psvo_tpu.train import Trainer, make_eval_step, make_optimizer, make_train_step
from psvo_tpu.config import (
    Config,
    DataConfig,
    MeshConfig,
    NetConfig,
    SMCConfig,
    TrainConfig,
    preset,
    PRESETS,
)
from psvo_tpu.models.ssm import SSM, init_ssm
from psvo_tpu.objectives import make_objective

__all__ = [
    "Config",
    "DataConfig",
    "Dataset",
    "FilterResult",
    "MeshConfig",
    "NetConfig",
    "PRESETS",
    "SMCConfig",
    "SSM",
    "TrainConfig",
    "Trainer",
    "distributions",
    "filter_posterior",
    "forward_filter",
    "forward_filter_segmented",
    "generate_dataset",
    "init_ssm",
    "load_dataset",
    "make_eval_step",
    "make_objective",
    "make_optimizer",
    "make_train_step",
    "networks",
    "preset",
    "save_dataset",
    "smooth_posterior",
]

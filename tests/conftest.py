"""Test harness setup: force an 8-virtual-device CPU backend.

The test suite runs on CPU (SURVEY.md §4.4): unit/oracle tests don't need a
TPU, and the sharding tests use XLA's standard fake-device trick —
`--xla_force_host_platform_device_count=8` — to exercise the real
Mesh/shard_map code paths without a v5e-8 pod.

NOTE: this environment's sitecustomize registers the `axon` TPU plugin and
force-selects it regardless of JAX_PLATFORMS, so we must also override
jax_platforms *after* import (verified: env-var alone is ignored).
"""

import os

# Must be set before the CPU backend initializes.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

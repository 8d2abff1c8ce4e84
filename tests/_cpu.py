"""Import-me-first helper for ad-hoc scripts: force the CPU backend.

Usage: `import tests._cpu  # noqa` at the very top, before any jax compute.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")

"""Test configuration: force JAX onto a virtual 8-device CPU platform.

The session environment pins JAX_PLATFORMS=axon (the real TPU tunnel) and
the axon plugin wins over the env var, so the platform is forced through
jax.config here — before any test imports jax. XLA_FLAGS must be set before
the backend initialises to get the 8 virtual CPU devices used by the
pjit/Mesh tests (SURVEY.md §4d).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

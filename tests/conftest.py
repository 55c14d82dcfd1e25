"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Tests must not depend on TPU availability; multi-chip sharding tests use
the forced host-platform device count.  Must run before jax is imported.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

# The environment may pre-import jax and register an accelerator backend
# (e.g. via sitecustomize) before this conftest runs; force the platform
# through the config API as well so the env var takes effect regardless.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

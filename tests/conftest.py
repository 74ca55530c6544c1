"""Test harness config: hermetic CPU backend with 8 virtual devices.

Multi-chip sharding logic is unit-tested without a TPU slice via
``--xla_force_host_platform_device_count=8`` (SURVEY.md §4).  Must run
before anything imports jax, hence conftest + env vars.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The image's sitecustomize force-registers the real-TPU ("axon") backend and
# overrides JAX_PLATFORMS; a post-import config update wins over it.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", "tests must run on the virtual CPU mesh"
assert len(jax.devices()) == 8, "expected 8 virtual devices for sharding tests"

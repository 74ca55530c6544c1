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

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

# The image's sitecustomize force-registers the real-TPU ("axon") backend and
# overrides JAX_PLATFORMS; a post-import config update wins over it.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: the suite's wall time is dominated by repeated
# CPU compiles of the same tiny-model programs across runs.
jax.config.update("jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
assert jax.default_backend() == "cpu", "tests must run on the virtual CPU mesh"
assert len(jax.devices()) == 8, "expected 8 virtual devices for sharding tests"

import jax.numpy as jnp  # noqa: E402
import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--runslow",
        action="store_true",
        default=False,
        help="also run tests marked slow (several minutes each: the "
        "full-size bring-up dry-run, full-size converter roundtrips, the "
        "bf16-vs-fp32 end-to-end drift gate)",
    )


def pytest_collection_modifyitems(config, items):
    """Default run stays under the wall-time budget (round-2 verdict Next
    #6): slow-marked tests are SKIPPED (visibly, with a reason) unless
    ``--runslow`` or RUN_SLOW=1 opts in.  bench/verify recipes and the
    pre-release checklist run with --runslow."""
    if config.getoption("--runslow") or os.environ.get("RUN_SLOW") == "1":
        return
    skip = pytest.mark.skip(reason="slow: opt in with --runslow / RUN_SLOW=1")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def tiny_editor_f32():
    """One tiny fp32 editor shared by every test module (init ~minutes on
    this 1-core CPU; tests that mutate it must restore state)."""
    from fastedit_tpu import FastEditor

    return FastEditor("tiny", dtype=jnp.float32)

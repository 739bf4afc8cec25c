"""Test harness config.

Tests run on CPU with 8 virtual devices so multi-chip sharding paths
(Mesh / shard_map / psum) are exercised without TPU hardware — the standard
JAX fake-multi-device trick (SURVEY.md §4c).  Must be set before jax import.
"""

import os

# force CPU even when the session environment pins JAX_PLATFORMS=axon (TPU):
# parity tolerances assume fp32 CPU math, and the virtual multi-device trick
# only works on the host platform.  The axon sitecustomize imports jax at
# interpreter start, so the env var alone is too late — set the config knob
# post-import as well (backends initialize lazily, so this still wins).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# persistent XLA compilation cache, shared with __graft_entry__'s
# virtual-CPU-mesh dryrun: the slow lane pre-warms the dryrun's programs
# (and repeat test runs skip their own recompiles).  Lives INSIDE the repo
# (gitignored) because /tmp is wiped on VM restarts (observed round 5).
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(_REPO, ".cache", "jax_cpu"))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)

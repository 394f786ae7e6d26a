"""Test configuration: virtual 8-device CPU mesh with float64.

Tests validate numerics against float64 ground truth on CPU; the same
code runs float32 on TPU in production. Sharding tests use the 8 virtual
devices (mirrors the driver's dryrun_multichip environment).

The axon TPU plugin (registered via sitecustomize when
``PALLAS_AXON_POOL_IPS`` is set) adds a ~90 s tunnel handshake to every
JAX process even when running on CPU, so when that variable is present
we re-exec pytest once without it before anything imports jax.
"""

import os
import sys

if os.environ.get("PALLAS_AXON_POOL_IPS") and "jax" not in sys.modules:
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["OKVIS2_TPU_TEST_REEXEC"] = "1"
    os.execve(sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:], env)

# hard-set (not setdefault): the container exports JAX_PLATFORMS=axon,
# which is unavailable once PALLAS_AXON_POOL_IPS is dropped
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_enable_x64", True)

import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Release compiled executables after each test module.

    The suite compiles hundreds of XLA CPU programs (x64, 8 virtual
    devices); each live executable holds multiple VM mappings, and a
    single pytest process crosses the kernel's vm.max_map_count
    (65530) after ~30 minutes — at which point mmap failures surface
    as SEGFAULTS inside XLA compilation and spurious native-loader
    test failures. Dropping the jit caches between modules keeps the
    map count bounded; cross-module cache reuse is minimal (different
    problem shapes), so the recompile cost is small."""
    yield
    jax.clear_caches()

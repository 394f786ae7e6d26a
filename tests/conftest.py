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

"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

The container force-registers the 'axon' TPU platform via sitecustomize and
ignores the JAX_PLATFORMS env var, so we must use jax.config to select CPU.
XLA_FLAGS must be in the environment before the CPU client initializes
(lazily, on first use) to get 8 virtual devices for sharding tests.

The suite also enables JAX's persistent compilation cache (see
zang_tpu.platform.enable_cpu_compile_cache for the mechanism and the
machine-keyed /tmp location): XLA:CPU compiles dominate suite cost, so the
first (cold) run populates the cache and warm runs are several times
faster. ZANG_JAX_CACHE=<dir> overrides the location; =0 disables.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# repo root on sys.path so `import zang_tpu` works without installation
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from zang_tpu.platform import enable_cpu_compile_cache  # noqa: E402

enable_cpu_compile_cache()

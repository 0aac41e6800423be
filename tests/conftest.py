"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Must run before any jax import. Multi-chip sharding tests use the 8 virtual
devices; kernels compile the same way they do on TPU (minus perf).
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# repo root on sys.path so `import zang_tpu` works without installation
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

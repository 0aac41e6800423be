"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

The container force-registers the 'axon' TPU platform via sitecustomize and
ignores the JAX_PLATFORMS env var, so we must use jax.config to select CPU.
XLA_FLAGS must be in the environment before the CPU client initializes
(lazily, on first use) to get 8 virtual devices for sharding tests.

The suite also enables JAX's persistent compilation cache (works fine for
XLA:CPU; it's only the remote axon TPU path that can't use it — see
graph/aotcache.py for that story). XLA:CPU compiles dominate suite cost:
a live-session block step costs ~17-19 s to compile on the 1-core box and
~4-5 s to reload, and the full suite compiles hundreds of such graphs.
First (cold) run populates the cache; warm runs are several times faster.

Safety: reloaded executables are bit-identical (XLA serializes the compiled
artifact), BUT an executable compiled on a wider-ISA machine can SIGILL on
a narrower one, so the cache dir is keyed to this machine's CPU flags +
jaxlib version and lives in /tmp (per-box). Override the location with
ZANG_TEST_JAX_CACHE=<dir>, or disable with ZANG_TEST_JAX_CACHE=0.
"""

import hashlib
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def _machine_fingerprint() -> str:
    import jaxlib

    bits = [getattr(jaxlib, "__version__", "?")]
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith("flags"):
                    bits.append(" ".join(sorted(line.split()[2:])))
                    break
    except OSError:  # pragma: no cover — non-Linux
        import platform

        bits.append(platform.machine() + platform.processor())
    return hashlib.sha1("|".join(bits).encode()).hexdigest()[:12]


_cache = os.environ.get("ZANG_TEST_JAX_CACHE", "1")
if _cache != "0":
    if _cache in ("", "1"):
        _cache = f"/tmp/zang_jax_testcache_{_machine_fingerprint()}"
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

# repo root on sys.path so `import zang_tpu` works without installation
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

"""CLI platform selection.

JAX's JAX_PLATFORMS env var is unreliable in containers that
force-register remote platform plugins (the plugin wins the default
backend even when the env var asks for cpu). jax.config applied before
backend initialization always wins, so the CLIs funnel through here:

    ZANG_PLATFORM=cpu zang-serve --port 9800

picks the platform explicitly (any value jax.config accepts: "cpu",
"tpu", a comma list, ...). Unset means JAX's normal default (the best
available platform). With ZANG_PLATFORM unset this is a no-op
everywhere. When it IS set, it applies at `import zang_tpu` too (the
package __init__ calls apply_platform_env), so embedders who export the
variable opt their whole process in — setting it after jax's backend
has initialized in the host process may be ineffective or error.
"""

import os


def apply_platform_env() -> None:
    """Apply ZANG_PLATFORM (if set) to jax.config. Must run before the
    first backend-touching jax call; safe to call more than once."""
    plat = os.environ.get("ZANG_PLATFORM")
    if not plat:
        return
    import jax

    jax.config.update("jax_platforms", plat)


def enable_cpu_compile_cache() -> str | None:
    """Enable JAX's persistent compilation cache for XLA:CPU runs (tests,
    the multichip dryrun, CPU-mode serving CLIs). XLA:CPU compiles dominate
    those paths — a live block step costs ~17-19 s to compile on a 1-core
    box and ~4-5 s to reload — and unlike the remote axon TPU path (which
    needs graph/aotcache.py's executable serialization instead), the
    standard jax cache works for CPU.

    Safety: reloaded executables are bit-identical, BUT an executable
    compiled on a wider-ISA machine can SIGILL on a narrower one, so the
    default cache dir is keyed to this machine's CPU flags + jaxlib version
    and lives in /tmp (per-box — it must never follow a repo checkout
    across machines). ZANG_JAX_CACHE=<dir> overrides the location,
    ZANG_JAX_CACHE=0 disables. Returns the dir in use, or None.

    Call AFTER selecting the cpu platform and before the first compile."""
    knob = os.environ.get("ZANG_JAX_CACHE", "1")
    if knob == "0":
        return None
    import jax

    if knob not in ("", "1"):
        path = knob
    else:
        # per-user + mode-0700: deserialized XLA executables run native
        # code, so a world-writable predictable /tmp path would let another
        # local user poison the cache into arbitrary code execution
        path = (f"/tmp/zang_jax_testcache_{os.getuid()}_"
                f"{_machine_fingerprint()}")
        try:
            os.makedirs(path, mode=0o700, exist_ok=True)
            # lstat + explicit checks: os.stat would FOLLOW a pre-created
            # symlink at this predictable name, approving an
            # attacker-chosen target directory that passes the uid/mode
            # test (cache writes would then land wherever the link points)
            st = os.lstat(path)
            import stat as _stat

            if (not _stat.S_ISDIR(st.st_mode)
                    or st.st_uid != os.getuid() or (st.st_mode & 0o022)):
                return None  # symlink/pre-created/poisonable — no caching
        except OSError:
            return None
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return path


def _machine_fingerprint() -> str:
    import hashlib

    import jaxlib

    bits = [getattr(jaxlib, "__version__", "?")]
    isa = ""
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                # x86 spells the ISA line 'flags'; ARM Linux 'Features'
                if line.startswith(("flags", "Features")):
                    isa = " ".join(sorted(line.split()[2:]))
                    break
    except OSError:
        pass
    if not isa:  # non-Linux, or an unrecognized cpuinfo layout
        import platform as _platform

        isa = _platform.machine() + _platform.processor()
    bits.append(isa)
    return hashlib.sha1("|".join(bits).encode()).hexdigest()[:12]

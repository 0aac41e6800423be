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

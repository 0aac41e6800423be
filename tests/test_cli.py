"""CLI entry points (render_wav, examples) end-to-end on tiny renders."""

import subprocess
import sys

import numpy as np

from zang_tpu.core.wav import read_wav


def test_import_initializes_no_backend():
    """Importing the framework (even the jax-heavy subpackages) must not
    initialize a JAX backend: platform selection (ZANG_PLATFORM, CLI
    mains, user jax.config calls) has to still be possible afterwards,
    and a dead remote-TPU tunnel must not hang `import zang_tpu`.
    Regression guard for module-scope jnp scalars (a jnp.float32 constant
    creates a device array at import)."""
    code = (
        "import zang_tpu.serve.server, zang_tpu.graph.render, "
        "zang_tpu.host.examples, zang_tpu.ops.filters, zang_tpu.ops.fm\n"
        "import jax._src.xla_bridge as xb\n"
        "assert not xb._backends, f'backend initialized: {list(xb._backends)}'\n"
    )
    subprocess.run([sys.executable, "-c", code], check=True, timeout=600,
                   cwd="/root/repo")


def test_zang_platform_env_selects_backend():
    """ZANG_PLATFORM=cpu forces the CPU backend through the package-import
    hook (JAX_PLATFORMS is unreliable under force-registered plugins)."""
    import os

    env = dict(os.environ, ZANG_PLATFORM="cpu")
    code = (
        "import zang_tpu\n"
        "import jax\n"
        "assert jax.default_backend() == 'cpu', jax.default_backend()\n"
    )
    subprocess.run([sys.executable, "-c", code], check=True, timeout=600,
                   cwd="/root/repo", env=env)


def test_render_wav_cli_song(tmp_path, capsys):
    from zang_tpu.host.render_wav import main

    out = tmp_path / "song.wav"
    main(["song", str(out), "--seconds", "1", "--chunk", "8192"])
    msg = capsys.readouterr().out
    assert "engine=tpu" in msg
    w = read_wav(str(out))
    pcm = np.frombuffer(w.data, dtype="<i2")
    assert w.sample_rate == 48000 and len(pcm) == 48000
    assert np.abs(pcm).max() > 100


def test_render_wav_cli_oracle_engine(tmp_path):
    from zang_tpu.host.render_wav import main

    out = tmp_path / "song_oracle.wav"
    main(["song", str(out), "--seconds", "1", "--engine", "oracle"])
    w = read_wav(str(out))
    assert len(np.frombuffer(w.data, dtype="<i2")) == 48000


def test_examples_cli(tmp_path, capsys):
    from zang_tpu.host.examples import main

    out = tmp_path / "vib.wav"
    main(["vibrato", str(out), "--seconds", "1"])
    assert "wrote" in capsys.readouterr().out
    w = read_wav(str(out))
    pcm = np.frombuffer(w.data, dtype="<i2")
    assert len(pcm) == 48000 and np.abs(pcm).max() > 50

"""CLI entry points (render_wav, examples) end-to-end on tiny renders."""

import numpy as np

from zang_tpu.core.wav import read_wav


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

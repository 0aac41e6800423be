"""Multi-chip sharding: voice-sharded render must equal the single-device
render, on an 8-virtual-device CPU mesh (conftest forces the device count)."""

import numpy as np
import pytest

import jax

from zang_tpu.core.timeline import compile_timelines
from zang_tpu.graph.fidelity import deviation_dbfs
from zang_tpu.graph.render import Performance, render_performance
from zang_tpu.host import instruments as ti
from zang_tpu.host import song as sm
from zang_tpu.parallel.mesh import make_mesh, pad_timelines, render_performance_sharded


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
class TestVoiceSharding:
    def test_sharded_equals_unsharded(self):
        sr = sm.SAMPLE_RATE
        total = int(2.0 * sr)
        song = sm.load_song()
        mesh = make_mesh(8)

        def build(padded):
            tls = [
                compile_timelines(song[i], sm.POLYPHONY[i], sr, total)
                for i in range(3)
            ]
            if padded:
                tls = [pad_timelines(t, 8) for t in tls]
            return Performance(
                [
                    (ti.PMOscInstrument(0.4, freq_fn=sm.pedal_freq), tls[0]),
                    (ti.NiceInstrument(0.25), tls[1]),
                    (ti.NiceInstrument(0.1), tls[2]),
                ],
                sr,
            )

        base = render_performance(build(False), total, chunk_size=16384)
        sharded = render_performance_sharded(
            build(True), total, mesh, chunk_size=16384)
        dev = deviation_dbfs(base, sharded)
        # silent padded voices contribute exact zeros; remaining deviation is
        # reduction-order ulps in the cross-device mix sum
        assert dev[0] < -120.0, dev

    def test_dryrun_entrypoint(self):
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)

    def test_entry_compiles(self):
        import __graft_entry__ as ge

        fn, args = ge.entry()
        out = jax.jit(fn)(*args)
        assert np.isfinite(np.asarray(out)).all()


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
class TestShardedPallasKernels:
    """GSPMD sharding over the PRODUCTION kernel path.

    The default gate (ops/pallas_mode.enabled) falls back to the affine
    scans on CPU, so the plain sharding tests never exercise the Pallas
    SVF/table kernels. ZANG_PALLAS_INTERPRET=1 forces the kernel paths in
    interpreter mode on the virtual mesh; a GSPMD partitioning bug in the
    kernels would surface here instead of only on real multi-chip hardware.
    """

    def test_sharded_pallas_interpret_equals_unsharded(self, monkeypatch):
        from zang_tpu.ops import pallas_svf

        calls = {"table": 0, "plain": 0}
        orig_table = pallas_svf.svf_filter_pallas_table
        orig_plain = pallas_svf.svf_filter_pallas

        def spy_table(*a, **k):
            calls["table"] += 1
            assert k.get("interpret"), "kernel must run in interpret mode on CPU"
            return orig_table(*a, **k)

        def spy_plain(*a, **k):
            calls["plain"] += 1
            assert k.get("interpret"), "kernel must run in interpret mode on CPU"
            return orig_plain(*a, **k)

        monkeypatch.setattr(pallas_svf, "svf_filter_pallas_table", spy_table)
        monkeypatch.setattr(pallas_svf, "svf_filter_pallas", spy_plain)
        monkeypatch.setenv("ZANG_PALLAS_INTERPRET", "1")

        sr = sm.SAMPLE_RATE
        total = int(1.0 * sr)
        song = sm.load_song()
        mesh = make_mesh(8)

        def build(padded):
            tls = [
                compile_timelines(song[i], sm.POLYPHONY[i], sr, total)
                for i in range(3)
            ]
            if padded:
                tls = [pad_timelines(t, 8) for t in tls]
            return Performance(
                [
                    (ti.PMOscInstrument(0.4, freq_fn=sm.pedal_freq), tls[0]),
                    (ti.NiceInstrument(0.25), tls[1]),
                    (ti.NiceInstrument(0.1), tls[2]),
                ],
                sr,
            )

        base = render_performance(build(False), total, chunk_size=16384)
        assert calls["table"] + calls["plain"] > 0, (
            "Pallas kernel path was not taken — gate regressed")
        n_unsharded = calls["table"] + calls["plain"]
        sharded = render_performance_sharded(
            build(True), total, mesh, chunk_size=16384)
        assert calls["table"] + calls["plain"] > n_unsharded
        dev = deviation_dbfs(base, sharded)
        # identical kernel arithmetic on both sides; only the cross-device
        # mix reduction order differs
        assert dev[0] < -120.0, dev


class TestShardedPostFx:
    def test_poly_echo_sharded_equals_unsharded(self):
        # stereo-echoes post chain: per-part states shard on voices, the
        # post-fx delay lines replicate (their leading axis is time and
        # 15000 % 8 == 0 would otherwise shard it by accident)
        from zang_tpu.host import configs
        from zang_tpu.parallel.mesh import make_mesh, render_performance_sharded
        from zang_tpu.graph.render import render_performance

        perf, total = configs.build_poly_echo_performance(
            num_voices=16, seconds=1.5, sample_rate=44100.0, main_delay=15000)
        ref = render_performance(perf, total, chunk_size=8192)
        mesh = make_mesh(8)
        got = render_performance_sharded(perf, total, mesh, chunk_size=8192)
        assert got.shape == ref.shape
        d = np.asarray(got, np.float64) - np.asarray(ref, np.float64)
        rms_db = 20 * np.log10(np.sqrt((d ** 2).mean()) + 1e-30)
        assert rms_db < -120.0, rms_db

"""Signal object tests: attribute preservation, mapping round trips, pytree behaviour.

Mirrors the reference's type/attribute-preservation contract tests
(test/test_signalobject.py) for the pytree design.
"""
import pickle

import numpy as np
import qampy_tpu as qt
import jax
import jax.numpy as jnp
import pytest

from qampy_tpu.signals import (
    Signal, SignalQAMGrayCoded, SignalPSKGrayCoded, SymbolOnlySignal,
    ResampledQAM, TDHQAMSymbols, SignalWithPilots, RandomBits, PRBSBits,
)


class TestConstruction:
    @pytest.mark.parametrize("M", [4, 16, 64, 128])
    @pytest.mark.parametrize("nmodes", [1, 2, 3])
    def test_shape_and_power(self, M, nmodes):
        s = SignalQAMGrayCoded(M, 2 ** 12, nmodes=nmodes, seed=7)
        assert s.shape == (nmodes, 2 ** 12)
        assert np.isclose(np.mean(abs(np.asarray(s)) ** 2), 1, atol=0.05)

    def test_symbols_are_constellation_points(self):
        s = SignalQAMGrayCoded(16, 1000, seed=3)
        cs = np.asarray(s.coded_symbols)
        assert np.all(np.isin(np.round(np.asarray(s), 5), np.round(cs, 5)))

    @pytest.mark.parametrize("dt", [np.complex64])
    def test_dtype(self, dt):
        s = SignalQAMGrayCoded(64, 1000, dtype=dt)
        assert s.dtype == dt

    def test_prbs_bits(self):
        s = SignalQAMGrayCoded(4, 1000, nmodes=2, bitclass=PRBSBits)
        assert s.shape == (2, 1000)

    def test_psk(self):
        s = SignalPSKGrayCoded(8, 1000)
        assert np.allclose(abs(np.asarray(s)), 1, atol=1e-6)

    def test_symbol_only(self):
        alphabet = np.array([1 + 1j, 1 - 1j, -1 + 1j, -1 - 1j]) / np.sqrt(2)
        s = SymbolOnlySignal(4, 1000, alphabet, nmodes=2, seed=0)
        assert s.shape == (2, 1000)
        with pytest.raises(NotImplementedError):
            s.cal_ber()

    def test_resampled_qam(self):
        s = ResampledQAM(16, 2 ** 12, fs=2, seed=0)
        assert s.shape[-1] == 2 ** 13
        assert s.os == 2
        assert s.symbols.shape[-1] == 2 ** 12

    def test_tdhqam_frame_structure(self):
        s = TDHQAMSymbols((16, 4), 1000, fr=0.5, seed=0)
        assert s.f_M == 2
        out = np.asarray(s)
        # equal-distance power scaling: the scaled M2 symbols in the frame
        # have the same minimum point spacing as the M1 symbols
        d1 = np.min(abs(np.diff(np.unique(out[:, ::2].real))))
        d2 = np.min(abs(np.diff(np.unique(out[:, 1::2].real))))
        assert np.isclose(d1, d2, rtol=0.05)


class TestAttributePreservation:
    """Every array op must preserve signal attributes (reference test_signalobject contract)."""

    def setup_method(self):
        self.s = SignalQAMGrayCoded(16, 1000, nmodes=2, fb=10e9, seed=5)

    def test_arithmetic(self):
        for out in (self.s * 2, self.s + 1, self.s - 0.5, self.s / 2.0, -self.s):
            assert isinstance(out, SignalQAMGrayCoded)
            assert out.M == 16
            assert out.fb == 10e9
            assert out.symbols is self.s.symbols

    def test_getitem(self):
        out = self.s[:, ::2]
        assert isinstance(out, SignalQAMGrayCoded)
        assert out.shape == (2, 500)
        assert out.M == 16

    def test_signal_times_signal(self):
        out = self.s * self.s
        assert isinstance(out, SignalQAMGrayCoded)

    def test_pickle_roundtrip(self):
        import qampy_tpu.core.io as qio
        data = pickle.dumps(qio._to_host(self.s))
        s2 = pickle.loads(data)
        assert s2.M == self.s.M
        assert s2.fb == self.s.fb
        assert np.allclose(np.asarray(s2), np.asarray(self.s))

    def test_save_load(self, tmp_path):
        from qampy_tpu.core.io import load_signal
        fn = str(tmp_path / "sig.sig")
        self.s.save_to_file(fn)
        s2 = load_signal(fn)
        assert s2.M == self.s.M
        assert np.allclose(np.asarray(s2), np.asarray(self.s))


class TestPytree:
    def test_flatten_unflatten(self):
        s = SignalQAMGrayCoded(16, 100, nmodes=2, seed=1)
        leaves, treedef = jax.tree_util.tree_flatten(s)
        s2 = jax.tree_util.tree_unflatten(treedef, leaves)
        assert isinstance(s2, SignalQAMGrayCoded)
        assert s2.M == s.M
        assert np.allclose(np.asarray(s2), np.asarray(s))

    def test_jit_through(self):
        s = SignalQAMGrayCoded(16, 100, nmodes=2, seed=1)

        @jax.jit
        def f(sig):
            return sig * 2

        out = f(s)
        assert isinstance(out, SignalQAMGrayCoded)
        assert out.M == 16
        assert np.allclose(np.asarray(out), 2 * np.asarray(s))


class TestModulation:
    @pytest.mark.parametrize("M", [4, 16, 64])
    def test_bit_roundtrip(self, M):
        s = SignalQAMGrayCoded(M, 1000, seed=2)
        bits = s.demodulate(s.samples)
        assert np.array_equal(bits, s.bits)

    def test_modulate_demodulate(self):
        s = SignalQAMGrayCoded(16, 500, seed=9)
        syms = s.modulate(s.bits)
        assert np.allclose(np.asarray(syms), np.asarray(s), atol=1e-6)

    def test_from_bit_array(self):
        bits = RandomBits(4000, nmodes=2, seed=11)
        s = SignalQAMGrayCoded.from_bit_array(bits, 16)
        assert s.shape == (2, 1000)
        assert np.array_equal(s.demodulate(s.samples), np.asarray(bits))

    def test_from_symbol_array(self):
        s1 = SignalQAMGrayCoded(16, 1000, seed=4)
        s2 = SignalQAMGrayCoded.from_symbol_array(np.asarray(s1), M=16)
        assert np.allclose(np.asarray(s1), np.asarray(s2), atol=1e-6)
        assert np.array_equal(s2.bits, s1.bits)


class TestResample:
    def test_resample_length_and_back(self):
        s = SignalQAMGrayCoded(16, 2 ** 12, fb=10e9, seed=6)
        up = s.resample(20e9, beta=0.1)
        assert up.shape[-1] == 2 ** 13
        assert up.fs == 20e9
        assert up.os == 2
        down = up.resample(10e9, beta=0.1)
        assert down.shape[-1] == 2 ** 12
        # round trip recovers the symbols (up to filter edge effects)
        ser = down.cal_ser(down.samples / np.sqrt(np.mean(abs(np.asarray(down)) ** 2)))
        assert np.all(np.asarray(ser) < 1e-3)


class TestPilotSignal:
    def test_frame_layout(self):
        s = SignalWithPilots(64, 2 ** 12, 256, 32, nframes=2, seed=1)
        assert s.shape == (1, 2 ** 13)
        assert s.frame_len == 2 ** 12
        assert s.pilot_seq.shape[-1] == 256
        # pilot index layout: first 256 samples are the pilot sequence
        assert np.all(~s._idx_dat[:256])
        # phase pilots every 32 symbols; the sample right after the sequence
        # also counts as a pilot (reference layout, signals.py:1532-1545)
        npilots = np.count_nonzero(~s._idx_dat)
        assert npilots == 256 + (2 ** 12 - 256) // 32

    def test_get_data_roundtrip(self):
        s = SignalWithPilots(16, 2 ** 12, 128, 16, nframes=2, seed=3)
        data = s.get_data()
        assert np.allclose(np.asarray(data), np.tile(np.asarray(s.symbols), (1, 2)))
        assert np.all(np.asarray(data.cal_ser(synced=True)) == 0)

    def test_extract_pilots(self):
        s = SignalWithPilots(16, 2 ** 12, 128, 16, nframes=1, seed=3)
        p = s.extract_pilots()
        assert np.allclose(np.asarray(p), np.asarray(s.pilots))

    def test_frame_metrics(self):
        s = SignalWithPilots(64, 2 ** 12, 128, 16, nframes=1, seed=8)
        assert np.all(np.asarray(s.cal_ser()) == 0)
        assert np.all(np.asarray(s.cal_ber()) == 0)
        rng = np.random.default_rng(0)
        noisy = s.replace(samples=s.samples + 0.01 * (
            rng.standard_normal(s.shape) + 1j * rng.standard_normal(s.shape)).astype(np.complex64))
        gmi, _ = noisy.cal_gmi()
        assert np.all(gmi > 5.8)


class TestSignalContracts:
    """Extended attribute/type contracts (reference test_signalobject.py depth)."""

    def test_symbols_preserved_through_chain(self):
        import jax.random as jr
        from qampy_tpu import impairments
        s = qt.SignalQAMGrayCoded(16, 2 ** 12, nmodes=2, fb=10e9, seed=20)
        chain = impairments.change_snr(s.resample(20e9, beta=0.1), 20, key=jr.PRNGKey(0))
        assert chain.symbols is s.symbols
        assert chain.coded_symbols is s.coded_symbols

    def test_os_property(self):
        s = qt.SignalQAMGrayCoded(4, 2 ** 10, fb=10e9, seed=21)
        assert s.os == 1
        up = s.resample(40e9, beta=0.2)
        assert up.os == 4

    def test_recreate_with_fb_scales_fs(self):
        s = qt.SignalQAMGrayCoded(4, 2 ** 10, fb=10e9, seed=22).resample(20e9, beta=0.1)
        out = s.recreate_from_np_array(np.asarray(s), fb=20e9)
        assert out.fb == 20e9
        assert out.fs == 40e9  # os preserved

    def test_qpsk_from_bert(self):
        s = qt.QPSKfromBERT(2 ** 12, nmodes=2)
        assert s.M == 4
        assert np.all(np.asarray(s.cal_ser(synced=True)) == 0)

    def test_psk_ber(self):
        import jax.random as jr
        from qampy_tpu import impairments
        s = qt.SignalPSKGrayCoded(8, 2 ** 14, seed=23)
        n = impairments.change_snr(s, 20, key=jr.PRNGKey(1))
        assert np.all(np.asarray(n.cal_ber(synced=True)) < 1e-2)

    def test_symbol_only_ser(self):
        alphabet = np.exp(2j * np.pi * np.arange(8) / 8)
        s = SymbolOnlySignal(8, 2 ** 12, alphabet, nmodes=1, seed=24)
        assert np.all(np.asarray(s.cal_ser(synced=True)) == 0)

    def test_pilot_signal_resample_roundtrip(self):
        s = SignalWithPilots(16, 2 ** 12, 128, 16, nframes=2, fb=10e9, seed=25)
        up = s.resample(20e9, beta=0.1)
        assert isinstance(up, SignalWithPilots)
        assert up.frame_len == s.frame_len
        assert up.nframes == 2  # frame counting is os-aware
        down = up.resample(10e9, beta=0.1)
        assert np.all(np.asarray(down.normalize_and_center().cal_ser()) < 1e-2)

    def test_bits_shape(self):
        s = qt.SignalQAMGrayCoded(64, 1000, nmodes=3, seed=26)
        assert s.bits.shape == (3, 6000)
        assert s.Nbits == 6


class TestTDHQAMConstruction:
    def test_from_symbol_arrays(self):
        s1 = qt.SignalQAMGrayCoded(16, 1024, nmodes=2, seed=5)
        s2 = qt.SignalQAMGrayCoded(64, 1024, nmodes=2, seed=6)
        td = TDHQAMSymbols.from_symbol_arrays(s1, s2, 0.5)
        assert td.shape == (2, 2048)
        assert td.M == (16, 64)
        assert td.symbols_M1 is s1
        # interleaved content matches the sources at the frame positions
        arr = np.asarray(td)
        assert np.allclose(arr[:, 0::2], np.asarray(s1))

    def test_hybrid_dataframe(self):
        from qampy_tpu.core import pilotbased_transmitter as ptx
        sig, payload = ptx.gen_dataframe_with_phasepilots_hybridmodulation(
            M=(16, 64), mod_ratio=(1, 1), npols=2, frame_len=2 ** 12,
            pilot_seq_len=256, pilot_ins_ratio=32, seed=7)
        assert sig.frame_len == 2 ** 12
        assert np.asarray(sig.pilot_seq).shape == (2, 256)
        assert payload.M == (16, 64)


def test_signalbase_alias():
    from qampy_tpu.signals import SignalBase, Signal
    assert SignalBase is Signal

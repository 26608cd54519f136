"""Impairment simulator tests (mirrors reference test/test_impairments.py)."""
import numpy as np
import jax.random as jr
import pytest

import qampy_tpu as qt
from qampy_tpu import impairments
from qampy_tpu.core import impairments as cimp


class TestAttributePreservation:
    def setup_method(self):
        self.sig = qt.SignalQAMGrayCoded(16, 2 ** 12, nmodes=2, fb=20e9, seed=1)
        self.up = self.sig.resample(40e9, beta=0.1)

    @pytest.mark.parametrize("fct", [
        lambda s: impairments.apply_PMD(s, np.pi / 5, 50e-12),
        lambda s: impairments.apply_phase_noise(s, 1e4, key=jr.PRNGKey(0)),
        lambda s: impairments.change_snr(s, 20, key=jr.PRNGKey(0)),
        lambda s: impairments.add_carrier_offset(s, 1e8),
        lambda s: impairments.add_dispersion(s, 16e-6, 100),
        lambda s: impairments.simulate_transmission(s, snr=25, key=jr.PRNGKey(0)),
    ])
    def test_preserves_type_and_attrs(self, fct):
        out = fct(self.up)
        assert isinstance(out, qt.SignalQAMGrayCoded)
        assert out.M == 16
        assert out.fs == 40e9
        assert out.dtype == self.up.dtype
        assert out.shape == self.up.shape


class TestPhysics:
    def test_pmd_preserves_power(self):
        sig = qt.SignalQAMGrayCoded(4, 2 ** 12, nmodes=2, seed=2)
        out = impairments.apply_PMD(sig, np.pi / 4, 100e-12)
        p_in = np.mean(np.abs(np.asarray(sig)) ** 2)
        p_out = np.mean(np.abs(np.asarray(out)) ** 2)
        assert np.isclose(p_in, p_out, rtol=1e-3)

    def test_change_snr_calibration(self):
        sig = qt.SignalQAMGrayCoded(16, 2 ** 14, nmodes=1, seed=3)
        out = impairments.change_snr(sig, 18, key=jr.PRNGKey(1))
        snr_est = float(np.asarray(out.est_snr(synced=True))[0])
        assert abs(10 * np.log10(snr_est) - 18) < 0.3

    def test_phase_noise_variance(self):
        ph = np.asarray(cimp.phase_noise((4, 10000), 1e5, 1e9, key=jr.PRNGKey(2)))
        # Wiener process: var grows linearly, var(ph[n]) = n * 2pi*df/fs
        var_end = np.var(ph[:, -1])
        expected = 10000 * 2 * np.pi * 1e5 / 1e9
        assert 0.2 * expected < var_end < 5 * expected

    def test_dispersion_is_invertible(self):
        sig = qt.SignalQAMGrayCoded(4, 2 ** 12, fb=25e9, seed=4)
        up = sig.resample(50e9, beta=0.1)
        d = impairments.add_dispersion(up, 17e-6, 1e4)
        back = impairments.add_dispersion(d, -17e-6, 1e4)
        assert np.allclose(np.asarray(back), np.asarray(up), atol=1e-3)

    def test_carrier_offset_shifts_spectrum(self):
        # need an oversampled (spectrally confined) signal for a measurable
        # centroid shift; at 1 SPS the white spectrum just wraps around
        sig = qt.SignalQAMGrayCoded(4, 2 ** 12, fb=10e9, seed=5).resample(40e9, beta=0.1)
        off = impairments.add_carrier_offset(sig, 2e9)
        S0 = np.abs(np.fft.fft(np.asarray(sig)[0]))
        S1 = np.abs(np.fft.fft(np.asarray(off)[0]))
        f = np.fft.fftfreq(S0.shape[0], 1 / 40e9)
        c0 = np.sum(f * S0 ** 2) / np.sum(S0 ** 2)
        c1 = np.sum(f * S1 ** 2) / np.sum(S1 ** 2)
        assert abs((c1 - c0) - 2e9) < 2e8

    def test_modal_delay(self):
        sig = qt.SignalQAMGrayCoded(4, 1000, nmodes=2, seed=6)
        out = impairments.add_modal_delay(sig, (10, 0))
        assert np.allclose(np.asarray(out)[0], np.roll(np.asarray(sig)[0], 10))
        assert np.allclose(np.asarray(out)[1], np.asarray(sig)[1])


class TestTransceiver:
    def test_quantization_levels(self):
        sig = qt.SignalQAMGrayCoded(16, 2 ** 12, seed=7)
        out = np.asarray(cimp.quantize_signal_New(np.asarray(sig), nbits=3,
                                                  rescale_in=True, rescale_out=False))
        assert np.unique(np.round(out.real, 6)).size <= 8
        assert np.unique(np.round(out.imag, 6)).size <= 8

    def test_dac_sim_runs(self):
        sig = qt.SignalQAMGrayCoded(16, 2 ** 12, fb=20e9, seed=8).resample(40e9, beta=0.2)
        out = impairments.sim_DAC_response(sig, enob=5, clip_rat=0.9, quant_bits=6,
                                           key=jr.PRNGKey(3), cutoff=18e9)
        assert out.shape == sig.shape
        # quality degrades but signal survives
        snr = float(np.mean(np.asarray(out.resample(20e9, beta=0.2).normalize_and_center().est_snr())))
        assert snr > 10

    def test_modulator_response_small_signal(self):
        sig = qt.SignalQAMGrayCoded(16, 2 ** 12, seed=9)
        out = impairments.sim_mod_response(sig * 0.2, dcbias=1.0)
        # small-drive MZM is approximately linear: signal recoverable
        out = out.normalize_and_center()
        ser = np.asarray(out.cal_ser())
        assert np.all(ser < 0.1)

    def test_enob_awgn_snr(self):
        sig = qt.SignalQAMGrayCoded(4, 2 ** 14, seed=10)
        out, snr_enob = cimp.apply_enob_as_awgn(np.asarray(sig), 4, verbose=True,
                                                key=jr.PRNGKey(5))
        est = float(np.asarray(qt.Signal(out, symbols=sig.symbols,
                                         coded_symbols=sig.coded_symbols,
                                         M=4).est_snr(synced=True))[0])
        assert abs(10 * np.log10(est) - float(snr_enob)) < 1.5

"""Metric tests: decisions, SNR/EVM/GMI/MI vs theory and deterministic cases.

Mirrors reference test/test_signal_quality_calc.py and the deterministic
single-symbol corruption checks in test/test_pilot_signal.py:230-299.
"""
import numpy as np
import jax.random as jr
import pytest

import qampy_tpu as qt
from qampy_tpu import theory, impairments
from qampy_tpu.core import metrics


class TestDecisions:
    @pytest.mark.parametrize("M", [4, 16, 64, 128])
    def test_exact_on_constellation(self, M):
        s = qt.SignalQAMGrayCoded(M, 1000, seed=1)
        det, dist, idx = metrics.make_decision(s.samples[0], s.coded_symbols)
        assert np.allclose(np.asarray(det), np.asarray(s)[0], atol=1e-6)
        assert np.allclose(np.asarray(dist), 0, atol=1e-3)

    def test_matches_brute_force(self, rng):
        s = qt.SignalQAMGrayCoded(64, 1, seed=1)
        z = (rng.standard_normal(500) + 1j * rng.standard_normal(500)).astype(np.complex64)
        det, dist, idx = metrics.make_decision(z, s.coded_symbols)
        cs = np.asarray(s.coded_symbols)
        ref_idx = np.argmin(np.abs(z[:, None] - cs[None, :]), axis=-1)
        assert np.array_equal(np.asarray(idx), ref_idx)

    def test_det_symbol(self):
        s = qt.SignalQAMGrayCoded(16, 1, seed=1)
        cs = np.asarray(s.coded_symbols)
        sym, d = metrics.det_symbol(cs[3] + 0.01, s.coded_symbols)
        assert np.isclose(complex(sym), complex(cs[3]))


class TestDeterministicErrors:
    """Single-symbol corruption with exact expected SER/BER (reference strategy)."""

    def test_one_symbol_error(self):
        s = qt.SignalQAMGrayCoded(16, 1000, nmodes=1, seed=2)
        arr = np.asarray(s).copy()
        cs = np.asarray(s.coded_symbols)
        # replace symbol 100 with a different constellation point
        cur = arr[0, 100]
        other = cs[np.argmax(np.abs(cs - cur))]
        arr[0, 100] = other
        ser = float(np.asarray(s.cal_ser(arr, synced=True))[0])
        assert np.isclose(ser, 1 / 1000)

    def test_known_bit_errors(self):
        s = qt.SignalQAMGrayCoded(16, 1000, nmodes=1, seed=3)
        arr = np.asarray(s).copy()
        cs = np.asarray(s.coded_symbols)
        det, dist, idx = metrics.make_decision(arr[0], s.coded_symbols)
        # move symbol 50 to an adjacent point (gray coding -> exactly 1 bit)
        i0 = int(np.asarray(idx)[50])
        d = np.abs(cs - cs[i0])
        adj = np.argsort(d)[1]
        arr[0, 50] = cs[adj]
        nbits_changed = np.count_nonzero(s._encoding[i0] ^ s._encoding[adj])
        ber = float(np.asarray(s.cal_ber(arr, synced=True))[0])
        assert np.isclose(ber, nbits_changed / (1000 * 4))
        assert nbits_changed == 1  # gray code property


class TestSNRvsTheory:
    @pytest.mark.parametrize("snr_db", [10, 15, 20])
    @pytest.mark.parametrize("M", [4, 16])
    def test_ser_matches_theory(self, snr_db, M):
        s = qt.SignalQAMGrayCoded(M, 2 ** 16, seed=snr_db + M)
        n = impairments.change_snr(s, snr_db, key=jr.PRNGKey(snr_db))
        ser = float(np.asarray(n.cal_ser(synced=True))[0])
        ser_th = float(theory.ser_vs_es_over_n0_qam(10 ** (snr_db / 10), M))
        if M == 4:
            # M=4 formula above only valid for M>4; use PSK formula
            ser_th = float(theory.ser_vs_es_over_n0_psk(10 ** (snr_db / 10), 4))
        if ser_th > 1e-3:
            assert abs(ser - ser_th) / ser_th < 0.2

    def test_evm_matches_snr(self):
        s = qt.SignalQAMGrayCoded(16, 2 ** 15, seed=5)
        n = impairments.change_snr(s, 20, key=jr.PRNGKey(2))
        evm = float(np.asarray(n.cal_evm(synced=True))[0])
        assert abs(-20 * np.log10(evm) - 20) < 0.5

    def test_blind_snr_estimators(self):
        s = qt.SignalQAMGrayCoded(16, 2 ** 15, seed=6)
        n = impairments.change_snr(s, 15, key=jr.PRNGKey(3))
        snr_blind = float(np.asarray(metrics.cal_snr_qam(np.asarray(n)[0], 16)))
        assert abs(10 * np.log10(snr_blind) - 15) < 1.0
        s0 = float(np.asarray(metrics.cal_s0(np.asarray(n)[0], 16)))
        assert abs(s0 - 1.0) < 0.15


class TestSoftDemapper:
    def test_llr_signs_match_bits(self):
        s = qt.SignalQAMGrayCoded(16, 2 ** 12, seed=7)
        n = impairments.change_snr(s, 20, key=jr.PRNGKey(4))
        snr_lin = 10 ** (20 / 10)
        llr = np.asarray(metrics.soft_l_value_demapper(np.asarray(n)[0], snr_lin,
                                                       s.bitmap_mtx))
        bits = np.asarray(s.bits)[0].reshape(-1, 4)
        # LLR > 0 <=> bit 1 (overwhelmingly, at 20 dB)
        agreement = np.mean((llr > 0) == bits)
        assert agreement > 0.99

    def test_minmax_close_to_exact(self):
        s = qt.SignalQAMGrayCoded(16, 2 ** 10, seed=8)
        n = impairments.change_snr(s, 15, key=jr.PRNGKey(5))
        snr_lin = 10 ** (15 / 10)
        llr1 = np.asarray(metrics.soft_l_value_demapper(np.asarray(n)[0], snr_lin, s.bitmap_mtx))
        llr2 = np.asarray(metrics.soft_l_value_demapper_minmax(np.asarray(n)[0], snr_lin, s.bitmap_mtx))
        assert np.corrcoef(llr1.flatten(), llr2.flatten())[0, 1] > 0.99


class TestMutualInformation:
    def test_gmi_approaches_capacity(self):
        s = qt.SignalQAMGrayCoded(16, 2 ** 14, seed=9)
        n = impairments.change_snr(s, 25, key=jr.PRNGKey(6))
        gmi, per_bit = n.cal_gmi()
        assert 3.9 < gmi[0] <= 4.0 + 1e-9

    def test_mi_monotonic_in_snr(self):
        s = qt.SignalQAMGrayCoded(16, 2 ** 13, seed=10)
        mis = []
        for snr in (5, 12, 25):
            n = impairments.change_snr(s, snr, key=jr.PRNGKey(snr))
            mis.append(float(n.cal_mi(snr=snr)[0]))
        assert mis[0] < mis[1] < mis[2]
        assert mis[2] <= 4.0 + 0.05

    def test_gmi_mc_vs_theory_shape(self):
        gmi = theory.cal_gmi(64, np.array([15, 25]), N=300)
        assert gmi[0] < gmi[1] <= 6.0 + 1e-6

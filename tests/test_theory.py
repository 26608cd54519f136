"""Constellation/theory tests (mirrors reference test/test_signalobject.py:56-127 strategy)."""
import numpy as np
import pytest

from qampy_tpu import theory


class TestConstellations:
    @pytest.mark.parametrize("M", [4, 16, 64, 256])
    def test_square_qam_size(self, M):
        s = theory.cal_symbols_qam(M)
        assert s.size == M
        assert np.unique(s).size == M

    @pytest.mark.parametrize("M", [8, 32, 128])
    def test_cross_qam_size(self, M):
        s = theory.cal_symbols_qam(M)
        assert s.size == M
        assert np.unique(s).size == M

    @pytest.mark.parametrize("M", [4, 16, 32, 64, 128, 256])
    def test_scaling_normalises_power(self, M):
        s = theory.cal_symbols_qam(M) / np.sqrt(theory.cal_scaling_factor_qam(M))
        assert np.isclose(np.mean(abs(s) ** 2), 1, atol=1e-6)

    @pytest.mark.parametrize("M", [4, 8, 16, 64])
    def test_psk_unit_power(self, M):
        s = theory.cal_symbols_psk(M)
        assert np.allclose(abs(s), 1)
        assert np.unique(np.round(s, 10)).size == M

    @pytest.mark.parametrize("M", [4, 16, 64, 128])
    def test_gray_code_is_permutation(self, M):
        g = theory.gray_code_qam(M)
        assert np.array_equal(np.sort(g), np.arange(M))

    @pytest.mark.parametrize("M", [16, 64])
    def test_gray_neighbours_differ_by_one_bit(self, M):
        # gray coding: adjacent constellation points along the I axis of a
        # square QAM differ by exactly one bit
        g = theory.gray_code_qam(M)
        L = int(np.sqrt(M))
        codes = g.reshape(L, L)
        for row in codes:
            d = row[1:] ^ row[:-1]
            assert all(bin(x).count("1") == 1 for x in d)


class TestAnalytic:
    def test_ser_decreases_with_snr(self):
        snr = np.array([10 ** (x / 10) for x in (10, 15, 20, 25)])
        ser = np.asarray(theory.ser_vs_es_over_n0_qam(snr, 16))
        assert np.all(np.diff(ser) < 0)

    def test_ber_qam_matches_qpsk_limit(self):
        # QPSK BER at Es/N0 -> Eb/N0 relation: BER(10dB Es/N0) about 7.8e-4
        ber = float(theory.ber_vs_es_over_n0_qam(10 ** (10 / 10), 4))
        assert 5e-4 < ber < 1e-3

    def test_ps_probabilities(self):
        symbs, px = theory.cal_ps_probablts(theory.cal_symbols_qam(64), 0.1)
        assert np.isclose(px.sum(), 1)
        # heavier weight on inner points
        assert px[np.argmin(abs(symbs))] > px[np.argmax(abs(symbs))]

    def test_gmi_monte_carlo(self):
        gmi = theory.cal_gmi(16, 25, N=500)
        assert 3.8 < gmi[0] <= 4.0 + 1e-6

    def test_sim_mi_mc(self):
        mi = theory.sim_mi_mc(theory.cal_symbols_qam(4), 20, 2000)
        assert 1.9 < mi <= 2.0 + 1e-6

"""Carrier/phase recovery functional tests.

Mirrors reference test/test_signal_recover_functional.py:10-46 (BPS exact
recovery) and test/test_phaserec.py (attribute preservation).
"""
import numpy as np
import jax.random as jr
import pytest

import qampy_tpu as qt
from qampy_tpu import phaserec, impairments, helpers
from qampy_tpu.ops import phase as core_phase


def _noisy_phase_signal(M, lw, N=2 ** 16, snr=30, seed=2, fb=40e9):
    s = qt.SignalQAMGrayCoded(M, N, fb=fb, seed=seed)
    s = impairments.change_snr(s, snr, key=jr.PRNGKey(seed))
    return impairments.apply_phase_noise(s, lw, key=jr.PRNGKey(seed + 1))


class TestBPS:
    @pytest.mark.parametrize("M", [4, 16, 64])
    @pytest.mark.parametrize("lw", [100, 1000])
    def test_exact_recovery(self, M, lw):
        pp = _noisy_phase_signal(M, lw)
        rec, ph = phaserec.bps(pp, max(M, 32), 14)
        rec = rec.replace(samples=helpers.dump_edges(rec.samples, 20))
        assert np.allclose(np.asarray(rec.cal_ser()), 0)

    @pytest.mark.parametrize("M", [4, 64])
    def test_twostage(self, M):
        pp = _noisy_phase_signal(M, 500)
        rec, ph = phaserec.bps_twostage(pp, max(4, M // 2), 14)
        rec = rec.replace(samples=helpers.dump_edges(rec.samples, 20))
        assert np.allclose(np.asarray(rec.cal_ser()), 0)

    def test_attributes_preserved(self):
        pp = _noisy_phase_signal(4, 100, N=2 ** 14)
        rec, ph = phaserec.bps(pp, 32, 10)
        assert rec.M == 4
        assert rec.fb == pp.fb

    def test_select_angle_index_parity(self, rng):
        """bps_idx windowed argmin matches the reference C loop semantics."""
        x = rng.standard_normal((64, 8)).astype(np.float64)
        N = 4
        # reference select_angle_index loop (pythran_dsp.py:26-42)
        L, A = x.shape
        csum = np.zeros((L, A))
        idx_ref = np.zeros(L, dtype=np.int32)
        for i in range(1, L):
            csum[i] = csum[i - 1] + x[i]
            if i >= N:
                d = csum[i] - csum[i - N]
                idx_ref[i - N // 2] = np.argmin(d)
        got = np.asarray(core_phase._select_angle_index(
            np.vstack([np.zeros((1, A)), x[1:]]), N))
        assert np.array_equal(got, idx_ref)

    def test_select_angle_index_precision_at_2e21(self, rng):
        """The windowed argmin must stay exact at L=2^21 in float32.

        A single full-length f32 cumsum accumulates to ~2^21 where one ulp
        is 0.125 — larger than the 0.112 total per-window advantage planted
        here — so the pre-hardening implementation mis-picks a large
        fraction of positions. The tiled re-based cumsum must recover the
        planted argmin everywhere.
        """
        L, A, N2 = 2 ** 21, 8, 56
        true_a = 3
        base = rng.uniform(0.5, 1.5, size=L).astype(np.float32)
        x = np.broadcast_to(base[:, None], (L, A)).copy()
        x[:, true_a] -= 2e-3  # exact per-window margin: N2*2e-3 = 0.112
        got = np.asarray(core_phase._select_angle_index(
            x.astype(np.float32), N2))
        interior = got[N2 - N2 // 2: L - N2 // 2]
        frac_ok = np.mean(interior == true_a)
        assert frac_ok == 1.0, "windowed argmin lost precision: %.4f ok" % frac_ok


class TestViterbiViterbi:
    @pytest.mark.parametrize("M", [4])
    def test_qpsk_recovery(self, M):
        pp = _noisy_phase_signal(M, 100, snr=25)
        rec, ph = phaserec.viterbiviterbi(pp, 11)
        rec = rec.replace(samples=helpers.dump_edges(rec.samples, 20))
        ser = np.asarray(rec.cal_ser())
        assert np.all(ser < 1e-3)


class TestQPSKPartitioning:
    def test_16qam_partition_recovery(self):
        pp = _noisy_phase_signal(16, 50, snr=30)
        rec, ph = phaserec.phase_partition_16qam(pp, 128)
        rec = rec.replace(samples=helpers.dump_edges(rec.samples, 200))
        ser = np.asarray(rec.cal_ser())
        assert np.all(ser < 1e-2)


class TestFOE:
    @pytest.mark.parametrize("M", [4, 64])
    def test_find_and_comp(self, M):
        fb = 40e9
        s = qt.SignalQAMGrayCoded(M, 2 ** 16, fb=fb, seed=3)
        s = impairments.change_snr(s, 30, key=jr.PRNGKey(5))
        fo = 5e7
        off = impairments.add_carrier_offset(s, fo)
        est = phaserec.find_freq_offset(off, fft_size=2 ** 16)
        est_hz = float(np.asarray(est)[0, 0]) * fb
        assert abs(est_hz - fo) < 2 * fb / 2 ** 16  # within FFT bin resolution
        comp = phaserec.comp_freq_offset(off, np.asarray(est))
        rec, ph = phaserec.bps(comp, 32, 14)
        rec = rec.replace(samples=helpers.dump_edges(rec.samples, 20))
        assert np.all(np.asarray(rec.cal_ser()) < 1e-3)

"""Sequence sync tests (mirrors reference test/test_ber_functions.py)."""
import numpy as np
import pytest

import qampy_tpu as qt
from qampy_tpu.core import sync


@pytest.fixture
def seqs(rng):
    x = (rng.standard_normal(4096) + 1j * rng.standard_normal(4096)).astype(np.complex64)
    return x


class TestFindOffset:
    @pytest.mark.parametrize("shift", [0, 1, 43, 1000, -43])
    def test_roll_recovery(self, seqs, shift):
        y = np.roll(seqs, shift)
        idx = int(sync.find_sequence_offset(seqs, y))
        assert np.allclose(np.roll(y, idx), seqs, atol=1e-5)

    @pytest.mark.parametrize("rot", [0, 1, 2, 3])
    @pytest.mark.parametrize("shift", [0, 200])
    def test_complex_rotation(self, seqs, rot, shift):
        y = np.roll(seqs, shift) * (1j ** rot)
        idx, yc, ii, acm = sync.find_sequence_offset_complex(seqs, y)
        assert np.allclose(np.roll(np.asarray(yc), int(idx)), seqs, atol=1e-4)

    def test_subsequence(self, seqs):
        sub = seqs[100:500]
        idx = int(sync.find_sequence_offset(sub, seqs))
        # rolling the long sequence by idx aligns its start with sub
        assert np.allclose(np.roll(seqs, int(idx))[:400], sub, atol=1e-5)


class TestSyncAndAdjust:
    @pytest.mark.parametrize("adjust", ["tx", "rx"])
    def test_equal_length(self, seqs, adjust):
        y = np.roll(seqs, 123)
        (tx, rx), acm = sync.sync_and_adjust(seqs, y, adjust=adjust)
        assert np.allclose(np.asarray(tx), np.asarray(rx), atol=1e-5)

    @pytest.mark.parametrize("adjust", ["tx", "rx"])
    def test_shorter_tx(self, seqs, adjust):
        tx_in = seqs[:1024]
        rx_in = np.tile(tx_in, 4)
        rx_in = np.roll(rx_in, 77)
        (tx, rx), acm = sync.sync_and_adjust(tx_in, rx_in, adjust=adjust)
        assert tx.shape == rx.shape
        errs = np.mean(np.abs(np.asarray(tx) - np.asarray(rx)) > 1e-4)
        assert errs < 0.01

    def test_adjust_data_length_truncate(self, seqs):
        a, b = sync.adjust_data_length(seqs, seqs[:100], method="truncate")
        assert a.shape == b.shape == (100,)

    def test_adjust_data_length_extend_periodic(self):
        x = np.arange(10)
        a, b = sync.adjust_data_length(x, np.arange(25), method="extend")
        assert np.array_equal(np.asarray(a), np.tile(x, 3)[:25])

    def test_extend_with_offset(self):
        x = np.arange(7)
        out = np.asarray(sync._extend_with_offset(x, 20, 3))
        ref = np.asarray([x[(i - 3) % 7] for i in range(20)])
        assert np.array_equal(out, ref)


class TestBERCounting:
    def test_cal_ber_syncd(self):
        tx = np.random.default_rng(1).integers(0, 2, 1000).astype(bool)
        rx = tx.copy()
        rx[:10] = ~rx[:10]
        ber, errs, N = sync.cal_ber_syncd(rx, tx)
        assert errs == 10
        assert np.isclose(ber, 0.01)

    def test_threshold_raises(self):
        tx = np.zeros(100, dtype=bool)
        rx = ~tx
        with pytest.raises(ValueError):
            sync.cal_ber_syncd(rx, tx)


class TestSignalLevelSync:
    def test_cal_ser_with_rolled_noisy_signal(self):
        import jax.random as jr
        from qampy_tpu import impairments
        sig = qt.SignalQAMGrayCoded(16, 2 ** 14, nmodes=2, seed=11)
        n = impairments.change_snr(sig, 20, key=jr.PRNGKey(0))
        rolled = n.replace(samples=np.roll(np.asarray(n), 1234, axis=-1))
        ser = np.asarray(rolled.cal_ser())
        assert np.all(ser < 1e-2)

    def test_mode_swap_recovered(self):
        import jax.random as jr
        from qampy_tpu import impairments
        sig = qt.SignalQAMGrayCoded(16, 2 ** 13, nmodes=2, seed=12)
        n = impairments.change_snr(sig, 25, key=jr.PRNGKey(0))
        swapped = n.replace(samples=np.asarray(n)[::-1])
        ser = np.asarray(swapped.cal_ser())
        assert np.all(ser < 1e-3)


class TestBerNosyncd:
    def test_offset_and_errors(self):
        rng = np.random.default_rng(0)
        tx = rng.integers(0, 2, 5000).astype(bool)
        rx = np.roll(tx, 137).copy()
        flip = rng.choice(5000, 25, replace=False)
        rx[flip] = ~rx[flip]
        ber, errs, N = sync.cal_ber_nosyncd(rx, tx)
        assert errs <= 27
        assert ber < 0.01

    def test_inverted_data(self):
        rng = np.random.default_rng(1)
        tx = rng.integers(0, 2, 4096).astype(bool)
        rx = np.roll(~tx, 5)
        ber, errs, N = sync.cal_ber_nosyncd(rx, tx)
        assert ber == 0

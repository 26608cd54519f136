"""PRBS generation tests (kernel parity with the reference LFSRs)."""
import numpy as np
import pytest

from qampy_tpu import prbs


def _prbs_ext_loop(seed, taps, nbits, N):
    """Direct port of the reference bit loop (pythran_dsp.py:156-166) as oracle."""
    out = np.zeros(N, dtype=np.uint8)
    sr = seed
    for i in range(N):
        xor = 0
        for t in taps:
            if (sr & (1 << (nbits - t))) != 0:
                xor ^= 1
        sr = (xor << nbits - 1) + (sr >> 1)
        out[i] = xor
    return out


class TestPRBS:
    @pytest.mark.parametrize("order,taps", [(7, (7, 6)), (15, (15, 14)), (23, (23, 18))])
    def test_chunked_matches_bit_loop(self, order, taps):
        seed = (1 << order) - 1
        N = 4096
        assert np.array_equal(prbs.prbs_ext(seed, taps, order, N),
                              _prbs_ext_loop(seed, taps, order, N))

    @pytest.mark.parametrize("order,taps", [(7, (7, 6)), (15, (15, 14))])
    def test_random_seeds(self, order, taps, rng):
        for _ in range(5):
            seed = int(rng.integers(1, 2 ** order))
            N = 1000
            assert np.array_equal(prbs.prbs_ext(seed, taps, order, N),
                                  _prbs_ext_loop(seed, taps, order, N))

    def test_period_prbs7(self):
        out = prbs.make_prbs_extXOR(7, 127 * 2)
        assert np.array_equal(out[:127], out[127:254])
        # maximal length sequence: all-ones count = 64 per period
        assert out[:127].sum() == 64

    def test_make_prbs_intXOR(self):
        out = prbs.make_prbs_intXOR(7, 254)
        assert out.dtype == bool
        assert np.array_equal(out[:127], out[127:254])

    def test_short_sequence(self):
        # N smaller than the register order exercises the exact-loop branch
        a = prbs.prbs_ext((1 << 15) - 1, (15, 14), 15, 10)
        b = _prbs_ext_loop((1 << 15) - 1, (15, 14), 15, 10)
        assert np.array_equal(a, b)


class TestLFSRGenerators:
    def test_lfsr_ext_matches_make_prbs(self):
        from qampy_tpu import utils
        g = utils.lfsr_ext(0b1011, [7, 6], 7)
        bits = np.array([next(g)[0] for _ in range(200)], dtype=bool)
        ref = np.asarray(prbs.make_prbs_extXOR(7, 200, 0b1011)).astype(bool)
        assert np.array_equal(bits, ref)

    def test_lfsr_int_period(self):
        from qampy_tpu import utils
        # x^7 + x + 1 over GF(2): maximal length 127
        g = utils.lfsr_int(1, 0b10000011)
        states = [next(g)[1] for _ in range(127)]
        assert len(set(states)) == 127

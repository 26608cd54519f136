"""Dtype support tests: complex64 default, complex128 under x64.

Mirrors the reference's systematic dtype parametrisation
(test/test_signalobject.py:948-1040, test/test_phaserec.py:106-122).
"""
import numpy as np
import pytest
import jax

import qampy_tpu as qt
from qampy_tpu import equalisation, impairments, phaserec


class TestComplex64:
    def test_signal_chain_stays_c64(self):
        import jax.random as jr
        sig = qt.SignalQAMGrayCoded(16, 2 ** 13, nmodes=2, dtype=np.complex64, seed=1)
        up = sig.resample(2 * sig.fb, beta=0.1)
        assert up.dtype == np.complex64
        n = impairments.change_snr(up, 25, key=jr.PRNGKey(0))
        assert n.dtype == np.complex64
        E, w, err = equalisation.equalise_signal(n, 1e-3, Ntaps=11, method="cma",
                                                 apply=True)
        assert E.dtype == np.complex64
        assert np.asarray(w).dtype == np.complex64


class TestComplex128:
    def test_x64_roundtrip(self):
        # complex128 requires the x64 context
        with jax.enable_x64():
            sig = qt.SignalQAMGrayCoded(16, 2 ** 10, nmodes=1, dtype=np.complex128, seed=2)
            assert sig.dtype == np.complex128
            ser = np.asarray(sig.cal_ser(synced=True))
            assert np.all(ser == 0)

    def test_x64_equalisation(self):
        import jax.random as jr
        with jax.enable_x64():
            sig = qt.SignalQAMGrayCoded(4, 2 ** 13, nmodes=2, dtype=np.complex128, seed=3)
            up = sig.resample(2 * sig.fb, beta=0.1)
            n = impairments.change_snr(up, 20, key=jr.PRNGKey(1))
            E, w, err = equalisation.equalise_signal(n, 1e-3, Ntaps=11, method="cma",
                                                     adaptive_stepsize=True, apply=True)
            assert np.asarray(E).dtype == np.complex128
            assert np.all(np.asarray(E.cal_ser()) < 1e-3)

    def test_c64_vs_c128_agree(self):
        """Numeric drift check: complex64 matches complex128 within tolerance."""
        import jax.random as jr
        rng = np.random.default_rng(5)
        E = (rng.standard_normal((2, 2048)) + 1j * rng.standard_normal((2, 2048)))
        from qampy_tpu.ops import equaliser as eqops
        w64 = np.asarray(eqops.train_equaliser_seq(
            E.astype(np.complex64), 500, 1, 2, 1e-3,
            eqops._init_taps(11, 2, 2, np.complex64),
            np.tile(eqops._cal_Rconstant(4) + 0j, (2, 1)).astype(np.complex64),
            "cma")[1])
        with jax.enable_x64():
            w128 = np.asarray(eqops.train_equaliser_seq(
                E.astype(np.complex128), 500, 1, 2, 1e-3,
                eqops._init_taps(11, 2, 2, np.complex128),
                np.tile(eqops._cal_Rconstant(4) + 0j, (2, 1)).astype(np.complex128),
                "cma")[1])
        assert np.allclose(w64, w128, atol=1e-4)

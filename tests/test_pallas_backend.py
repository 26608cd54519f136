"""Pallas equaliser backend: parity with the lax.scan reference recurrence.

Runs in interpreter mode on CPU; on TPU the same kernel compiles via Mosaic.
"""
import numpy as np
import pytest

from qampy_tpu.ops import equaliser as eqops
from qampy_tpu.ops.equaliser_pallas import train_equaliser_pallas, PALLAS_METHODS


@pytest.fixture
def field(rng):
    return (rng.standard_normal((2, 4096)) +
            1j * rng.standard_normal((2, 4096))).astype(np.complex64)


class TestPallasParity:
    @pytest.mark.parametrize("method", ["cma", "mcma", "rde"])
    @pytest.mark.parametrize("adaptive", [False, True])
    def test_matches_seq_backend(self, field, method, adaptive):
        M = 16
        w0 = eqops._init_taps(11, 2, 2, np.complex64)
        syms = eqops._reshape_symbols(None, method, M, np.complex64, 2)
        _, w_s, mu_s = eqops.train_equaliser_seq(field, 1000, 1, 2, 1e-3, w0, syms,
                                                 method, adaptive=adaptive)
        _, w_p, mu_p = train_equaliser_pallas(field, 1000, 1, 2, 1e-3, w0, syms,
                                              method, adaptive=adaptive, interpret=True)
        assert np.allclose(np.asarray(w_s), np.asarray(w_p), atol=1e-4)
        assert np.allclose(np.asarray(mu_s), np.asarray(mu_p), atol=1e-6)

    def test_niter(self, field):
        w0 = eqops._init_taps(11, 2, 2, np.complex64)
        syms = eqops._reshape_symbols(None, "cma", 4, np.complex64, 2)
        _, w_s, _ = eqops.train_equaliser_seq(field, 500, 3, 2, 1e-3, w0, syms, "cma")
        _, w_p, _ = train_equaliser_pallas(field, 500, 3, 2, 1e-3, w0, syms, "cma",
                                           interpret=True)
        assert np.allclose(np.asarray(w_s), np.asarray(w_p), atol=1e-4)

    def test_unknown_method_raises(self, field):
        w0 = eqops._init_taps(11, 2, 2, np.complex64)
        syms = eqops._reshape_symbols(None, "sbd", 16, np.complex64, 2)
        with pytest.raises(AssertionError):
            train_equaliser_pallas(field, 100, 1, 2, 1e-3, w0, syms, "sbd",
                                   interpret=True)

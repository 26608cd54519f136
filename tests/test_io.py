"""IO tests mirroring the reference suite (test/test_io.py).

Covers zlib-pickle persistence at every compression level, attribute
preservation through the save/load round trip, and the matlab import key
schemas (single key, split real/imag keys, dim2cmplx portmaps, fake
pol-mux).
"""
import os
import tempfile

import numpy as np
import numpy.testing as npt
import pytest
from scipy.io import savemat

from qampy_tpu import io, signals


class TestSave:
    @pytest.mark.parametrize("lvl", np.arange(1, 6))
    def test_file_exists(self, lvl):
        fn = os.path.join(tempfile.mkdtemp(), "tmp")
        sig = signals.SignalQAMGrayCoded(4, 2 ** 12, nmodes=1)
        io.save_signal(fn, sig, int(lvl))
        assert os.path.isfile(fn)

    @pytest.mark.parametrize("nmodes", [1, 2, 3])
    def test_compare_to_load(self, nmodes):
        fn = os.path.join(tempfile.mkdtemp(), "tmp")
        sig = signals.SignalQAMGrayCoded(4, 2 ** 12, nmodes=nmodes)
        io.save_signal(fn, sig, 4)
        sigld = io.load_signal(fn)
        npt.assert_array_almost_equal(np.asarray(sig), np.asarray(sigld))

    @pytest.mark.parametrize("lvl", np.arange(1, 6))
    def test_attrs_preserved(self, lvl):
        fn = os.path.join(tempfile.mkdtemp(), "tmp")
        sig = signals.SignalQAMGrayCoded(4, 2 ** 12, nmodes=1, fb=24e9)
        io.save_signal(fn, sig, int(lvl))
        sigld = io.load_signal(fn)
        for attr in ["fb", "M", "fs"]:
            assert getattr(sig, attr) == getattr(sigld, attr)
        npt.assert_array_almost_equal(np.asarray(sig.symbols),
                                      np.asarray(sigld.symbols))

    def test_pilot_signal_roundtrip(self):
        fn = os.path.join(tempfile.mkdtemp(), "tmp")
        sig = signals.SignalWithPilots(64, 2 ** 12, 256, 32, nframes=1, nmodes=2)
        io.save_signal(fn, sig, 4)
        sigld = io.load_signal(fn)
        npt.assert_array_almost_equal(np.asarray(sig), np.asarray(sigld))
        assert sig.pilot_seq_len == sigld.pilot_seq_len
        assert sig.frame_len == sigld.frame_len
        npt.assert_array_almost_equal(np.asarray(sig.pilots),
                                      np.asarray(sigld.pilots))


class TestMatIO:
    @pytest.mark.parametrize("nmodes", [1, 2, 3])
    def test_load_single_key(self, nmodes):
        sig = signals.SignalQAMGrayCoded(16, 2 ** 14, nmodes=nmodes, fb=20e9)
        fn = os.path.join(tempfile.mkdtemp(), "tmp")
        savemat(fn, {"sig": np.asarray(sig.symbols)})
        sigout = io.load_symbols_from_matlab_file(fn, sig.M, (("sig",),),
                                                  fb=sig.fb, normalise=False)
        assert sig.fb == sigout.fb
        assert sig.M == sigout.M
        npt.assert_almost_equal(np.asarray(sig.symbols), np.asarray(sigout),
                                decimal=5)

    def test_load_real_imag_keys(self):
        sig = signals.SignalQAMGrayCoded(16, 2 ** 14, nmodes=2, fb=20e9)
        fn = os.path.join(tempfile.mkdtemp(), "tmp")
        s = np.asarray(sig.symbols)
        savemat(fn, {"re": s.real, "im": s.imag})
        sigout = io.load_symbols_from_matlab_file(fn, sig.M, (("re", "im"),),
                                                  fb=sig.fb, normalise=False)
        npt.assert_almost_equal(s, np.asarray(sigout), decimal=5)

    @pytest.mark.parametrize("nmodes", [1, 2])
    def test_load_dim2cmplx(self, nmodes):
        sig = signals.SignalQAMGrayCoded(16, 2 ** 14, nmodes=nmodes, fb=20e9)
        fn = os.path.join(tempfile.mkdtemp(), "tmp")
        s = np.asarray(sig.symbols)
        rows = {}
        keys = []
        for i in range(nmodes):
            rows["r%d" % i] = s[i].real
            rows["i%d" % i] = s[i].imag
            keys.append(("r%d" % i,))
            keys.append(("i%d" % i,))
        savemat(fn, rows)
        portmap = [[2 * i, 2 * i + 1] for i in range(nmodes)]
        sigout = io.load_symbols_from_matlab_file(
            fn, sig.M, keys, fb=sig.fb, normalise=False, dim2cmplx=True,
            portmap=portmap)
        npt.assert_almost_equal(s, np.asarray(sigout), decimal=5)

    def test_fake_polmux(self):
        sig = signals.SignalQAMGrayCoded(16, 2 ** 12, nmodes=1, fb=20e9)
        fn = os.path.join(tempfile.mkdtemp(), "tmp")
        savemat(fn, {"sig": np.asarray(sig.symbols)})
        sigout = io.load_symbols_from_matlab_file(
            fn, sig.M, (("sig",),), fb=sig.fb, normalise=False,
            fake_polmux=True)
        assert np.asarray(sigout).shape[0] == 2
        npt.assert_almost_equal(np.asarray(sigout)[0], np.asarray(sigout)[1],
                                decimal=6)

    def test_create_signal_from_matlab(self):
        sig = signals.SignalQAMGrayCoded(16, 2 ** 12, nmodes=1, fb=20e9)
        up = sig.resample(40e9, beta=0.1)
        fn = os.path.join(tempfile.mkdtemp(), "tmp")
        savemat(fn, {"dat": np.asarray(up)})
        out = io.create_signal_from_matlab(sig, fn, 40e9, (("dat",),))
        assert out.fs == 40e9
        assert out.M == sig.M
        npt.assert_almost_equal(np.asarray(up), np.asarray(out), decimal=5)

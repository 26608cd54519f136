"""Helper/analog-frontend/digital-precomp/io tests (mirrors reference
test/test_helpers.py + analog frontend usage)."""
import numpy as np
import pytest

import qampy_tpu as qt
from qampy_tpu import helpers, analog_frontend
from qampy_tpu.core import analog_frontend as caf
from qampy_tpu.core import digital_pre_compensation as dpc
from qampy_tpu.core.io import save_signal, load_signal


class TestHelpers:
    def test_normalise_and_center(self, rng):
        x = (rng.standard_normal((2, 1000)) * 3 + 2 +
             1j * rng.standard_normal((2, 1000))).astype(np.complex64)
        out = np.asarray(helpers.normalise_and_center(x))
        assert np.allclose(np.mean(out, axis=-1), 0, atol=1e-5)
        assert np.allclose(np.mean(np.abs(out) ** 2, axis=-1), 1, atol=1e-5)

    def test_db_roundtrip(self):
        assert np.isclose(float(helpers.dB2lin(helpers.lin2dB(42.0))), 42.0)

    def test_rescale_signal(self, rng):
        x = (rng.standard_normal((2, 256)) * 5).astype(np.float32) + 0j
        out = np.asarray(helpers.rescale_signal(x, swing=1))
        assert np.isclose(np.abs(out.real).max(), 1, atol=1e-6)

    def test_dump_edges(self):
        x = np.arange(20).reshape(2, 10)
        out = np.asarray(helpers.dump_edges(x, 2))
        assert out.shape == (2, 6)

    def test_cabssquared(self):
        assert float(helpers.cabssquared(np.complex64(3 + 4j))) == 25.0


class TestAnalogFrontend:
    def test_orthonormalize_fixes_iq_imbalance(self, rng):
        sig = qt.SignalQAMGrayCoded(4, 2 ** 14, seed=1)
        x = np.asarray(sig)
        # introduce amplitude + phase imbalance between I and Q
        bad = x.real * 1.3 + 1j * (x.imag * 0.8 + 0.2 * x.real)
        fixed = np.asarray(caf.orthonormalize_signal(bad[None, :] if bad.ndim == 1 else bad))
        I, Q = fixed.real, fixed.imag
        corr = np.mean(I * Q) / np.sqrt(np.mean(I ** 2) * np.mean(Q ** 2))
        assert abs(corr) < 0.02
        assert np.isclose(np.mean(I ** 2) / np.mean(Q ** 2), 1, atol=0.12)

    def test_comp_iq_imbalance(self, rng):
        sig = qt.SignalQAMGrayCoded(4, 2 ** 14, seed=2)
        x = np.asarray(sig)[0]
        bad = x.real + 1j * (x.imag * 0.7 + 0.3 * x.real)
        fixed = np.asarray(caf.comp_IQ_inbalance(bad))
        corr = np.mean(fixed.real * fixed.imag)
        assert abs(corr) < 0.02

    def test_comp_rf_delay_roundtrip(self, rng):
        x = rng.standard_normal((1, 1024)).astype(np.float64)
        delayed = np.asarray(caf.comp_rf_delay(x, 1e-11, 50e9))
        restored = np.asarray(caf.comp_rf_delay(delayed, -1e-11, 50e9))
        assert np.allclose(restored, x, atol=1e-6)


class TestDigitalPrecomp:
    def test_clipper(self):
        x = np.array([[3 + 0.5j, -2 - 3j, 0.1 + 0.1j]])
        out = np.asarray(dpc.clipper(x, 1.0))
        assert np.all(np.abs(out.real) <= 1.0 + 1e-6)
        assert np.all(np.abs(out.imag) <= 1.0 + 1e-6)

    def test_comp_mod_sin_inverts_sine(self):
        x = (np.linspace(-0.9, 0.9, 100) + 1j * np.linspace(-0.9, 0.9, 100))
        pre = np.asarray(dpc.comp_mod_sin(x, vpi=1.0))
        # modulator sin response: sin(pre/(2*vpi)) == x
        assert np.allclose(np.sin(pre.real / 2), x.real, atol=1e-5)

    def test_find_sym_patterns(self):
        ref = np.array([-1., 1.])
        sig = np.array([1., -1., 1., 1., -1.])
        idx = np.asarray(dpc.find_sym_patterns(sig, ref, 2))
        # pattern index = 2*first + second over the wrapped windows
        assert idx.shape == (5,)
        assert idx[0] == 2 * 1 + 0  # (1, -1)

    def test_cal_lut_recovers_pattern_error(self, rng):
        # a deterministic pattern-dependent error must appear in the LUT
        ref = np.unique(np.array([-1., 1.]))
        tx = rng.choice([-1., 1.], 4096) + 1j * rng.choice([-1., 1.], 4096)
        err_mag = 0.11
        # error depends on the current symbol's sign pattern
        rx = tx - err_mag * np.sign(tx.real)
        ea, idx_I, idx_Q = dpc.cal_lut(tx, rx, ref + 1j * ref, mem_len=1)
        ea = np.asarray(ea)
        assert np.allclose(np.abs(ea.real), err_mag, atol=0.01)

    def test_comp_dac_resp_shape(self):
        p = dpc.comp_dac_resp(20e9, 4096, 0.1)
        assert p.shape == (4096,)
        assert np.iscomplexobj(p)


class TestIO:
    def test_pilot_signal_roundtrip(self, tmp_path):
        s = qt.SignalWithPilots(16, 2 ** 12, 128, 16, nframes=2, seed=1)
        fn = str(tmp_path / "pilot.sig")
        save_signal(fn, s)
        s2 = load_signal(fn)
        assert s2.frame_len == s.frame_len
        assert np.allclose(np.asarray(s2), np.asarray(s))

    def test_matlab_import(self, tmp_path):
        from scipy.io import savemat
        from qampy_tpu.core.io import ndarray_from_matlab
        fn = str(tmp_path / "dat.mat")
        a = np.random.randn(2, 100)
        b = np.random.randn(2, 100)
        savemat(fn, {"re": a, "im": b})
        out = ndarray_from_matlab(fn, [["re", "im"]])
        assert np.allclose(out, a + 1j * b)


REFERENCE_MAT = "/root/reference/Scripts/data/20GBaud_SRRC0P05_64QAM_PRBS15.mat"


class TestRealData:
    @pytest.mark.skipif(not __import__("os").path.exists(REFERENCE_MAT),
                        reason="reference data file not available")
    def test_load_real_symbols_and_recover(self):
        """Real measured 64-QAM symbol set through a synthetic channel.

        Mirrors the Scripts/64qam_data_test.py workload with a simulated
        waveform (the measured scope file is not bundled).
        """
        import jax.random as jr
        from qampy_tpu import io as qio
        from qampy_tpu import equalisation, impairments, helpers as qhelpers
        symbs = qio.load_symbols_from_matlab_file(REFERENCE_MAT, 64, (("X_Symbs",),),
                                                  fb=20e9, normalise=True,
                                                  fake_polmux=True)
        assert symbs.shape == (2, 32768)
        sig = symbs.resample(2 * symbs.fb, beta=0.05)
        sig = impairments.change_snr(sig, 30, key=jr.PRNGKey(0))
        sig = impairments.apply_PMD(sig, np.pi / 5.6, 30e-12)
        E, wxy, err = equalisation.dual_mode_equalisation(
            sig, (6e-4, 6e-4), 17, methods=("mcma", "sbd"),
            adaptive_stepsize=(True, True))
        E = E.replace(samples=qhelpers.normalise_and_center(E.samples))
        gmi, _ = E.cal_gmi()
        assert np.all(gmi > 5.5)


def test_set_mid_and_resale_reference_alias():
    x = np.linspace(-2, 3, 64)[None, :]
    out = helpers.set_mid_and_resale(x, mid_pos=0, swing=1)
    assert helpers.set_mid_and_resale is helpers.set_mid_and_rescale
    assert abs(float(np.max(np.asarray(out).real)) - 1) < 1e-6
    assert abs(float(np.min(np.asarray(out).real)) + 1) < 1e-6

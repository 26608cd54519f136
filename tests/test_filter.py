"""Filter/resampling tests (mirrors reference test/test_filter.py, test/test_resample.py)."""
import numpy as np
import pytest

import qampy_tpu as qt
from qampy_tpu.core import filter as cfilter
from qampy_tpu.core import resample as cresample
from qampy_tpu.core import special
from qampy_tpu import filtering


class TestMovingAverage:
    def test_numeric_cases(self):
        # reference test/test_filter.py:9-23 numeric cases
        out = np.asarray(cfilter.moving_average(np.arange(1., 6.), N=3))
        assert np.allclose(out, [2., 3., 4.])
        out2 = np.asarray(cfilter.moving_average(np.arange(1., 10.), N=3))
        assert out2.shape[0] == 7

    def test_2d(self):
        x = np.arange(12.).reshape(2, 6)
        out = np.asarray(cfilter.moving_average(x, N=3))
        assert out.shape == (2, 4)


class TestRRC:
    def test_freq_response_bounds(self):
        f = np.linspace(-2, 2, 1001)
        h = np.asarray(special.rrcos_freq(f, 0.2, 1.0))
        assert h.max() <= 1.0 + 1e-6
        assert np.allclose(h[np.abs(f) > 0.6 * (1 + 0.2)], 0)

    def test_time_freq_consistency(self):
        # FFT of the truncated impulse response approximates the freq response
        taps = 501
        fs = 8.0
        t = (np.arange(taps) - taps // 2) / fs
        ht = np.asarray(special.rrcos_time(t, 0.3, 1.0))
        H = np.abs(np.fft.fft(ht / ht.sum()))
        f = np.fft.fftfreq(taps) * fs
        Href = np.asarray(special.rrcos_freq(f, 0.3, 1.0))
        Href = Href / Href.max()
        assert np.allclose(H[np.abs(f) < 0.3], Href[np.abs(f) < 0.3], atol=0.05)

    def test_pulseshaping_preserves_length(self):
        sig = qt.SignalQAMGrayCoded(4, 2 ** 12, fb=10e9, seed=0)
        out = filtering.rrcos_pulseshaping(sig, 0.2)
        assert out.shape == sig.shape
        assert isinstance(out, qt.SignalQAMGrayCoded)


class TestFilterSignal:
    @pytest.mark.parametrize("ftype", ["bessel", "butter", "gauss", "exp"])
    def test_lowpass_attenuates(self, ftype):
        fs = 16.0
        t = np.arange(2 ** 12) / fs
        lo = np.sin(2 * np.pi * 0.5 * t)
        hi = np.sin(2 * np.pi * 6.0 * t)
        x = (lo + hi)[None, :]
        y = np.asarray(cfilter.filter_signal(x, fs, 1.0, ftype=ftype, order=4)).real
        # high-frequency energy reduced by >10x, low frequency mostly intact
        X = np.abs(np.fft.rfft(x[0]))
        Y = np.abs(np.fft.rfft(y[0]))
        fbin_hi = int(6.0 / fs * 2 ** 12)
        fbin_lo = int(0.5 / fs * 2 ** 12)
        assert Y[fbin_hi] < 0.15 * X[fbin_hi]
        # gauss/exp cutoffs are half-power-style definitions (reference
        # core/filter.py:110-122), so the passband edge sits near 0.5
        assert Y[fbin_lo] > 0.35 * X[fbin_lo]

    def test_sosfilt_matches_scipy(self, rng):
        import scipy.signal as scisig
        x = rng.standard_normal((2, 512)).astype(np.float32)
        sos = scisig.bessel(2, 0.2, 'low', norm='mag', output='sos', fs=2)
        ref = scisig.sosfilt(sos, x, axis=-1)
        got = np.asarray(cfilter._sosfilt_scan(sos, x))
        assert np.allclose(got, ref, atol=1e-4)


class TestResample:
    @pytest.mark.parametrize("up", [2, 4])
    def test_length(self, up, rng):
        x = (rng.standard_normal(2 ** 10) + 1j * rng.standard_normal(2 ** 10)).astype(np.complex64)
        out = np.asarray(cresample.rrcos_resample(x, 1.0, float(up), beta=0.2))
        assert out.shape[0] == 2 ** 10 * up

    def test_rational(self, rng):
        x = (rng.standard_normal(3 ** 6) + 0j).astype(np.complex64)
        out = np.asarray(cresample.rrcos_resample(x, 2.0, 3.0, beta=0.2))
        assert out.shape[0] == int(np.ceil(3 ** 6 * 3 / 2))

    @pytest.mark.parametrize("beta", [0.1, 0.03, 0.01])
    def test_impulse_matches_rrcos_time(self, beta):
        # reference test/test_resample.py:16-27: resampling a unit impulse
        # with RRC shaping reproduces the analytic RRC time response
        N = 1000
        x = np.zeros(N, dtype=np.complex64)
        x[N // 2] = 1
        xn = np.asarray(cresample.rrcos_resample(x, 1.0, 4.0, Ts=1, beta=beta)).real
        t = np.linspace(0, N, xn.shape[0], endpoint=False) - N // 2
        b = np.asarray(special.rrcos_time(t, beta, 1))
        xn = xn / xn.max()
        b = b / b.max()
        assert np.allclose(xn, b, atol=0.06)

    def test_spectrum_confined_after_shaping(self):
        sig = qt.SignalQAMGrayCoded(4, 2 ** 12, fb=10e9, seed=1)
        up = sig.resample(40e9, beta=0.1)
        S = np.abs(np.fft.fft(np.asarray(up)[0]))
        f = np.fft.fftfreq(up.shape[-1], 1 / 40e9)
        # energy outside (1+beta)*fb/2 should be negligible
        out_band = S[np.abs(f) > 0.58 * 10e9]
        assert out_band.max() < 0.01 * S.max()


class TestPreFilter:
    def test_brickwall(self, rng):
        x = (rng.standard_normal((1, 1024)) + 1j * rng.standard_normal((1, 1024))).astype(np.complex64)
        y = np.asarray(cfilter.pre_filter_wdm(x, 0.5, 2.0))
        Y = np.abs(np.fft.fft(y[0]))
        f = np.fft.fftfreq(1024, 1 / 2.0)
        assert np.allclose(Y[np.abs(f) > 0.26], 0, atol=1e-5)


class TestAnalogLsim:
    """filter_signal(analog=True) vs scipy.signal.lsim element-wise
    (reference core/filter.py:110-140 is exactly scipy lsim per mode)."""

    @pytest.mark.parametrize("ftype,order", [("bessel", 2), ("butter", 4)])
    def test_matches_scipy_lsim_real(self, ftype, order):
        import jax
        import scipy.signal as scisig
        with jax.enable_x64():
            rng = np.random.default_rng(11)
            fs, cutoff, N = 4.0, 0.3, 512
            u = rng.standard_normal((2, N))
            got = np.asarray(cfilter.filter_signal(
                u, fs, cutoff, ftype=ftype, order=order, analog=True))
            Wn = cutoff * 2 * np.pi
            if ftype == "bessel":
                system = scisig.bessel(order, Wn, 'low', norm='mag',
                                       analog=True, output='ba')
            else:
                system = scisig.butter(order, Wn, 'low', analog=True,
                                       output='ba')
            t = np.arange(N) / fs
            want = np.stack([scisig.lsim(system, u[i], t)[1]
                             for i in range(2)])
            np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-10)

    def test_complex_deviation_pinned(self):
        # scipy/reference lsim CASTS COMPLEX TO REAL (ComplexWarning in
        # scipy _ltisys.py) — the documented deviation: qampy_tpu applies
        # the linear system to both quadratures, so Re(out) matches the
        # reference exactly and Im(out) is the (physically meant) filtered
        # Q component instead of zero.
        import jax
        import scipy.signal as scisig
        with jax.enable_x64():
            rng = np.random.default_rng(5)
            fs, cutoff, N = 4.0, 0.25, 256
            u = (rng.standard_normal(N) + 1j * rng.standard_normal(N))
            got = np.asarray(cfilter.filter_signal(
                u, fs, cutoff, ftype="bessel", order=2, analog=True))
            system = scisig.bessel(2, cutoff * 2 * np.pi, 'low', norm='mag',
                                   analog=True, output='ba')
            t = np.arange(N) / fs
            with pytest.warns(Warning):
                ref_out = scisig.lsim(system, u, t)[1]   # drops Im
            np.testing.assert_allclose(got.real, ref_out.real,
                                       rtol=1e-8, atol=1e-10)
            want_im = scisig.lsim(system, u.imag, t)[1]
            np.testing.assert_allclose(got.imag, want_im,
                                       rtol=1e-8, atol=1e-10)

    def test_signal_object_wrapper(self):
        sig = qt.SignalQAMGrayCoded(4, 2 ** 12, nmodes=2, seed=0)
        s2 = sig.resample(2 * sig.fb, beta=0.2)
        out = filtering.filter_signal_analog(s2, s2.fb * 0.75)
        assert out.samples.shape == s2.samples.shape
        assert out.fb == s2.fb
        # a 0.75*fb bessel keeps most of the in-band energy
        p_in = float(np.mean(np.abs(np.asarray(s2.samples)) ** 2))
        p_out = float(np.mean(np.abs(np.asarray(out.samples)) ** 2))
        assert 0.5 * p_in < p_out <= 1.1 * p_in


class TestIIRParallelPrefix:
    """The associative-scan IIR forms (used above IIR_ASSOC_MIN_SAMPLES,
    serving sizes) vs the exact sequential scan recurrence and scipy."""

    def test_sosfilt_assoc_matches_scan(self, rng):
        import scipy.signal as scisig
        sos = scisig.bessel(4, 0.2, 'low', norm='mag', output='sos', fs=2)
        x = rng.standard_normal((2, 5000)).astype(np.float32)
        a = np.asarray(cfilter._sosfilt_assoc(sos, x))
        b = np.asarray(cfilter._sosfilt_scan(sos, x))
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)

    def test_sosfilt_assoc_complex_x64(self):
        import jax
        import scipy.signal as scisig
        with jax.enable_x64():
            rng = np.random.default_rng(3)
            sos = scisig.butter(3, 0.3, 'low', output='sos', fs=2)
            x = (rng.standard_normal((2, 4500))
                 + 1j * rng.standard_normal((2, 4500)))
            got = np.asarray(cfilter._sosfilt_assoc(sos, x))
            want = scisig.sosfilt(sos, x, axis=-1)
            np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-11)

    def test_filter_signal_dispatches_assoc_above_threshold(self):
        # public path at serving size: digital sosfilt result must agree
        # with scipy at the serving length that triggers the prefix form
        import scipy.signal as scisig
        rng = np.random.default_rng(4)
        x = rng.standard_normal((2, cfilter.IIR_ASSOC_MIN_SAMPLES + 128)
                                ).astype(np.float32)
        got = np.asarray(cfilter.filter_signal(x, 2.0, 0.25, ftype="butter",
                                               order=4))
        sos = scisig.butter(4, 0.25, 'low', output='sos', fs=2)
        want = scisig.sosfilt(sos, x, axis=-1)
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)

    def test_lsim_assoc_matches_scipy_x64(self):
        import jax
        import scipy.signal as scisig
        with jax.enable_x64():
            rng = np.random.default_rng(12)
            fs, cutoff, N = 4.0, 0.3, 5000
            u = rng.standard_normal((2, N))
            got = np.asarray(cfilter.filter_signal(
                u, fs, cutoff, ftype="bessel", order=2, analog=True))
            system = scisig.bessel(2, cutoff * 2 * np.pi, 'low', norm='mag',
                                   analog=True, output='ba')
            t = np.arange(N) / fs
            want = np.stack([scisig.lsim(system, u[i], t)[1]
                             for i in range(2)])
            np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-10)

    def test_lsim_high_order_warns_and_falls_back(self):
        import scipy.signal as scisig
        rng = np.random.default_rng(13)
        u = rng.standard_normal((1, cfilter.IIR_ASSOC_MIN_SAMPLES)
                                ).astype(np.float32)
        with pytest.warns(UserWarning, match="sequential per-sample scan"):
            got = np.asarray(cfilter.filter_signal(
                u, 4.0, 0.3, ftype="butter", order=6, analog=True))
        assert got.shape == u.shape

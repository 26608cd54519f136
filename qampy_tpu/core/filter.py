"""Filter functions: matched filtering, pulse shaping, analog filter emulation.

Parity: qampy/core/filter.py in the reference. FFT filters use jnp.fft; the
IIR (bessel/butter) filters are designed host-side with scipy (static
coefficients) and applied with a ``lax.scan`` over biquad sections, which is
the exact sequential sosfilt recurrence. ``pre_filter_wdm`` fixes the
undefined-variable bug in the reference (core/filter.py:75).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import scipy.signal as scisig

from qampy_tpu.core.special import rrcos_freq, rrcos_time


def fftconvolve_same(sig, h):
    """Linear convolution along the last axis, 'same' output length.

    Equivalent to scipy.signal.fftconvolve(sig, h, 'same') per mode.
    """
    sig = jnp.asarray(sig)
    h = jnp.asarray(h)
    n = sig.shape[-1]
    m = h.shape[-1]
    nfull = n + m - 1
    nfft = int(2 ** np.ceil(np.log2(nfull)))
    cdtype = jnp.result_type(sig.dtype, h.dtype, jnp.complex64)
    S = jnp.fft.fft(sig.astype(cdtype), nfft)
    H = jnp.fft.fft(h.astype(cdtype), nfft)
    full = jnp.fft.ifft(S * H)[..., :nfull]
    start = (m - 1) // 2
    out = full[..., start:start + n]
    if not (jnp.iscomplexobj(sig) or jnp.iscomplexobj(h)):
        out = out.real
    return out.astype(sig.dtype) if jnp.iscomplexobj(sig) else out.astype(sig.dtype)


def pre_filter(signal, bw):
    """Brick-wall low-pass pre-filter (reference core/filter.py:28-49)."""
    sig = jnp.atleast_2d(jnp.asarray(signal))
    N = sig.shape
    h = np.zeros(N[1], dtype=np.asarray(sig.real).dtype)
    cut = int(N[1] / (bw / 2))
    h[cut:-cut] = 1
    s = jnp.fft.ifft(jnp.fft.ifftshift(
        jnp.fft.fftshift(jnp.fft.fft(sig, axis=-1), axes=-1) * h, axes=-1), axis=-1)
    if jnp.asarray(signal).ndim < 2:
        return s.flatten()
    return s


def pre_filter_wdm(signal, bw, os, center_freq=0):
    """Ideal LP filter selecting part of the spectrum (reference core/filter.py:51-84).

    The reference implementation references an undefined variable (``sig``,
    core/filter.py:75); this is the intended behaviour.
    """
    signal = jnp.asarray(signal)
    N = signal.shape[-1]
    freq_axis = jnp.fft.fftfreq(N, 1 / os)
    h = (jnp.abs(freq_axis - center_freq) < bw / 2).astype(signal.real.dtype)
    return jnp.fft.ifft(jnp.fft.fft(signal, axis=-1) * h, axis=-1)


def _sosfilt_scan(sos, x):
    """Sequential second-order-section IIR filtering via lax.scan.

    x: (modes, N) real or complex. sos: (nsec, 6) static numpy coefficients.
    Implements the direct-form-II-transposed recurrence exactly like
    scipy.signal.sosfilt.
    """
    x = jnp.asarray(x)
    sos = np.asarray(sos, dtype=np.float64)
    nsec = sos.shape[0]
    dt = x.dtype
    b = jnp.asarray(sos[:, :3], dtype=x.real.dtype)
    a = jnp.asarray(sos[:, 3:], dtype=x.real.dtype)

    def step(carry, xn):
        z = carry  # (nsec, 2, modes)
        xcur = xn
        zs = []
        for s in range(nsec):
            y = b[s, 0] * xcur + z[s, 0]
            z0 = b[s, 1] * xcur - a[s, 1] * y + z[s, 1]
            z1 = b[s, 2] * xcur - a[s, 2] * y
            zs.append(jnp.stack([z0, z1]))
            xcur = y
        return jnp.stack(zs), xcur

    z0 = jnp.zeros((nsec, 2, x.shape[0]), dtype=dt)
    _, y = jax.lax.scan(step, z0, x.T)
    return y.T


def filter_signal(signal, fs, cutoff, ftype="bessel", order=2, analog=False):
    """Apply an analog-emulation filter (bessel/butter/gauss/exp).

    Parity: reference core/filter.py:86-147. ``analog=True`` (lsim-based
    continuous-time simulation) is not supported — the digital (sos) path is
    used always, matching the reference's default call signature.
    """
    sig = jnp.atleast_2d(jnp.asarray(signal))
    if ftype == "gauss":
        f = jnp.linspace(-fs / 2, fs / 2, sig.shape[1], endpoint=False)
        w = cutoff / (2 * np.sqrt(2 * np.log(2)))
        g = jnp.exp(-f ** 2 / (2 * w ** 2)).astype(sig.real.dtype)
        fsig = jnp.fft.fftshift(jnp.fft.fft(jnp.fft.fftshift(sig, axes=-1), axis=-1), axes=-1) * g
        out = jnp.fft.fftshift(jnp.fft.ifft(jnp.fft.fftshift(fsig, axes=-1), axis=-1), axes=-1)
        return out.flatten() if jnp.asarray(signal).ndim == 1 else out
    if ftype == "exp":
        f = jnp.linspace(-fs / 2, fs / 2, sig.shape[1], endpoint=False)
        w = cutoff / (np.sqrt(2 * np.log(2) ** 2))
        g = jnp.exp(-jnp.sqrt(f ** 2 / (2 * w ** 2)))
        g = (g / g.max()).astype(sig.real.dtype)
        fsig = jnp.fft.fftshift(jnp.fft.fft(jnp.fft.fftshift(sig, axes=-1), axis=-1), axes=-1) * g
        out = jnp.fft.fftshift(jnp.fft.ifft(jnp.fft.fftshift(fsig, axes=-1), axis=-1), axes=-1)
        return out.flatten() if jnp.asarray(signal).ndim == 1 else out
    if analog:
        raise NotImplementedError("analog lsim filtering is not supported; use digital sos")
    if ftype == "bessel":
        sos = scisig.bessel(order, cutoff, 'low', norm='mag', analog=False, output='sos', fs=fs)
    elif ftype == "butter":
        sos = scisig.butter(order, cutoff, 'low', analog=False, output='sos', fs=fs)
    else:
        raise ValueError("unknown filter type %s" % ftype)
    out = _sosfilt_scan(sos, sig)
    return out.flatten() if jnp.asarray(signal).ndim == 1 else out


def _rrcos_pulseshaping_freq(sig, fs, T, beta):
    """RRC filter applied in the spectral domain (reference core/filter.py:149-175)."""
    sig = jnp.asarray(sig)
    f = jnp.fft.fftfreq(sig.shape[-1]) * fs
    nyq_fil = rrcos_freq(f, beta, T)
    nyq_fil = nyq_fil / nyq_fil.max()
    sig_f = jnp.fft.fft(sig, axis=-1)
    return jnp.fft.ifft(sig_f * nyq_fil.astype(sig_f.real.dtype), axis=-1)


def rrcos_pulseshaping(sig, fs, T, beta, taps=1001):
    """RRC filter in the time domain via FFT convolution (reference core/filter.py:177-212)."""
    sig = jnp.asarray(sig)
    if taps is None:
        return _rrcos_pulseshaping_freq(sig, fs, T, beta)
    t = np.linspace(0, taps, taps, endpoint=False)
    t -= t[(t.size - 1) // 2]
    t /= fs
    nqt = rrcos_time(jnp.asarray(t), beta, T)
    nqt = (nqt / nqt.max()).astype(sig.real.dtype)
    return fftconvolve_same(sig, nqt)


def moving_average(sig, N=3):
    """Moving average of length N (valid region), via cumsum.

    Parity: reference core/filter.py:215-237; output length len(sig)-N+1.
    """
    sig = jnp.asarray(sig)
    sign = jnp.atleast_2d(sig)
    z = jnp.zeros(sign.shape[:-1] + (1,), dtype=sign.dtype)
    ret = jnp.cumsum(jnp.concatenate([z, sign], axis=-1), axis=-1)
    out = (ret[..., N:] - ret[..., :-N]) / N
    if sig.ndim == 1:
        return out.flatten()
    return out

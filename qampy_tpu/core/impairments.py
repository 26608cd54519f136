"""Simulation of transmission and transceiver impairments.

Parity: qampy/core/impairments.py in the reference. All impairments are pure
jnp (FFT / elementwise) computations. Randomised impairments (AWGN, phase
noise) take an explicit ``jax.random`` key; passing ``key=None`` draws a
fresh seed from numpy entropy (matching the reference's use of global
np.random state).
"""
from __future__ import annotations

import warnings

import numpy as np
import jax
import jax.numpy as jnp

from qampy_tpu.helpers import rescale_signal
from qampy_tpu.core.filter import filter_signal
from qampy_tpu.core.digital_pre_compensation import clipper


def _ensure_key(key):
    if key is None:
        return jax.random.PRNGKey(np.random.randint(0, 2 ** 31 - 1))
    return key


def rotate_field(field, theta):
    """Rotate a dual-polarisation field by theta (reference core/impairments.py:63-82)."""
    field = jnp.asarray(field)
    h = jnp.asarray([[np.cos(theta), -np.sin(theta)],
                     [np.sin(theta), np.cos(theta)]], dtype=field.real.dtype)
    return jnp.dot(h.astype(field.dtype), field)


def H_PMD(theta, t_dgd, omega):
    """PMD response matrix (reference core/impairments.py:29-61)."""
    omega = jnp.asarray(omega)
    h1 = jnp.asarray([[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]])
    zeros = jnp.zeros(omega.shape[0])
    h2 = jnp.asarray(jnp.stack([
        jnp.stack([jnp.exp(-1.j * omega * t_dgd / 2), zeros]),
        jnp.stack([zeros, jnp.exp(1.j * omega * t_dgd / 2)])]))
    h3 = jnp.asarray([[np.cos(-theta), -np.sin(-theta)], [np.sin(-theta), np.cos(-theta)]])
    H = jnp.einsum('ij,jkl->ikl', h1.astype(h2.dtype), h2)
    return H, h3


def _applyPMD_dot(field, theta, t_dgd, omega):
    """Apply PMD via rotation + DGD in the frequency domain (reference core/impairments.py:94-104)."""
    field = jnp.asarray(field)
    Sf = jnp.fft.fftshift(jnp.fft.fft(jnp.fft.ifftshift(field, axes=-1), axis=-1), axes=-1)
    Sff = rotate_field(Sf, theta)
    h2 = jnp.stack([jnp.exp(-1.j * omega * t_dgd / 2), jnp.exp(1.j * omega * t_dgd / 2)])
    Sn = Sff * h2.astype(Sff.dtype)
    Sf2 = rotate_field(Sn, -theta)
    SS = jnp.fft.fftshift(jnp.fft.ifft(jnp.fft.ifftshift(Sf2, axes=-1), axis=-1), axes=-1)
    return SS.astype(field.dtype)


def apply_PMD_to_field(field, theta, t_dgd, fs):
    """Apply first-order PMD to a dual-pol field (reference core/impairments.py:106-131)."""
    field = jnp.asarray(field)
    omega = 2 * jnp.pi * jnp.linspace(-fs / 2, fs / 2, field.shape[-1], endpoint=False)
    return _applyPMD_dot(field, theta, t_dgd, omega)


def phase_noise(sz, df, fs, key=None):
    """Wiener phase noise with variance 2*pi*df/fs per step (reference core/impairments.py:133-160)."""
    key = _ensure_key(key)
    var = 2 * np.pi * df / fs
    f = jax.random.normal(key, sz if isinstance(sz, tuple) else (sz,)) * np.sqrt(var)
    return jnp.cumsum(f, axis=-1)


def apply_phase_noise(signal, df, fs, key=None):
    """Add laser phase noise to a signal (reference core/impairments.py:162-186)."""
    signal = jnp.asarray(signal)
    ph = phase_noise(signal.shape, df, fs, key=key)
    return signal * jnp.exp(1.j * ph).astype(signal.dtype)


def add_awgn(sig, strgth, key=None):
    """Add AWGN of given standard deviation per complex dimension (reference core/impairments.py:188-207)."""
    sig = jnp.asarray(sig)
    key = _ensure_key(key)
    k1, k2 = jax.random.split(key)
    n = (jax.random.normal(k1, sig.shape) + 1.j * jax.random.normal(k2, sig.shape)) / np.sqrt(2)
    return sig + (strgth * n).astype(sig.dtype)


def change_snr(sig, snr, fb, fs, key=None):
    """Set the SNR of a (noiseless) signal, oversampling-aware (reference core/impairments.py:210-233)."""
    sig = jnp.asarray(sig)
    os = fs / fb
    p = jnp.mean(jnp.abs(sig) ** 2)
    n = 10 ** (-snr / 20) * np.sqrt(os)
    return add_awgn(sig, jnp.sqrt(p) * n, key=key)


def add_carrier_offset(sig, fo, fs):
    """Add a carrier frequency offset (reference core/impairments.py:235-257)."""
    sig = jnp.asarray(sig)
    sign = jnp.atleast_2d(sig)
    ph = jnp.exp(2.j * jnp.pi * jnp.arange(sign.shape[-1], dtype=sign.real.dtype) * fo / fs)
    out = sign * ph.astype(sign.dtype)
    return out.flatten() if sig.ndim == 1 else out


def add_modal_delay(sig, delay):
    """Add per-mode sample delays (fake pol-mux) (reference core/impairments.py:259-281)."""
    sig = jnp.asarray(sig)
    delay = np.asarray(delay)
    assert delay.shape[0] == sig.shape[0], \
        "Delay array must have the same length as number of modes of signal"
    rows = [jnp.roll(sig[i], int(delay[i])) for i in range(sig.shape[0])]
    return jnp.stack(rows)


def simulate_transmission(sig, fb, fs, snr=None, freq_off=None, lwdth=None,
                          dgd=None, theta=np.pi / 3.731, modal_delay=None, key=None):
    """Convenience chain applying several impairments (reference core/impairments.py:284-328)."""
    key = _ensure_key(key)
    k1, k2 = jax.random.split(key)
    if lwdth is not None:
        sig = apply_phase_noise(sig, lwdth, fs, key=k1)
    if freq_off is not None:
        sig = add_carrier_offset(sig, freq_off, fs)
    if snr is not None:
        sig = change_snr(sig, snr, fb, fs, key=k2)
    if modal_delay is not None:
        sig = add_modal_delay(sig, modal_delay)
    if dgd is not None:
        sig = apply_PMD_to_field(sig, theta, dgd, fs)
    return sig


def quantize_signal(sig, nbits=6, rescale=True, re_normalize=True):
    """DAC/ADC quantisation to 2**nbits levels (reference core/impairments.py:330-368)."""
    from qampy_tpu.helpers import normalise_and_center
    sig = jnp.atleast_2d(jnp.asarray(sig))
    if rescale:
        sig = sig / jnp.abs(sig).max(axis=-1, keepdims=True).astype(sig.dtype)
    levels = jnp.linspace(-1, 1, 2 ** nbits, dtype=sig.real.dtype)
    qre = levels[jnp.clip(jnp.searchsorted(levels[:-1], sig.real, side='left'), 0, 2 ** nbits - 1)]
    qim = levels[jnp.clip(jnp.searchsorted(levels[:-1], sig.imag, side='left'), 0, 2 ** nbits - 1)]
    out = qre + 1j * qim
    if not jnp.iscomplexobj(sig):
        out = out.real
    if re_normalize:
        out = normalise_and_center(out)
    return out


def quantize_signal_New(sig_in, nbits=6, rescale_in=True, rescale_out=True):
    """Mid-riser quantiser with clipping (reference core/impairments.py:370-413)."""
    sig_in = jnp.atleast_2d(jnp.asarray(sig_in))
    sig = rescale_signal(sig_in, swing=1) if rescale_in else sig_in
    swing = 2
    delta = swing / 2 ** nbits
    levels_out = jnp.linspace(-1 + delta / 2, 1 - delta / 2, 2 ** nbits, dtype=sig.real.dtype)
    levels_dec = levels_out + delta / 2

    def q(x):
        return levels_out[jnp.clip(jnp.searchsorted(levels_dec[:-1], x, side='left'),
                                   0, 2 ** nbits - 1)]

    out = q(sig.real) + 1j * q(sig.imag)
    if not jnp.iscomplexobj(sig):
        out = out.real
    if rescale_out:
        max_swing = jnp.maximum(jnp.abs(sig_in.real).max(), jnp.abs(sig_in.imag).max())
        out = out * max_swing
    return out


def modulator_response(rfsig, dcbias=1, gfactr=1, cfactr=0, dcbias_out=0.5, gfactr_out=1):
    """IQ Mach-Zehnder modulator response (reference core/impairments.py:415-461)."""
    rfsig = jnp.asarray(rfsig)
    if not np.iscomplex(dcbias):
        dcbias = dcbias + 1j * dcbias
    if not np.iscomplex(gfactr):
        gfactr = gfactr + 1j * gfactr
    if not np.iscomplex(cfactr):
        cfactr = cfactr + 1j * cfactr
    volt = rfsig.real + dcbias.real + 1j * (rfsig.imag + dcbias.imag)
    e_i = -(jnp.exp(1j * jnp.pi * volt.real * (1 + cfactr.real) / 2) +
            gfactr.real * jnp.exp(-1j * jnp.pi * volt.real * (1 - cfactr.real) / 2)) / (1 + gfactr.real)
    e_q = -(jnp.exp(1j * jnp.pi * volt.imag * (1 + cfactr.imag) / 2) +
            gfactr.imag * jnp.exp(-1j * jnp.pi * volt.imag * (1 - cfactr.imag) / 2)) / (1 + gfactr.imag)
    e_out = np.exp(1j * np.pi / 4) * (e_i * np.exp(-1j * np.pi * dcbias_out / 2) +
                                      gfactr_out * e_q * np.exp(1j * np.pi * dcbias_out / 2)) / (1 + gfactr_out)
    return e_out


def er_to_g(ext_rat):
    """Extinction ratio (dB) to gain factor (reference core/impairments.py:463-475)."""
    return (10 ** (ext_rat / 20) - 1) / (10 ** (ext_rat / 20) + 1)


def sim_DAC_response(sig, fs, enob=5, clip_rat=1, quant_bits=0, key=None, **dac_params):
    """Simulate DAC: clipping, quantisation, ENOB noise, frequency response.

    Parity: reference core/impairments.py:477-516.
    """
    if np.isclose(clip_rat, 1):
        sig_clip = jnp.asarray(sig)
    else:
        sig_res = rescale_signal(sig, 1 / clip_rat)
        sig_clip = clipper(sig_res, 1)
    if not np.isclose(quant_bits, 0):
        sig_clip = quantize_signal_New(sig_clip, nbits=quant_bits, rescale_in=True, rescale_out=True)
    if not np.isclose(enob, 0):
        sig_clip = apply_enob_as_awgn(sig_clip, enob, key=key)
    if dac_params:
        return apply_DAC_filter(sig_clip, fs, **dac_params)
    return sig_clip


def apply_DAC_filter(sig, fs, cutoff=18e9, fn=None, ch=1):
    """DAC frequency response filter (Bessel or measured) (reference core/impairments.py:518-549)."""
    if fn is None:
        return filter_signal(sig, fs, cutoff, ftype="bessel", order=2)
    H_dac = load_dac_response(fn, fs, jnp.asarray(sig).shape[-1], ch=ch)
    sigf = jnp.fft.fft(jnp.asarray(sig), axis=-1)
    return jnp.fft.ifft(sigf * jnp.asarray(H_dac, dtype=sigf.dtype), axis=-1)


def apply_enob_as_awgn(sig, enob, verbose=False, key=None):
    """Noise from limited ENOB modelled as AWGN (reference core/impairments.py:551-587)."""
    sig = jnp.asarray(sig)
    powsig_mean = jnp.mean(jnp.abs(sig) ** 2)
    if jnp.iscomplexobj(sig):
        x_max = jnp.maximum(jnp.abs(sig.real).max(), jnp.abs(sig.imag).max())
    else:
        x_max = jnp.abs(sig).max()
    delta = x_max / 2 ** (enob - 1)
    pownoise_mean = delta ** 2 / 12
    out = add_awgn(sig, jnp.sqrt(2 * pownoise_mean), key=key)
    if verbose:
        snr_enob = 10 * jnp.log10(powsig_mean / 2 / pownoise_mean)
        return out, snr_enob
    return out


def load_dac_response(fn, fs, N, ch=1):
    """Load a measured DAC response and interpolate onto the signal grid.

    Parity: reference core/impairments.py:589-620 (host-side numpy/scipy).
    """
    from scipy import interpolate
    npzfile = np.load(fn)
    dac_f = npzfile['dac_res_ch%d' % ch]
    dacf_complex = np.atleast_2d(dac_f[:, 1] * np.exp(1j * dac_f[:, 2]))
    dacf = np.concatenate((np.fliplr(np.conj(dacf_complex[:, 1:])), dacf_complex), axis=1)
    dac_freq = np.concatenate((np.fliplr(-np.atleast_2d(dac_f[1:, 0])), np.atleast_2d(dac_f[:, 0])), axis=1)
    freq_sig_fft = np.fft.fftfreq(N) * fs
    polyfit = interpolate.interp1d(dac_freq.flatten(), dacf.flatten(), kind='linear',
                                   bounds_error=False, fill_value=dac_f[min(320, dac_f.shape[0] - 1), 1])
    return np.atleast_2d(polyfit(freq_sig_fft))


def ideal_amplifier_response(sig, out_volt):
    """Scale the RF signal to a target voltage (reference core/impairments.py:658-671)."""
    sig = jnp.asarray(sig)
    current_volt = jnp.maximum(jnp.abs(sig.real).max(), jnp.abs(sig.imag).max())
    return sig / current_volt * out_volt


def sim_tx_response(sig, fs, enob=6, tgt_v=1, clip_rat=1, quant_bits=0,
                    dac_params={"cutoff": 18e9, "fn": None, "ch": None}, key=None, **mod_prms):
    """Full TX chain: DAC -> amplifier -> IQ modulator (reference core/impairments.py:622-656)."""
    sig_dac_out = sim_DAC_response(sig, fs, enob, clip_rat=clip_rat,
                                   quant_bits=quant_bits, key=key, **dac_params)
    sig_amp = ideal_amplifier_response(sig_dac_out, tgt_v)
    return modulator_response(sig_amp, **mod_prms)


def add_dispersion(sig, fs, D, L, wl0=1550e-9):
    """Add chromatic dispersion in the frequency domain (reference core/impairments.py:673-702)."""
    sig = jnp.asarray(sig)
    C = 2.99792458e8
    N = sig.shape[-1]
    omega = jnp.fft.fftfreq(N, 1 / fs) * np.pi * 2
    beta2 = D * wl0 ** 2 / (C * np.pi * 2)
    H = jnp.exp(-0.5j * omega ** 2 * beta2 * L).astype(sig.dtype)
    sff = jnp.fft.fft(jnp.fft.ifftshift(sig, axes=-1), axis=-1)
    return jnp.fft.fftshift(jnp.fft.ifft(sff * H, axis=-1), axes=-1)

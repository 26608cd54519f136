"""Rational resampling with RRC matched filtering.

Parity: qampy/core/resample.py in the reference. The default path
(``rrcos_resample`` with fftconv=True) is zero-insertion upsampling followed
by an FFT RRC filter and decimation — all jnp ops, identical math to the
reference (core/resample.py:112-116). ``resample_poly`` without a shaping
filter falls back to scipy on host (one-time TX-side preparation).
"""
from __future__ import annotations

import fractions

import numpy as np
import jax.numpy as jnp
from scipy import signal as scisig

from qampy_tpu.helpers import normalise_and_center
from qampy_tpu.core.filter import rrcos_pulseshaping


def _resamplingfactors(fold, fnew):
    ratn = fractions.Fraction(fnew / fold).limit_denominator()
    return ratn.numerator, ratn.denominator


def resample_poly(signal, fold, fnew, window=None, renormalise=False):
    """Polyphase rational resampling (reference core/resample.py:37-71).

    Runs scipy.signal.resample_poly on host — only used as a TX-side
    convenience path without an RRC shaping filter.
    """
    signal = np.asarray(signal).flatten()
    up, down = _resamplingfactors(fold, fnew)
    if window is None:
        sig_new = scisig.resample_poly(signal, up, down)
    else:
        sig_new = scisig.resample_poly(signal, up, down, window=np.asarray(window))
    if renormalise:
        p = np.mean(abs(signal) ** 2)
        sig_new = np.asarray(normalise_and_center(jnp.asarray(sig_new))) * np.sqrt(p)
    return sig_new


def rrcos_resample(signal, fold, fnew, Ts=None, beta=None, taps=4001,
                   renormalise=False, fftconv=True):
    """Combined RRC pulse shaping and rational resampling.

    Parity: reference core/resample.py:73-127. Operates on the last axis so a
    whole (nmodes, N) signal resamples in one call (the reference loops modes).
    """
    if beta is None:
        return resample_poly(signal, fold, fnew)
    assert 0 < beta <= 1, "beta needs to be in interval (0,1]"
    if Ts is None:
        Ts = 1 / fold
    up, down = _resamplingfactors(fold, fnew)
    fup = up * fold
    sig = jnp.asarray(signal)
    # zero-insertion upsample along the last axis
    shape = sig.shape[:-1] + (sig.shape[-1] * up,)
    sig_new = jnp.zeros(shape, dtype=sig.dtype)
    sig_new = sig_new.at[..., ::up].set(sig)
    sig_new = rrcos_pulseshaping(sig_new, fup, Ts, beta, taps)
    sig_new = sig_new[..., ::down]
    if renormalise:
        p = jnp.mean(jnp.abs(sig) ** 2)
        sig_new = normalise_and_center(sig_new) * jnp.sqrt(p)
    return sig_new

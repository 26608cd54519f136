"""Signal-object API for filtering.

Parity: qampy/filtering.py in the reference.
"""
from __future__ import annotations

import jax.numpy as jnp

from qampy_tpu.core import filter as cfilter
from qampy_tpu.signals import Signal


def _rewrap(sig, arr):
    if isinstance(sig, Signal):
        return sig.replace(samples=jnp.asarray(arr, dtype=sig.dtype))
    return arr


def _samples(sig):
    return sig.samples if isinstance(sig, Signal) else jnp.asarray(sig)


def filter_signal(sig, cutoff, ftype="bessel", order=2):
    """Apply a digital analog-emulation filter (reference qampy/filtering.py:23-46)."""
    arr = cfilter.filter_signal(_samples(sig), sig.fs, cutoff, ftype=ftype, order=order)
    return _rewrap(sig, arr)


def filter_signal_analog(sig, cutoff, ftype="bessel", order=2):
    """Analog-prototype filter emulation (reference qampy/filtering.py:48-73).

    Simulates the continuous-time analog prototype (``scipy.signal.lsim``
    semantics, FOH-discretised state space run as a lax.scan — see
    core.filter._lsim_scan). Unlike the reference, complex signals keep
    their imaginary part (scipy's lsim silently casts complex to real).
    """
    arr = cfilter.filter_signal(_samples(sig), sig.fs, cutoff, ftype=ftype,
                                order=order, analog=True)
    return _rewrap(sig, arr)


def pre_filter(sig, bw):
    """Brick-wall pre-filter (reference qampy/filtering.py:75-94)."""
    arr = cfilter.pre_filter(_samples(sig), bw)
    return _rewrap(sig, arr)


def rrcos_pulseshaping(sig, beta, T=None, taps=1001):
    """RRC matched filter (reference qampy/filtering.py:96-118)."""
    T = 1 / sig.fb if T is None else T
    arr = cfilter.rrcos_pulseshaping(_samples(sig), sig.fs, T, beta, taps=taps)
    return _rewrap(sig, arr)


def moving_average(sig, N=3):
    """Moving average (reference core/filter.py:215-237)."""
    return cfilter.moving_average(_samples(sig), N)

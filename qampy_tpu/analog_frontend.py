"""Signal-object API for analog frontend corrections.

Parity: qampy/analog_frontend.py in the reference.
"""
from __future__ import annotations

import jax.numpy as jnp

from qampy_tpu.core import analog_frontend as caf
from qampy_tpu.signals import Signal


def _rewrap(sig, arr):
    if isinstance(sig, Signal):
        return sig.replace(samples=jnp.asarray(arr, dtype=sig.dtype))
    return arr


def _samples(sig):
    return sig.samples if isinstance(sig, Signal) else jnp.asarray(sig)


def comp_IQ_inbalance(signal):
    """Compensate I/Q imbalance (reference qampy/analog_frontend.py:24-40)."""
    return _rewrap(signal, caf.comp_IQ_inbalance(_samples(signal)))


def comp_rf_delay(signal, delay):
    """Compensate an RF delay (reference qampy/analog_frontend.py:42-62)."""
    return _rewrap(signal, caf.comp_rf_delay(_samples(signal), delay, signal.fs))


def orthonormalize_signal(signal, os=None):
    """Gram-Schmidt orthonormalisation (reference qampy/analog_frontend.py:64-66)."""
    os = signal.os if os is None else os
    return _rewrap(signal, caf.orthonormalize_signal(_samples(signal), os=os))

"""Convenient helper functions (jnp based).

Parity: qampy/helpers.py in the reference (/root/reference/qampy/helpers.py).
All functions are pure jnp and jit-safe; they accept either plain arrays or
Signal pytrees (attribute-preserving wrappers live on the Signal methods).
"""
from __future__ import annotations

import functools

import jax.numpy as jnp


def _object_aware(fn):
    """Accept a Signal pytree as first argument and rewrap the result.

    The reference's helpers operate on its ndarray-subclass signal objects
    and return the same type (reference helpers.py works on SignalBase);
    here signals are pytrees, so helpers unwrap ``.samples`` and rewrap via
    ``.replace`` — plain arrays pass through untouched.
    """
    @functools.wraps(fn)
    def wrapped(E, *args, **kwargs):
        if hasattr(E, "samples") and hasattr(E, "replace"):
            return E.replace(samples=fn(E.samples, *args, **kwargs))
        return fn(E, *args, **kwargs)
    return wrapped


def cabssquared(x):
    """|x|^2 computed without the sqrt (reference helpers.py:26)."""
    return x.real ** 2 + x.imag ** 2


def dB2lin(x):
    """Convert dB(m) to linear units (reference helpers.py:31)."""
    return 10 ** (jnp.asarray(x) / 10)


def lin2dB(x):
    """Convert linear units to dB(m) (reference helpers.py:38)."""
    return 10 * jnp.log10(jnp.asarray(x))


@_object_aware
def normalise_and_center(E):
    """Center each mode to zero mean and normalise to unit average power.

    Parity: reference helpers.py:45-57.
    """
    E = jnp.asarray(E)
    if E.ndim > 1:
        E = E - jnp.mean(E, axis=-1, keepdims=True)
        P = jnp.sqrt(jnp.mean(cabssquared(E), axis=-1, keepdims=True))
        return E / P.astype(E.real.dtype)
    E = E - jnp.mean(E.real) - 1.j * jnp.mean(E.imag)
    P = jnp.sqrt(jnp.mean(cabssquared(E)))
    return E / P


@_object_aware
def normalise_and_center_pil(sig, idx_pil):
    """Center/normalise based on the pilot symbols only (reference helpers.py:59-74)."""
    sig = jnp.asarray(sig)
    sig_pil = sig[..., idx_pil]
    if sig.ndim > 1:
        ct = -jnp.mean(sig_pil, axis=-1, keepdims=True)
        p = jnp.sqrt(jnp.mean(cabssquared(sig_pil + ct), axis=-1, keepdims=True))
        return (sig + ct) / p
    ct = -(jnp.mean(sig_pil.real) + 1.j * jnp.mean(sig_pil.imag))
    p = jnp.sqrt(jnp.mean(cabssquared(sig_pil + ct)))
    return (sig + ct) / p


@_object_aware
def dump_edges(E, N):
    """Remove N samples from the beginning and end (reference helpers.py:77-84)."""
    if E.ndim > 1:
        return E[:, N:-N]
    return E[N:-N]


@_object_aware
def set_mid_point(E, mid_pos=0):
    """Move the signal's mid position to a given value (reference helpers.py:86-95)."""
    E = jnp.asarray(E)
    if jnp.iscomplexobj(E):
        mid = (E.real.max() + E.real.min()) / 2 + 1j * (E.imag.max() + E.imag.min()) / 2
    else:
        mid = (E.max() + E.min()) / 2
    return E - mid + mid_pos


@_object_aware
def rescale_signal(E, swing=1):
    """Rescale signal to (-swing, swing) per mode (reference helpers.py:98-108)."""
    E = jnp.atleast_2d(jnp.asarray(E))
    swing = jnp.atleast_1d(jnp.asarray(swing))
    if jnp.iscomplexobj(E):
        scale = jnp.maximum(jnp.max(jnp.abs(E.real), axis=-1), jnp.max(jnp.abs(E.imag), axis=-1))
    else:
        scale = jnp.max(jnp.abs(E), axis=-1)
    return E / scale[:, None] * swing[:, None].astype(E.real.dtype)


def set_mid_and_rescale(E, mid_pos=0, swing=1):
    """Center to mid position then rescale (reference helpers.py:110-117)."""
    return rescale_signal(set_mid_point(E, mid_pos), swing)


# the reference spells this "resale" (helpers.py:110); keep that name working
set_mid_and_resale = set_mid_and_rescale


def get_center_shift_fac(E):
    """Shift factor that centers the signal (reference helpers.py:119-127)."""
    E = jnp.asarray(E)
    if E.ndim > 1:
        return -jnp.mean(E, axis=-1, keepdims=True)
    return -(jnp.mean(E.real) + 1.j * jnp.mean(E.imag))


def find_pilot_idx(nframe=2, frame_len=2 ** 16, os_rate=2, pilot_seq_len=1024,
                   pilot_ins_rat=32):
    """Pilot index mask for oversampled multi-frame pilot signals.

    Parity: reference helpers.py:129-145.
    """
    import numpy as np
    idx_os = np.arange(frame_len * nframe * os_rate)
    idx_pil_seq = idx_os < 0
    idx_pil_ph = idx_os < 0
    for i in range(nframe):
        t = frame_len * os_rate * i
        idx_pil_seq = idx_pil_seq | ((t <= idx_os) & (idx_os < t + pilot_seq_len * os_rate))
        d = idx_os - pilot_seq_len * os_rate - t
        idx_pil_ph = idx_pil_ph | (((d % (pilot_ins_rat * os_rate) == 0)
                                    | (d % (pilot_ins_rat * os_rate) == 1))
                                   & (d >= 0) & (idx_os < t + frame_len * os_rate))
    return idx_pil_seq | idx_pil_ph

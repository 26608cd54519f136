"""Compensation of analog frontend impairments (pre-ADC).

Parity: qampy/core/analog_frontend.py in the reference; pure jnp.
"""
from __future__ import annotations

import jax.numpy as jnp


def comp_IQ_inbalance(signal):
    """Compensate I/Q imbalance from an optical hybrid (reference core/analog_frontend.py:30-52)."""
    signal = jnp.asarray(signal)
    signal = signal - jnp.mean(signal, axis=-1, keepdims=True) if signal.ndim > 1 else signal - jnp.mean(signal)
    I = signal.real
    Q = signal.imag
    mon = jnp.sum(I * Q, axis=-1, keepdims=True) / jnp.sum(I ** 2, axis=-1, keepdims=True)
    phase_inb = jnp.arcsin(-mon)
    Q_balcd = (Q + jnp.sin(phase_inb) * I) / jnp.cos(phase_inb)
    amp_inb = jnp.sum(I ** 2, axis=-1, keepdims=True) / jnp.sum(Q_balcd ** 2, axis=-1, keepdims=True)
    return I + 1.j * (Q_balcd * jnp.sqrt(amp_inb))


def comp_rf_delay(signal, delay, sampling_rate=50e9):
    """Compensate an RF cable delay in the frequency domain (reference core/analog_frontend.py:54-88)."""
    signal = jnp.asarray(signal)
    sig = jnp.atleast_2d(signal)
    freqVector = jnp.fft.fftfreq(sig.shape[-1], sampling_rate / 2)
    sig_out = jnp.fft.ifft(jnp.exp(-1j * 2 * jnp.pi * delay * freqVector) *
                           jnp.fft.fft(sig, axis=-1), axis=-1)
    if signal.ndim > 1:
        return sig_out.real
    return sig_out.real.flatten()


def orthonormalize_signal(E, os=1):
    """Gram-Schmidt orthonormalisation of I and Q (reference core/analog_frontend.py:91-131)."""
    E = jnp.atleast_2d(jnp.asarray(E))
    real_out = E.real - E.real.mean(axis=-1, keepdims=True)
    tmp_imag = E.imag - E.imag.mean(axis=-1, keepdims=True)
    mean_pow_inphase = jnp.mean(real_out ** 2, axis=-1, keepdims=True)
    mean_pow_quadphase = jnp.mean(tmp_imag ** 2, axis=-1, keepdims=True)
    mean_pow_imb = jnp.mean(real_out * tmp_imag, axis=-1, keepdims=True)
    sig_out = real_out / jnp.sqrt(mean_pow_inphase) + 1j * (
        tmp_imag - mean_pow_imb * real_out / mean_pow_inphase) / jnp.sqrt(mean_pow_quadphase)
    sig_out = sig_out - jnp.mean(sig_out[:, ::os], axis=-1, keepdims=True)
    return sig_out / jnp.sqrt(jnp.mean(jnp.abs(sig_out[:, ::os]) ** 2, axis=-1, keepdims=True))

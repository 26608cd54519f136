"""Special mathematical functions for communications (pulse shapes etc.).

Parity: qampy/core/special_fcts.py in the reference. All functions are jnp
and jit-safe; the RRC time response handles its removable singularities with
``jnp.where`` instead of errstate-guarded division.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax.scipy.special import erfc


def ttanh(x, A, x0, w):
    """Amplitude/offset/width parametrised tanh (reference core/special_fcts.py:30-51)."""
    return A * jnp.tanh((x - x0) / w)


def gauss(x, A, x0, w):
    """Gaussian (reference core/special_fcts.py:54-75)."""
    return A * jnp.exp(-((x - x0) / w) ** 2 / 2.)


def supergauss(x, A, x0, w, o):
    """Super-Gaussian of order o (reference core/special_fcts.py:78-101)."""
    return A * jnp.exp(-((x - x0) / w) ** (2 * o) / 2.)


def sech(x, A, x0, w):
    """Hyperbolic secant (reference core/special_fcts.py:104-125)."""
    return A / jnp.cosh((x - x0) / w)


def rcos_time(t, beta, T):
    """Raised cosine time response (reference core/special_fcts.py:128-131)."""
    t = jnp.asarray(t)
    return jnp.sinc(t / T) * jnp.cos(t / T * jnp.pi * beta) / (1 - 4 * (beta * t / T) ** 2)


def rcos_freq(f, beta, T):
    """Raised cosine frequency response (reference core/special_fcts.py:134-143)."""
    f = jnp.asarray(f)
    af = jnp.abs(f)
    flat = af <= (1 - beta) / (2 * T)
    roll = (af > (1 - beta) / (2 * T)) & (af <= (1 + beta) / (2 * T))
    rolled = T / 2 * (1 + jnp.cos(jnp.pi * T / beta * (af - (1 - beta) / (2 * T)))) if beta > 0 else 0.
    return jnp.where(flat, T, jnp.where(roll, rolled, 0.)).astype(f.dtype)


def rrcos_freq(f, beta, T):
    """Root-raised cosine frequency response (reference core/special_fcts.py:146-169)."""
    return jnp.sqrt(rcos_freq(f, beta, T))


def rrcos_time(t, beta, T):
    """Root-raised cosine impulse response (reference core/special_fcts.py:172-203).

    The removable singularities at t=0 and |t|=T/(4 beta) are patched exactly
    like the reference (within eps of a sample spacing / 4).
    """
    t = jnp.asarray(t, dtype=jnp.result_type(float, jnp.asarray(t).dtype))
    eps = jnp.abs(t[0] - t[1]) / 4
    denom = jnp.pi * t / T * (1 - (4 * beta * t / T) ** 2)
    # avoid 0/0 in the general expression; patched below
    safe = jnp.where(jnp.abs(denom) < 1e-30, 1e-30, denom)
    gen = 1 / T * ((jnp.sin(jnp.pi * t / T * (1 - beta)) +
                    4 * beta * t / T * jnp.cos(jnp.pi * t / T * (1 + beta))) / safe)
    at0 = 1 / T * (1 + beta * (4 / jnp.pi - 1))
    if beta > 0:
        atsing = beta / (T * np.sqrt(2)) * ((1 + 2 / jnp.pi) * jnp.sin(jnp.pi / (4 * beta)) +
                                            (1 - 2 / jnp.pi) * jnp.cos(jnp.pi / (4 * beta)))
        gen = jnp.where(jnp.abs(jnp.abs(t) - abs(T / (4 * beta))) < eps, atsing, gen)
    return jnp.where(jnp.abs(t) < eps, at0, gen)


def q_function(x):
    """Gaussian tail probability (reference core/special_fcts.py:206-215)."""
    return 0.5 * erfc(jnp.asarray(x) / np.sqrt(2))

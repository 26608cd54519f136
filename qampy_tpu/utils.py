"""Utility functions: gray coding, windowing, offset search.

Parity: qampy/core/utils.py and qampy/core/segmentaxis.py in the reference.
``segment_axis``/``rolling_window`` are implemented as gather-based jnp ops
(XLA has no strided views) so they stay jit/shard friendly.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def bin2gray(value):
    """Convert binary value(s) to gray code (reference core/utils.py:195-200)."""
    return value ^ (value >> 1)


def bool2bin(x):
    """Convert an array of booleans into a binary number (reference core/utils.py:115-125)."""
    x = np.asarray(x, dtype=bool)
    assert len(x) < 64, "array must not be longer than 63"
    y = 0
    for i, j in enumerate(x):
        y += int(j) << i
    return y


def find_offset(sequence, data):
    """Index where ``sequence`` first occurs in ``data`` (reference core/utils.py:128-153)."""
    sequence = np.asarray(sequence)
    data = np.asarray(data)
    assert len(data) > len(sequence), "data has to be longer than sequence"
    if not data.dtype == sequence.dtype:
        data = data.astype(sequence.dtype)
    return data.tobytes().index(sequence.tobytes()) // data.itemsize


def rolling_window(data, size, wrap=False):
    """Segment a 1D (or trailing axis of an ND) array into overlapping frames.

    Parity: reference core/utils.py:156-192 (strided version); implemented as a
    gather so it works on device arrays under jit.
    """
    data = jnp.asarray(data)
    n = data.shape[-1]
    if wrap:
        data = jnp.concatenate([data, data[..., :size - 1]], axis=-1)
        nwin = n
    else:
        nwin = n - size + 1
    idx = jnp.arange(nwin)[:, None] + jnp.arange(size)[None, :]
    return data[..., idx]


def segment_axis(a, length, overlap=0, axis=-1):
    """Generate overlapping frames along an axis.

    Simplified parity with reference core/segmentaxis.py:26-128 for the cases
    used internally (full frames only; tail samples that do not fill a frame
    are dropped, matching ``end='cut'``).
    """
    a = jnp.asarray(a)
    if axis != -1:
        a = jnp.moveaxis(a, axis, -1)
    step = length - overlap
    assert step > 0, "overlap must be smaller than length"
    n = a.shape[-1]
    nseg = 1 + (n - length) // step if n >= length else 0
    idx = jnp.arange(nseg)[:, None] * step + jnp.arange(length)[None, :]
    out = a[..., idx]
    if axis != -1:
        out = jnp.moveaxis(out, -2, axis if axis >= 0 else axis - 1)
    return out


def linspacestep(start, step, N):
    """Array of length N starting at ``start`` with step ``step`` (reference core/utils.py:34-52)."""
    return np.arange(start, start + N * step, step=step)


def factorial(n):
    """n!"""
    return int(np.prod(np.arange(1, n + 1))) if n > 0 else 1


def convert_iqtosinglebitstream(idat, qdat, nbits):
    """Interleave two bitstreams into one with nbits per symbol (reference core/utils.py:202-229)."""
    idat = np.asarray(idat)
    qdat = np.asarray(qdat)
    if nbits % 2:
        N = [nbits // 2 + 1, nbits // 2]
    else:
        N = [nbits // 2, nbits // 2]
    idat_n = idat[: len(idat) - (len(idat) % N[0])].reshape(N[0], -1)
    qdat_n = qdat[: len(qdat) - (len(qdat) % N[1])].reshape(N[1], -1)
    l = min(idat_n.shape[1], qdat_n.shape[1])
    return np.vstack([idat_n[:, :l], qdat_n[:, :l]]).flatten()


def lfsr_int(seed, mask):
    """Galois (internal-XOR) LFSR generator yielding (bit, state).

    Parity: reference core/utils.py:56-85. Host-side generator used for
    constructing short seed patterns; bulk PRBS generation goes through the
    vectorised kernels in qampy_tpu.prbs.
    """
    state = int(seed)
    nbits = int(mask).bit_length() - 1
    while True:
        state = state << 1
        xor = state >> nbits
        if xor != 0:
            state ^= mask
        yield xor, state


def lfsr_ext(seed, taps, nbits):
    """Fibonacci (external-XOR) LFSR generator yielding (bit, state).

    Parity: reference core/utils.py:87-113.
    """
    sr = int(seed)
    while True:
        xor = 0
        for t in taps:
            if (sr & (1 << (nbits - t))) != 0:
                xor ^= 1
        sr = (xor << nbits - 1) + (sr >> 1)
        yield xor, sr

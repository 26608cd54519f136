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


def segment_axis(a, length, overlap=0, axis=-1, end='cut', endvalue=0):
    """Generate overlapping frames along an axis.

    Parity: reference core/segmentaxis.py:26-128 including the tail
    handling modes — ``end='cut'`` discards a partial last frame,
    ``end='pad'`` extends the axis with ``endvalue`` and ``end='wrap'``
    extends it with values from the start of the axis, each to the next
    full segmentation. Implemented as a gather (XLA has no strided views)
    so it stays jit/shard friendly. One deviation: ``axis`` defaults to
    the trailing axis instead of the reference's ``None`` (flatten);
    passing ``axis=None`` reproduces the reference default exactly.
    """
    a = jnp.asarray(a)
    if axis is None:
        a = a.reshape(-1)
        axis = -1
    pos = axis % a.ndim if axis != -1 else None
    if axis != -1:
        a = jnp.moveaxis(a, axis, -1)
    step = length - overlap
    if overlap >= length:
        raise ValueError("frames cannot overlap by more than 100%")
    if overlap < 0 or length <= 0:
        raise ValueError(
            "overlap must be nonnegative and length must be positive")
    n = a.shape[-1]
    if n < length or (n - length) % step:
        if end == 'cut':
            if n < length:
                raise ValueError(
                    "Not enough data points to segment array in 'cut' "
                    "mode; try 'pad' or 'wrap'")
        elif end in ('pad', 'wrap'):
            roundup = (length if n < length
                       else length + (1 + (n - length) // step) * step)
            extra = roundup - n
            if end == 'pad':
                tail = jnp.full(a.shape[:-1] + (extra,), endvalue,
                                dtype=a.dtype)
            else:
                if extra > n:
                    raise ValueError(
                        "'wrap' needs at least length-overlap data points")
                tail = a[..., :extra]
            a = jnp.concatenate([a, tail], axis=-1)
            n = roundup
        else:
            raise ValueError("end must be 'cut', 'pad' or 'wrap'")
    nseg = 1 + (n - length) // step
    idx = jnp.arange(nseg)[:, None] * step + jnp.arange(length)[None, :]
    out = a[..., idx]
    if pos is not None:
        # reference layout: the (nseg, length) pair replaces the original
        # axis in place (core/segmentaxis.py:116-118)
        out = jnp.moveaxis(out, (-2, -1), (pos, pos + 1))
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

"""Pseudo-random bit sequence generation (LFSR based).

Parity: qampy/core/prbs.py + the pythran LFSR kernels
(reference core/pythran_dsp.py:156-178). The reference compiles bit-serial
loops to C++; here the Fibonacci LFSR is re-derived as the linear recurrence
``out[n] = out[n-t0] ^ out[n-t1]`` which allows chunked vectorised generation
(chunk size = smallest tap distance) — orders of magnitude faster than a
Python bit loop and no native code required. A C host extension
(qampy_tpu/native) is used when available for the long-period generators.
"""
from __future__ import annotations

import numpy as np

from qampy_tpu.utils import bool2bin

#: taps for the external XOR (Fibonacci) LFSR per order (reference core/prbs.py:50)
_TAPDICT = {7: (7, 6), 15: (15, 14), 23: (23, 18), 31: (31, 28)}
#: masks for the internal XOR (Galois) LFSR per order (reference core/prbs.py:81-86)
_MASKS = {
    7: 2 ** 7 + 2 ** 6 + 1,
    15: 2 ** 15 + 2 ** 14 + 1,
    23: 2 ** 23 + 2 ** 18 + 1,
    31: 2 ** 31 + 2 ** 28 + 1,
}


def _seed_to_int(seed, order):
    if seed is None:
        return bool2bin(np.ones(order))
    try:
        return bool2bin(seed)
    except TypeError:
        return int(seed)


def prbs_ext(seed, taps, nbits, N):
    """External-XOR (Fibonacci) LFSR bit stream.

    Matches reference pythran_dsp.py:156-166 bit-for-bit: at each step the
    output bit is the XOR over register bits ``nbits - t`` and the register
    shifts right with the new bit entering at the top.

    Implementation: the output sequence obeys out[n] = XOR_t out[n-t]; the
    first ``nbits`` outputs are produced by the exact register loop, the rest
    by the vectorised recurrence in chunks of min(taps) samples.
    """
    taps = tuple(int(t) for t in taps)
    out = np.zeros(max(N, nbits), dtype=np.uint8)
    sr = int(seed)
    # exact register loop for the first nbits outputs
    for i in range(min(N, nbits) if N < nbits else nbits):
        xor = 0
        for t in taps:
            if (sr & (1 << (nbits - t))) != 0:
                xor ^= 1
        sr = (xor << (nbits - 1)) + (sr >> 1)
        out[i] = xor
    if N <= nbits:
        return out[:N]
    # vectorised linear recurrence: out[n] = XOR_t out[n-t]
    chunk = min(taps)
    i = nbits
    while i < N:
        m = min(chunk, N - i)
        acc = out[i - taps[0]:i - taps[0] + m].copy()
        for t in taps[1:]:
            acc ^= out[i - t:i - t + m]
        out[i:i + m] = acc
        i += m
    return out[:N]


def prbs_int(seed, mask, nbits, N):
    """Internal-XOR (Galois) LFSR bit stream (reference pythran_dsp.py:168-178).

    Galois form has a serial dependency through the full register; uses the
    native C kernel when built (qampy_tpu/native), else a Python loop.
    """
    from qampy_tpu.native import get_lib
    import ctypes
    lib = get_lib()
    out = np.zeros(N, dtype=np.uint8)
    if lib is not None:
        lib.prbs_int(int(seed), int(mask), int(nbits),
                     out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), int(N))
        return out
    state = int(seed)
    for i in range(N):
        state = state << 1
        xor = state >> nbits
        if xor != 0:
            state ^= mask
        out[i] = xor
    return out


def make_prbs_extXOR(order, nbits, seed=None):
    """PRBS of the given order using a Fibonacci LFSR (reference core/prbs.py:27-60)."""
    assert order in _TAPDICT, "Only orders 7, 15, 23, 31 are implemented"
    nbits = int(nbits)
    seed = _seed_to_int(seed, order)
    return prbs_ext(seed, _TAPDICT[order], order, nbits).astype(bool)


def make_prbs_intXOR(order, nbits, seed=None):
    """PRBS of the given order using a Galois LFSR (reference core/prbs.py:63-96)."""
    assert order in _MASKS, "Only orders 7, 15, 23, 31 are implemented"
    seed = _seed_to_int(seed, order)
    return prbs_int(seed, _MASKS[order], order, int(nbits)).astype(bool)

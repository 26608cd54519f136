"""Signal-object IO API.

Parity: qampy/io.py in the reference.
"""
from __future__ import annotations

import numpy as np

from qampy_tpu.core.io import save_signal, load_signal, ndarray_from_matlab
from qampy_tpu import signals


def load_symbols_from_matlab_file(fn, M, keys, fb=10e9, normalise=True,
                                  fake_polmux=False, **kwargs):
    """Load symbols from a matlab file into a SignalQAMGrayCoded object.

    Parity: reference qampy/io.py:28-74 (incl. the fake pol-mux duplication).
    """
    symbs = ndarray_from_matlab(fn, keys, **kwargs)
    symbs = np.atleast_2d(symbs)
    if fake_polmux:
        symbs = np.vstack([symbs, symbs])
    if normalise:
        symbs = symbs / np.sqrt(np.mean(abs(symbs) ** 2, axis=-1))[:, None]
    return signals.SignalQAMGrayCoded.from_symbol_array(symbs, M=M, fb=fb)

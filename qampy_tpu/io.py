"""Signal-object IO API.

Parity: qampy/io.py in the reference.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from qampy_tpu.core.io import save_signal, load_signal, ndarray_from_matlab
from qampy_tpu import signals, helpers


def load_symbols_from_matlab_file(fn, M, keys, fb=10e9, fake_polmux=False,
                                  fake_pm_delay=0, normalise=True, **kwargs):
    """Create a signal object from symbols stored in a matlab file.

    Parity: reference qampy/io.py:28-75 (same key schemas, fake pol-mux with
    optional delay, normalisation).
    """
    symbs = ndarray_from_matlab(fn, keys, **kwargs)
    symbs = np.atleast_2d(symbs)
    if fake_polmux:
        symbs = np.vstack([np.roll(symbs, fake_pm_delay), symbs])
    if normalise:
        symbs = np.asarray(helpers.normalise_and_center(jnp.asarray(symbs)))
    return signals.SignalQAMGrayCoded.from_symbol_array(symbs, M, fb)


def create_signal_from_matlab(symbols, fn, fs, keys, **kwargs):
    """Load measured waveform data and attach it to a symbols object.

    Parity: reference qampy/io.py:78-110.
    """
    data = ndarray_from_matlab(fn, keys, **kwargs)
    return symbols.recreate_from_np_array(np.atleast_2d(data), fs=fs)

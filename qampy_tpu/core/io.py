"""IO helpers: compressed signal persistence and matlab import.

Parity: qampy/core/io.py in the reference. Signal pytrees pickle naturally
(device arrays are converted to host numpy before pickling so files are
portable and loading does not require a device).
"""
from __future__ import annotations

import pickle
import zlib

import numpy as np
import jax


def _to_host(obj):
    return jax.tree_util.tree_map(
        lambda x: np.asarray(x) if isinstance(x, jax.Array) else x, obj)


def save_signal(fn, signal, lvl=4):
    """Save a signal object as a zlib-compressed pickle (reference core/io.py:29-46)."""
    with open(fn, "wb") as fp:
        sc = zlib.compress(pickle.dumps(_to_host(signal), protocol=pickle.HIGHEST_PROTOCOL),
                           level=lvl)
        fp.write(sc)


def load_signal(fn):
    """Load a signal object from a zlib-compressed pickle (reference core/io.py:48-64)."""
    with open(fn, "rb") as fp:
        s = zlib.decompress(fp.read())
        return pickle.loads(s)


def ndarray_from_matlab(fn, keys, transpose=False, dim2cmplx=False,
                        portmap=[[0, 1], [2, 3]]):
    """Load symbols from a matlab file into (nmodes, N) complex form.

    Parity: reference core/io.py:66-127 (same key-schema conventions).
    """
    from scipy.io import loadmat
    mat_dict = loadmat(fn)
    if len(keys) == 1:
        if len(keys[0]) == 2:
            symbs = mat_dict[keys[0][0]] + 1j * mat_dict[keys[0][1]]
        elif len(keys[0]) == 1:
            symbs = mat_dict[keys[0][0]]
        else:
            raise ValueError("Keys is in the wrong format, see documentation for correct format")
        if transpose:
            symbs = np.transpose(symbs)
    else:
        rows = []
        for i in range(len(keys)):
            if len(keys[0]) == 2:
                rows.append(mat_dict[keys[i][0]].flatten() + 1j * mat_dict[keys[i][1]].flatten())
            elif len(keys[0]) == 1:
                rows.append(mat_dict[keys[i][0]].flatten())
            else:
                raise ValueError("Keys is in the wrong format, see documentation for correct format")
        symbs = np.vstack(rows) if len(rows) > 1 else rows[0]
    if dim2cmplx:
        out = []
        for i in range(len(portmap)):
            out.append(symbs[portmap[i][0]] + 1j * symbs[portmap[i][1]])
        symbs = np.array(out)
    return symbs

"""Sequence synchronisation and BER helper functions.

Parity: qampy/core/ber_functions.py in the reference. Cross-correlations are
computed with jnp.fft (one padded FFT instead of scipy.fftconvolve); the
4-rotation complex ambiguity search is vectorised into a single batched FFT
correlation. Length adjustment / periodic padding logic operates on static
shapes (known at trace time) and is jit-compatible apart from the final
data-dependent rolls, which jnp.roll supports with traced shifts.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from qampy_tpu import utils


class DataSyncError(Exception):
    pass


def _xcorr_full(x, y):
    """Full linear cross-correlation ``fftconvolve(x, conj(y)[::-1])`` via FFT.

    x may be (..., N_X) and y (..., N_Y); correlates along the last axis.
    Returns an array of length N_X + N_Y - 1 on the last axis.
    """
    n = x.shape[-1] + y.shape[-1] - 1
    nfft = int(2 ** np.ceil(np.log2(n)))
    X = jnp.fft.fft(x, nfft)
    Y = jnp.fft.fft(jnp.conj(y)[..., ::-1], nfft)
    ac = jnp.fft.ifft(X * Y)[..., :n]
    if not (jnp.iscomplexobj(x) or jnp.iscomplexobj(y)):
        ac = ac.real
    return ac


def find_sequence_offset(x, y, show_cc=False):
    """Find the shift of ``y`` that aligns it with ``x`` by cross-correlation.

    Parity: reference core/ber_functions.py:33-72.
    """
    X = 1. * jnp.asarray(x)
    Y = 1. * jnp.asarray(y)
    ac = _xcorr_full(X, Y)
    idx = jnp.argmax(jnp.abs(ac)) - (Y.shape[0] - 1)
    if show_cc:
        return idx, ac
    return idx


def find_sequence_offset_complex(x, y):
    """Offset search including the 4-fold phase ambiguity of complex signals.

    Parity: reference core/ber_functions.py:74-106; the reference loops over
    the four rotations calling fftconvolve each time — here the rotation only
    scales the correlation by ``1j**i`` so a single correlation is computed
    and the four rotations are evaluated from it.

    Returns (idx, y_rotated, ii, acm).
    """
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    if not jnp.iscomplexobj(x) and not jnp.iscomplexobj(y):
        idx, ac = find_sequence_offset(x, y, show_cc=True)
        return idx, y, 0, jnp.max(jnp.abs(ac))
    ac = _xcorr_full(1. * x, 1. * y)  # correlation of un-rotated y
    # rotating y by 1j**i multiplies the correlation by conj(1j**i)
    rots = jnp.asarray([1j ** i for i in range(4)], dtype=ac.dtype)
    ac4 = ac[None, :] * jnp.conj(rots)[:, None]
    # per-rotation peak of the real part (matches reference ac.real.max())
    acmax = jnp.max(ac4.real, axis=-1)
    ii = jnp.argmax(acmax)
    acm = acmax[ii]
    idx = jnp.argmax(jnp.abs(ac)) - (y.shape[0] - 1)
    return idx, y * 1j ** ii, ii, acm


def sync_and_adjust(data_tx, data_rx, adjust="tx"):
    """Synchronise and length-adjust a tx/rx sequence pair.

    Parity: reference core/ber_functions.py:108-161. Returns ((tx, rx), acm).
    """
    data_tx = jnp.asarray(data_tx)
    data_rx = jnp.asarray(data_rx)
    N_tx = data_tx.shape[0]
    N_rx = data_rx.shape[0]
    assert adjust in ("tx", "rx"), "adjust needs to be either 'tx' or 'rx'"
    if N_tx > N_rx:
        if adjust == "tx":
            offset, tx, ii, acm = find_sequence_offset_complex(data_rx, data_tx)
            tx = jnp.roll(tx, offset)
            return adjust_data_length(tx, data_rx, method="truncate"), acm
        offset, rx, ii, acm = find_sequence_offset_complex(data_tx, data_rx)
        tx, rx = adjust_data_length(data_tx, rx, method="extend", offset=offset)
        return (tx, rx), acm
    elif N_tx < N_rx:
        if adjust == "tx":
            offset, tx, ii, acm = find_sequence_offset_complex(data_rx, data_tx)
            tx, rx = adjust_data_length(tx, data_rx, method="extend", offset=offset)
            return (tx, rx), acm
        offset, rx, ii, acm = find_sequence_offset_complex(data_tx, data_rx)
        rx = jnp.roll(rx, offset)
        return adjust_data_length(data_tx, rx, method="truncate"), acm
    else:
        if adjust == "tx":
            offset, tx, ii, acm = find_sequence_offset_complex(data_rx, data_tx)
            return (jnp.roll(tx, offset), data_rx), acm
        offset, rx, ii, acm = find_sequence_offset_complex(data_tx, data_rx)
        return (data_tx, jnp.roll(rx, offset)), acm


def _adjust_to(data, N, back=True, offset_roll=0):
    """Periodically extend ``data`` to length N (reference core/ber_functions.py:308-320).

    The reference builds [tile..., head] (back=True) or [tail, tile...]
    (back=False) with python-level hstack; here the same layout is produced
    with static shapes. ``N`` must be a python int (static).
    """
    data = jnp.asarray(data)
    L = data.shape[0]
    N = int(N)
    K = N // L
    rem = N % L
    parts = [data] * K
    if back:
        parts = parts + [data[:rem]]
    else:
        parts = [data[L - rem:]] + parts
    if len(parts) == 0:
        return data[:0]
    return jnp.concatenate(parts) if len(parts) > 1 else parts[0]


def adjust_data_length(data_tx, data_rx, method=None, offset=0):
    """Adjust lengths of tx/rx by truncation or periodic extension.

    Parity: reference core/ber_functions.py:243-306. ``offset`` may be traced;
    the reference splits the periodic extension at ``offset`` — equivalently we
    extend assuming offset 0 and roll by the offset remainder, which gives the
    same periodic sequence for inputs that are truly periodic continuations.
    """
    data_tx = jnp.asarray(data_tx)
    data_rx = jnp.asarray(data_rx)
    Ltx, Lrx = data_tx.shape[0], data_rx.shape[0]
    if method is None:
        if Ltx > Lrx:
            return data_tx[:Lrx], data_rx
        elif Ltx < Lrx:
            data_tx = _extend_with_offset(data_tx, Lrx, offset)
            return data_tx, data_rx
        return data_tx, data_rx
    elif method == "truncate":
        if Ltx > Lrx:
            return data_tx[:Lrx], data_rx
        elif Ltx < Lrx:
            return data_tx, data_rx[:Ltx]
        return data_tx, data_rx
    elif method == "extend":
        if Ltx > Lrx:
            return data_tx, _extend_with_offset(data_rx, Ltx, offset)
        elif Ltx < Lrx:
            return _extend_with_offset(data_tx, Lrx, offset), data_rx
        return data_tx, data_rx
    raise ValueError("method must be None, 'truncate' or 'extend'")


def _extend_with_offset(data, N, offset):
    """Periodic extension honouring the reference's offset split.

    reference: hstack([_adjust_to(data, offset, back=False),
                       _adjust_to(data, N - offset)]) — element i of the
    result is ``data[(i - offset) mod L]`` so that data[0] lands at index
    ``offset``. Implemented as a modular gather so offset may be traced.
    """
    data = jnp.asarray(data)
    L = data.shape[0]
    idx = jnp.mod(jnp.arange(int(N)) - offset, L)
    return data[idx]


def cal_ber_syncd(data_rx, data_tx, threshold=0.2):
    """BER between two synchronised binary streams (reference core/ber_functions.py:322-356)."""
    errs = int(jnp.count_nonzero(jnp.asarray(data_rx) != jnp.asarray(data_tx)))
    N = len(data_tx)
    ber = errs / N
    if ber > threshold:
        raise ValueError("BER is over %.1f, this is probably a wrong sync" % threshold)
    return ber, errs, N


def cal_ber_nosyncd(data_rx, data_tx):
    """BER between an unsynchronised rx bit stream and a known tx sequence.

    Parity: reference core/ber_functions.py:359-394 (whose body references an
    undefined variable — fixed here): find the offset by correlation, trying
    the inverted tx data if the sync fails, periodically extend tx to the rx
    length, then count errors.
    """
    data_rx = np.asarray(data_rx).astype(bool)
    data_tx = np.asarray(data_tx).astype(bool)
    results = []
    for tx in (data_tx, ~data_tx):
        idx = int(find_sequence_offset(tx.astype(np.float32) - 0.5,
                                       data_rx.astype(np.float32) - 0.5))
        tx_sync = np.roll(tx, -idx)
        tx_sync, rx = adjust_data_length(jnp.asarray(tx_sync), jnp.asarray(data_rx))
        errs = int(jnp.count_nonzero(tx_sync != rx))
        results.append((errs, tx_sync, rx))
    errs, tx_sync, rx = min(results, key=lambda r: r[0])
    return cal_ber_syncd(rx, tx_sync)


def sync_rx2tx(data_tx, data_rx, Lsync, imax=200):
    """Sync rx to tx using a known sub-sequence search (reference core/ber_functions.py:163-201)."""
    data_tx_np = np.asarray(data_tx)
    data_rx_np = np.asarray(data_rx)
    for i in np.arange(imax) * Lsync:
        try:
            seq = data_rx_np[i:i + Lsync]
            idx_offs = utils.find_offset(seq, data_tx_np) - i
            return idx_offs, np.roll(data_rx_np, idx_offs)
        except ValueError:
            pass
    raise DataSyncError("maximum iterations exceeded")


def sync_tx2rx(data_tx, data_rx, Lsync, imax=200):
    """Sync tx to rx using a known sub-sequence search (reference core/ber_functions.py:203-241)."""
    data_tx_np = np.asarray(data_tx)
    data_rx_np = np.asarray(data_rx)
    for i in np.arange(imax) * Lsync:
        try:
            seq = data_rx_np[i:i + Lsync]
            idx_offs = utils.find_offset(seq, data_tx_np) - i
            return idx_offs, np.roll(data_tx_np, -idx_offs)
        except ValueError:
            pass
    raise DataSyncError("maximum iterations exceeded")

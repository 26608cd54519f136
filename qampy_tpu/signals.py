"""Signal objects as registered JAX pytrees.

Parity: qampy/signals.py in the reference, which builds everything on
``np.ndarray`` subclasses carrying metadata through ``__array_finalize__``
(signals.py:144-220). That design cannot pass through ``jax.jit``; here a
signal is a registered pytree whose *leaves* are the device arrays (samples,
tx symbols, constellation, bitmap) and whose aux data are the static
attributes (rates, QAM order, encoding tables). Signals therefore flow
through jit/vmap/shard_map unchanged, while keeping the reference's
ergonomics: ``sig.cal_ser()``, ``sig * 2``, ``sig[ :, ::2]``,
``sig.resample(...)`` all work and preserve attributes.
"""
from __future__ import annotations

import fractions
import warnings

import numpy as np
import jax
import jax.numpy as jnp

from qampy_tpu import theory, helpers
from qampy_tpu.prbs import make_prbs_extXOR
from qampy_tpu.core import sync as ber_functions
from qampy_tpu.core.metrics import (
    make_decision,
    decision_idx,
    estimate_snr,
    soft_l_value_demapper,
    soft_l_value_demapper_minmax,
    generate_bitmapping_mtx,
    cal_mi,
)

# module-namespace parity with reference qampy/signals.py:48-49
_core_make_decision = make_decision
_core_estimate_snr = estimate_snr
_core_cal_mi = cal_mi
from qampy_tpu.core.io import save_signal


DEFAULT_DTYPE = np.complex64


# ---------------------------------------------------------------------------
# bit sources
# ---------------------------------------------------------------------------

class RandomBits(np.ndarray):
    """Random bit array of shape (nmodes, N) (reference signals.py:53-86)."""

    def __new__(cls, N, nmodes=1, seed=None):
        R = np.random.RandomState(seed)
        bitsq = R.randint(0, high=2, size=(nmodes, N)).astype(bool)
        obj = bitsq.view(cls)
        obj._rand_state = R
        obj._seed = seed
        return obj

    def __array_finalize__(self, obj):
        if obj is None:
            return
        self._seed = getattr(obj, "_seed", None)
        self._rand_state = getattr(obj, "_rand_state", None)


class PRBSBits(np.ndarray):
    """PRBS bit array of shape (nmodes, N) (reference signals.py:89-142)."""

    def __new__(cls, N, nmodes=1, seed=[None, None], order=[15, 23]):
        order = list(order)
        seed = list(seed)
        if len(order) < nmodes:
            warnings.warn("PRBS order not given for all modes, picking random orders and seeds")
            orders = [15, 23]
            order_n, seed_n = [], []
            for i in range(nmodes):
                try:
                    order_n.append(order[i])
                    seed_n.append(seed[i])
                except IndexError:
                    o = int(np.random.choice(orders))
                    order_n.append(o)
                    seed_n.append(int(np.random.randint(0, 2 ** o)))
            order, seed = order_n, seed_n
        bits = np.empty((nmodes, N), dtype=bool)
        for i in range(nmodes):
            bits[i][:] = make_prbs_extXOR(order[i], N, seed[i])
        obj = bits.view(cls)
        obj._order = order
        obj._seed = seed
        return obj

    def __array_finalize__(self, obj):
        if obj is None:
            return
        self._seed = getattr(obj, "_seed", None)
        self._order = getattr(obj, "_order", None)


# ---------------------------------------------------------------------------
# pytree plumbing
# ---------------------------------------------------------------------------

class _HashableArray:
    """Immutable numpy-array wrapper usable as pytree aux data (hash by bytes)."""

    __slots__ = ("arr", "_hash")

    def __init__(self, arr):
        self.arr = np.asarray(arr)
        self.arr.setflags(write=False)
        self._hash = hash((self.arr.shape, self.arr.dtype.str, self.arr.tobytes()))

    def __hash__(self):
        return self._hash

    def __eq__(self, other):
        return (isinstance(other, _HashableArray) and self._hash == other._hash
                and np.array_equal(self.arr, other.arr))


def _sigclass(cls):
    """Register a Signal subclass as a pytree node.

    ``cls._leaf_fields`` are traced children; ``cls._aux_fields`` are static.
    """
    leaf_fields = cls._leaf_fields
    aux_fields = cls._aux_fields

    def flatten(obj):
        children = tuple(getattr(obj, f) for f in leaf_fields)
        aux = tuple(_freeze_aux(getattr(obj, f)) for f in aux_fields)
        return children, aux

    def unflatten(aux, children):
        obj = object.__new__(cls)
        for f, c in zip(leaf_fields, children):
            object.__setattr__(obj, f, c)
        for f, a in zip(aux_fields, aux):
            object.__setattr__(obj, f, _thaw_aux(a))
        return obj

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)
    return cls


def _freeze_aux(v):
    if isinstance(v, np.ndarray):
        return _HashableArray(v)
    if isinstance(v, list):
        return tuple(v)
    return v


def _thaw_aux(v):
    if isinstance(v, _HashableArray):
        return v.arr
    return v


# ---------------------------------------------------------------------------
# base signal
# ---------------------------------------------------------------------------

class Signal:
    """Base signal: (nmodes, N) samples + tx reference symbols + metadata.

    Mirrors the role of ``SignalBase`` (reference signals.py:144-607). The
    object behaves array-like (indexing, arithmetic, np.asarray) and every
    such operation returns a new signal with attributes preserved, like the
    reference's ``__array_finalize__`` inheritance.
    """

    _leaf_fields = ("samples", "_symbols", "_coded_symbols")
    _aux_fields = ("_fb", "_fs", "_M")

    def __init__(self, samples, symbols=None, coded_symbols=None, fb=1, fs=None, M=None):
        self.samples = jnp.asarray(samples)
        self._symbols = self.samples if symbols is None else jnp.asarray(symbols)
        self._coded_symbols = None if coded_symbols is None else jnp.asarray(coded_symbols)
        self._fb = fb
        self._fs = fb if fs is None else fs
        self._M = M

    # -- replace/copy ------------------------------------------------------
    def replace(self, **kwargs):
        """Return a copy with the given fields replaced, all others inherited."""
        obj = object.__new__(type(self))
        for f in self._leaf_fields + self._aux_fields:
            object.__setattr__(obj, f, getattr(self, f))
        for k, v in kwargs.items():
            key = k if (k in self._leaf_fields or k in self._aux_fields) else "_" + k
            if key not in self._leaf_fields + self._aux_fields and k != "samples":
                raise AttributeError("%s has no field %s" % (type(self).__name__, k))
            object.__setattr__(obj, key if k != "samples" else "samples", v)
        return obj

    def recreate_from_np_array(self, arr, **kwargs):
        """Reference-compatible helper (signals.py:209-220): new samples, same metadata."""
        if "fb" in kwargs and "fs" not in kwargs:
            kwargs["fs"] = self.os * kwargs["fb"]
        return self.replace(samples=jnp.asarray(arr), **kwargs)

    # -- array protocol ----------------------------------------------------
    @property
    def shape(self):
        return self.samples.shape

    @property
    def ndim(self):
        return self.samples.ndim

    @property
    def dtype(self):
        return self.samples.dtype

    def __len__(self):
        return self.samples.shape[0]

    def __array__(self, dtype=None, copy=None):
        a = np.asarray(self.samples)
        return a.astype(dtype) if dtype is not None else a

    def __jax_array__(self):
        return self.samples

    def __getitem__(self, key):
        return self.replace(samples=self.samples[key])

    def __repr__(self):
        return "%s(shape=%s, dtype=%s, fb=%s, fs=%s, M=%s)" % (
            type(self).__name__, self.shape, self.dtype, self._fb, self._fs, self._M)

    def _binop(self, other, op):
        o = other.samples if isinstance(other, Signal) else other
        return self.replace(samples=op(self.samples, o))

    def __add__(self, other):
        return self._binop(other, lambda a, b: a + b)

    __radd__ = __add__

    def __sub__(self, other):
        return self._binop(other, lambda a, b: a - b)

    def __rsub__(self, other):
        return self._binop(other, lambda a, b: b - a)

    def __mul__(self, other):
        return self._binop(other, lambda a, b: a * b)

    __rmul__ = __mul__

    def __truediv__(self, other):
        return self._binop(other, lambda a, b: a / b)

    def __rtruediv__(self, other):
        return self._binop(other, lambda a, b: b / a)

    def __neg__(self):
        return self.replace(samples=-self.samples)

    def conj(self):
        return self.replace(samples=jnp.conj(self.samples))

    @property
    def real(self):
        return self.samples.real

    @property
    def imag(self):
        return self.samples.imag

    def flatten(self):
        return self.samples.flatten()

    def copy(self):
        return self.replace()

    # -- metadata ----------------------------------------------------------
    @property
    def M(self):
        return self._M

    @property
    def fb(self):
        return self._fb

    @property
    def fs(self):
        return self._fs

    @property
    def os(self):
        return int(round(self._fs / self._fb))

    @property
    def symbols(self):
        return self._symbols

    @property
    def coded_symbols(self):
        return self._coded_symbols

    # -- resampling --------------------------------------------------------
    def resample(self, fnew, **kwargs):
        """RRC-filtered rational resampling (reference signals.py:222-243)."""
        from qampy_tpu.core import resample as _resample
        if np.isclose(fnew / self._fs, 1):
            return self.replace()
        Ts = kwargs.pop("Ts", 1 / self._fb)
        new = _resample.rrcos_resample(self.samples, self._fs, fnew, Ts=Ts, **kwargs)
        return self.replace(samples=jnp.asarray(new, dtype=self.dtype), _fs=fnew)

    # -- sync helpers ------------------------------------------------------
    def _signal_present(self, signal):
        if signal is None:
            return jnp.atleast_2d(self.samples)
        if isinstance(signal, Signal):
            return jnp.atleast_2d(signal.samples)
        return jnp.atleast_2d(jnp.asarray(signal))

    def _sync_and_adjust(self, tx, rx, synced=False):
        """Greedy mode matching + length adjustment (reference signals.py:245-266).

        The reference scores every (rx mode, tx mode) pair with its own
        ``sync_and_adjust`` call; doing that here would ping-pong the host
        <->device boundary nmodes^2 times (one scalar fetch per pair). The
        pair scores are instead computed in ONE batched FFT correlation
        (the ``ops/pilots.frame_sync`` pattern) and fetched as a single
        (rxmodes, txmodes) matrix; the greedy assignment then runs host-side
        and only the chosen pairs are actually synced (rxmodes device calls
        instead of rxmodes*txmodes).
        """
        if synced:
            return self._adjust_only(tx, rx)
        tx = jnp.atleast_2d(tx)
        rx = jnp.atleast_2d(rx)
        txmodes = tx.shape[0]
        rxmodes = rx.shape[0]
        # score[j, i] == the acm that sync_and_adjust(tx[i], rx[j]) returns:
        # every adjust="tx" branch of core/sync.sync_and_adjust scores via
        # find_sequence_offset_complex(rx_j, tx_i), whose max-over-4-rotations
        # peak reduces to max_t max(|Re ac|, |Im ac|) for complex data and
        # max_t |ac| for real data (core/sync.py:52-77)
        ac = ber_functions._xcorr_full(1. * rx[:, None, :], 1. * tx[None, :, :])
        if jnp.iscomplexobj(tx) or jnp.iscomplexobj(rx):
            score = jnp.max(jnp.maximum(jnp.abs(ac.real), jnp.abs(ac.imag)),
                            axis=-1)
        else:
            score = jnp.max(jnp.abs(ac), axis=-1)
        score = np.asarray(score)                       # ONE device fetch
        idxx = list(range(max(txmodes, rxmodes)))
        tx_out, rx_out = [], []
        for j in range(rxmodes):
            # same strict-> greedy order as the reference's scalar loop
            acm = -100.
            best_i = None
            for i in idxx:
                act = float(score[j, i % txmodes])
                if act > acm:
                    best_i = i
                    acm = act
            idxx.remove(best_i)
            (t, r), _ = ber_functions.sync_and_adjust(tx[best_i % txmodes], rx[j])
            tx_out.append(t)
            rx_out.append(r)
        return jnp.stack(tx_out), jnp.stack(rx_out)

    def _adjust_only(self, tx, rx, which="tx"):
        """Length adjustment without sync (reference signals.py:268-292)."""
        tx = jnp.atleast_2d(tx)
        rx = jnp.atleast_2d(rx)
        if tx.shape[0] > rx.shape[0]:
            tx = tx[:rx.shape[0]]
        if tx.shape == rx.shape:
            return tx, rx
        if which == "tx":
            method = "truncate" if tx.shape[1] > rx.shape[1] else "extend"
        elif which == "rx":
            method = "extend" if tx.shape[1] > rx.shape[1] else "truncate"
        else:
            raise ValueError("which has to be either 'tx' or 'rx'")
        tx_out, rx_out = [], []
        for i in range(tx.shape[0]):
            t, r = ber_functions.adjust_data_length(tx[i], rx[i], method)
            tx_out.append(t)
            rx_out.append(r)
        return jnp.stack(tx_out), jnp.stack(rx_out)

    # -- decisions & metrics ----------------------------------------------
    def make_decision(self, signal=None, verbose=False):
        """Nearest-constellation decisions (reference signals.py:847-870)."""
        signal = self._signal_present(signal)
        outsyms, dist, idx = _core_make_decision(signal, self._coded_symbols)
        if verbose:
            return outsyms, dist, idx
        return outsyms

    def cal_ser(self, signal_rx=None, synced=False, verbose=False):
        """Symbol error rate per mode (reference signals.py:295-335)."""
        signal_rx = self._signal_present(signal_rx)
        symbols_tx, signal_rx = self._sync_and_adjust(self.symbols, signal_rx, synced)
        data_demod = self.make_decision(signal_rx)
        errs = data_demod - symbols_tx
        ser = jnp.count_nonzero(errs, axis=-1) / data_demod.shape[1]
        if verbose:
            return ser, errs, symbols_tx
        return ser

    def cal_evm(self, signal_rx=None, synced=False, blind=False):
        """RMS error vector magnitude per mode (reference signals.py:381-421)."""
        signal_rx = self._signal_present(signal_rx)
        if blind:
            symbols_tx = self.make_decision(signal_rx)
        else:
            symbols_tx, signal_rx = self._sync_and_adjust(self.symbols, signal_rx, synced)
        return jnp.sqrt(jnp.mean(helpers.cabssquared(symbols_tx - signal_rx), axis=-1))

    def est_snr(self, signal_rx=None, synced=False, symbols_tx=None, verbose=False):
        """Data-aided SNR estimate per mode (reference signals.py:423-456)."""
        signal_rx = self._signal_present(signal_rx)
        if symbols_tx is None:
            symbols_tx = self.symbols
        symbols_tx, signal_rx = self._sync_and_adjust(symbols_tx, signal_rx, synced)
        snr, s0, n0 = jax.vmap(_core_estimate_snr, in_axes=(0, 0, None))(
            signal_rx, symbols_tx, self._coded_symbols)
        if verbose:
            return snr, s0, n0
        return snr

    def normalize_and_center(self, symbol_based=False, synced=False):
        """Normalise and center, returning a new signal (reference signals.py:549-568).

        Unlike the reference (in-place on the ndarray subclass) this is pure.
        """
        if not symbol_based:
            return self.replace(samples=helpers.normalise_and_center(self.samples))
        s = self.samples - jnp.mean(self.samples, axis=-1, keepdims=True)
        p = self.est_snr(synced=synced, verbose=True)[1]
        return self.replace(samples=s / jnp.sqrt(p)[:, None].astype(s.dtype))

    def save_to_file(self, fn, lvl=5):
        save_signal(fn, self, lvl)


# ---------------------------------------------------------------------------
# gray-coded QAM
# ---------------------------------------------------------------------------

@_sigclass
class SignalQAMGrayCoded(Signal):
    """Gray-coded square/cross M-QAM signal (reference signals.py:611-930)."""

    _leaf_fields = ("samples", "_symbols", "_coded_symbols", "_bitmap_mtx")
    _aux_fields = ("_fb", "_fs", "_M", "_encoding", "_code", "_bits")

    def __init__(self, M, N, nmodes=1, fb=1, bitclass=RandomBits, dtype=DEFAULT_DTYPE,
                 **kwargs):
        scale = np.sqrt(theory.cal_scaling_factor_qam(M))
        coded_symbols, graycode, encoding, bitmap_mtx = self._generate_mapping(M, scale, dtype=dtype)
        Nbits = int(N * np.log2(M))
        bits = bitclass(Nbits, nmodes=nmodes, **kwargs)
        samples = self._modulate(np.asarray(bits), encoding, coded_symbols, dtype=dtype)
        self.samples = jnp.asarray(samples)
        self._symbols = self.samples
        self._coded_symbols = jnp.asarray(coded_symbols)
        self._bitmap_mtx = jnp.asarray(bitmap_mtx)
        self._M = M
        self._fb = fb
        self._fs = fb
        self._code = np.asarray(graycode)
        self._encoding = np.asarray(encoding)
        self._bits = np.asarray(bits)

    # -- mapping construction (host-side, static) -------------------------
    @classmethod
    def _generate_mapping(cls, M, scale, dtype=DEFAULT_DTYPE):
        """Constellation + gray map + bit encoding (reference signals.py:831-845)."""
        Nbits = int(np.log2(M))
        symbols = theory.cal_symbols_qam(M).astype(dtype)
        symbols /= scale
        graycode = theory.gray_code_qam(M)
        u = np.zeros_like(graycode)
        u[graycode] = np.arange(u.size)
        coded_symbols = symbols[u]
        encoding = np.zeros((graycode.size, Nbits), bool)
        for i in range(graycode.size):
            encoding[i] = ((i & (1 << np.arange(Nbits))) > 0)[::-1]
        bitmap_mtx = generate_bitmapping_mtx(
            coded_symbols, cls._demodulate_idx(np.arange(graycode.size), encoding), M, dtype=dtype)
        return coded_symbols, graycode, encoding, bitmap_mtx

    @staticmethod
    def _demodulate_idx(symbol_idx, encoding):
        """Symbol indices -> bits (reference signals.py:677-702)."""
        symbol_idx = np.asarray(symbol_idx)
        bits = np.asarray(encoding)[symbol_idx]
        if symbol_idx.ndim > 1:
            return bits.reshape(symbol_idx.shape[0], -1)
        return bits.flatten()

    @staticmethod
    def _modulate(data, encoding, coded_symbols, dtype=DEFAULT_DTYPE):
        """Bits -> symbols (reference signals.py:704-731); vectorised packing."""
        data = np.atleast_2d(np.asarray(data, dtype=bool))
        M = np.asarray(coded_symbols).shape[0]
        bitspsym = int(np.log2(M))
        Nsym = data.shape[1] // bitspsym
        cov = 2 ** np.arange(bitspsym - 1, -1, -1)
        datab = data[:, :Nsym * bitspsym].reshape(data.shape[0], Nsym, bitspsym)
        idx = datab @ cov
        return np.asarray(coded_symbols)[idx].astype(dtype)

    # -- alternative constructors -----------------------------------------
    @classmethod
    def from_symbol_array(cls, symbs, M=None, fb=1, dtype=None):
        """Build a signal object from existing symbols (reference signals.py:733-782)."""
        symbs = np.atleast_2d(np.asarray(symbs))
        if M is None:
            warnings.warn("no M given, estimating from unique symbols, this can cause errors")
            M = np.unique(symbs).shape[0]
        if dtype is None:
            dtype = symbs.dtype
        P = (abs(np.unique(symbs)) ** 2).mean()
        if not np.isclose(P, 1):
            warnings.warn("Power of symbols is not normalized to 1, this might cause issues later")
        scale = np.sqrt(theory.cal_scaling_factor_qam(M)) / np.sqrt(P)
        coded_symbols, graycode, encoding, bitmap_mtx = cls._generate_mapping(M, scale, dtype=dtype)
        det, _, idx = _core_make_decision(jnp.asarray(symbs), jnp.asarray(coded_symbols))
        bits = cls._demodulate_idx(np.asarray(idx), encoding)
        obj = object.__new__(cls)
        obj.samples = jnp.asarray(det, dtype=dtype)
        obj._symbols = obj.samples
        obj._coded_symbols = jnp.asarray(coded_symbols)
        obj._bitmap_mtx = jnp.asarray(bitmap_mtx)
        obj._M = M
        obj._fb = fb
        obj._fs = fb
        obj._code = np.asarray(graycode)
        obj._encoding = np.asarray(encoding)
        obj._bits = np.asarray(bits)
        return obj

    @classmethod
    def from_bit_array(cls, bits, M, fb=1, dtype=DEFAULT_DTYPE):
        """Build a signal object from a bit array (reference signals.py:784-829)."""
        arr = np.atleast_2d(np.asarray(bits))
        nbits = int(np.log2(M))
        if arr.shape[1] % nbits > 0:
            warnings.warn("Length of bits not divisible by log2(M), truncating")
            arr = arr[:, : arr.shape[1] // nbits * nbits]
        scale = np.sqrt(theory.cal_scaling_factor_qam(M))
        coded_symbols, graycode, encoding, bitmap_mtx = cls._generate_mapping(M, scale, dtype=dtype)
        out = cls._modulate(arr, encoding, coded_symbols, dtype)
        obj = object.__new__(cls)
        obj.samples = jnp.asarray(out)
        obj._symbols = obj.samples
        obj._coded_symbols = jnp.asarray(coded_symbols)
        obj._bitmap_mtx = jnp.asarray(bitmap_mtx)
        obj._M = M
        obj._fb = fb
        obj._fs = fb
        obj._code = np.asarray(graycode)
        obj._encoding = np.asarray(encoding)
        obj._bits = np.asarray(arr)
        return obj

    # -- properties --------------------------------------------------------
    @property
    def bits(self):
        return self._bits

    @property
    def bitmap_mtx(self):
        return self._bitmap_mtx

    @property
    def Nbits(self):
        return int(np.log2(self._M))

    # -- modulate / demodulate --------------------------------------------
    def modulate(self, data):
        """Bits -> symbols with this object's mapping (reference signals.py:891-905)."""
        return jnp.asarray(self._modulate(data, self._encoding, np.asarray(self._coded_symbols),
                                          dtype=self.dtype))

    def demodulate(self, symbols):
        """Symbols -> bits (reference signals.py:907-930)."""
        symbols_arr = symbols.samples if isinstance(symbols, Signal) else jnp.asarray(symbols)
        if np.issubdtype(np.asarray(symbols_arr).dtype, np.integer):
            return self._demodulate_idx(np.asarray(symbols_arr), self._encoding)
        idx = decision_idx(symbols_arr, self._coded_symbols)
        return self._demodulate_idx(np.asarray(idx), self._encoding)

    # -- bit-level metrics -------------------------------------------------
    def cal_ber(self, signal_rx=None, synced=False, verbose=False):
        """Bit error rate per mode (reference signals.py:337-379)."""
        signal_rx = self._signal_present(signal_rx)
        symbols_tx, signal_rx = self._sync_and_adjust(self.symbols, signal_rx, synced)
        bits_demod = self.demodulate(signal_rx)
        tx_synced = self.demodulate(symbols_tx)
        errs = tx_synced ^ bits_demod
        ber = np.count_nonzero(errs, axis=-1) / bits_demod.shape[1]
        if verbose:
            return ber, errs, tx_synced
        return ber

    def cal_gmi(self, signal_rx=None, synced=False, snr=None, llr_minmax=False):
        """Generalised mutual information per mode (reference signals.py:458-507)."""
        signal_rx = self._signal_present(signal_rx)
        nmodes = signal_rx.shape[0]
        tx, rx = self._sync_and_adjust(self.symbols, signal_rx, synced)
        if snr is None:
            snr = self.est_snr(rx, synced=True, symbols_tx=tx)
        else:
            snr = np.atleast_1d(snr)
            snr = (np.ones(nmodes) * 10 ** (snr / 10) if snr.size != nmodes
                   else 10 ** (snr / 10))
            snr = jnp.asarray(snr)
        bits = np.asarray(self.demodulate(tx)).astype(int).reshape(nmodes, -1, self.Nbits)
        demapper = soft_l_value_demapper_minmax if llr_minmax else soft_l_value_demapper
        gmi_per_bit = np.zeros((nmodes, self.Nbits))
        for mode in range(nmodes):
            l_values = demapper(rx[mode], snr[mode], self._bitmap_mtx)
            gmi_per_bit[mode] = 1 - np.mean(
                np.log2(1 + np.exp(((-1.) ** bits[mode]) * np.asarray(l_values, dtype=np.float64))), axis=0)
        gmi = np.sum(gmi_per_bit, axis=-1)
        return gmi, gmi_per_bit

    def cal_mi(self, signal_rx=None, synced=False, snr=None, fast=True):
        """Mutual information per mode (reference signals.py:509-547)."""
        signal_rx = self._signal_present(signal_rx)
        nmodes = signal_rx.shape[0]
        tx, rx = self._sync_and_adjust(self.symbols, signal_rx, synced)
        if snr is None:
            snr = self.est_snr(rx, synced=True, symbols_tx=tx)
            N0 = 1 / np.asarray(snr)
        else:
            snr = np.atleast_1d(snr)
            N0 = (np.ones(nmodes) * 10 ** (-snr / 10) if snr.size != nmodes
                  else 10 ** (-snr / 10))
        mi = np.zeros(nmodes)
        for mode in range(nmodes):
            mi[mode] = float(_core_cal_mi(rx[mode], tx[mode], self._coded_symbols,
                                          float(N0[mode]), fast))
        return mi


@_sigclass
class SignalPSKGrayCoded(SignalQAMGrayCoded):
    """Gray-coded M-PSK signal (reference signals.py:932-946)."""

    @classmethod
    def _generate_mapping(cls, M, scale, dtype=DEFAULT_DTYPE):
        Nbits = int(np.log2(M))
        symbols = theory.cal_symbols_psk(M).astype(dtype)
        graycode = np.asarray([v ^ (v >> 1) for v in range(M)])
        u = np.zeros_like(graycode)
        u[graycode] = np.arange(u.size)
        coded_symbols = symbols[u]
        encoding = np.zeros((graycode.size, Nbits), bool)
        for i in range(graycode.size):
            encoding[i] = ((i & (1 << np.arange(Nbits))) > 0)[::-1]
        bitmap_mtx = generate_bitmapping_mtx(
            coded_symbols, cls._demodulate_idx(np.arange(graycode.size), encoding), M, dtype=dtype)
        return coded_symbols, graycode, encoding, bitmap_mtx


@_sigclass
class QPSKfromBERT(SignalQAMGrayCoded):
    """QPSK built from BERT-style delayed PRBS I/Q ports (reference signals.py:950-1002)."""

    def __init__(self, N, nmodes=1, fb=1, prbsorders=((15,), (15,)), prbsshifts=(0, 0),
                 prbsinvert=(False, False), dtype=DEFAULT_DTYPE):
        M = 4
        scale = np.sqrt(theory.cal_scaling_factor_qam(M))
        coded_symbols, graycode, encoding, bitmap_mtx = self._generate_mapping(M, scale, dtype=dtype)
        Nbits = int(N * np.log2(M))
        bitsI = np.roll(np.asarray(PRBSBits(N, nmodes=nmodes, order=prbsorders[0])), prbsshifts[0], axis=1)
        bitsQ = np.roll(np.asarray(PRBSBits(N, nmodes=nmodes, order=prbsorders[1])), prbsshifts[1], axis=1)
        if prbsinvert[0]:
            bitsI = ~bitsI
        if prbsinvert[1]:
            bitsQ = ~bitsQ
        bits = np.zeros((nmodes, Nbits), dtype=bool)
        bits[:, ::2] = bitsI
        bits[:, 1::2] = bitsQ
        self.samples = jnp.asarray(self._modulate(bits, encoding, coded_symbols, dtype=dtype))
        self._symbols = self.samples
        self._coded_symbols = jnp.asarray(coded_symbols)
        self._bitmap_mtx = jnp.asarray(bitmap_mtx)
        self._M = M
        self._fb = fb
        self._fs = fb
        self._code = np.asarray(graycode)
        self._encoding = np.asarray(encoding)
        self._bits = bits


@_sigclass
class SymbolOnlySignal(Signal):
    """Signal over an arbitrary alphabet without a bit mapping (reference signals.py:1004-1140)."""

    _leaf_fields = ("samples", "_symbols", "_coded_symbols")
    _aux_fields = ("_fb", "_fs", "_M")

    def __init__(self, M, N, symbols, nmodes=1, fb=1, dtype=None, seed=None):
        symbols = np.asarray(symbols)
        coded_symbols = symbols if dtype is None else symbols.astype(dtype)
        rng = np.random.RandomState(seed)
        samples = rng.choice(coded_symbols, (nmodes, N))
        self.samples = jnp.asarray(samples)
        self._symbols = self.samples
        self._coded_symbols = jnp.asarray(coded_symbols)
        self._M = M
        self._fb = fb
        self._fs = fb

    @classmethod
    def from_symbol_array(cls, symbs, coded_symbols=None, fb=1):
        symbs = np.atleast_2d(np.asarray(symbs))
        if coded_symbols is None:
            coded_symbols = np.unique(symbs).flatten()
        det, _, _ = _core_make_decision(jnp.asarray(symbs), jnp.asarray(coded_symbols))
        obj = object.__new__(cls)
        obj.samples = jnp.asarray(det)
        obj._symbols = obj.samples
        obj._coded_symbols = jnp.asarray(coded_symbols)
        obj._M = np.asarray(coded_symbols).size
        obj._fb = fb
        obj._fs = fb
        return obj

    def cal_ber(self, *args, **kwargs):
        raise NotImplementedError("SymbolOnlySignal does not have bits; BER not possible")

    def cal_gmi(self, *args, **kwargs):
        raise NotImplementedError("SymbolOnlySignal does not have bits; GMI not possible")

    def demodulate(self, *args, **kwargs):
        raise NotImplementedError("SymbolOnlySignal does not have bits")

    def modulate(self, *args, **kwargs):
        raise NotImplementedError("SymbolOnlySignal does not have bits")


@_sigclass
class ResampledQAM(SignalQAMGrayCoded):
    """QAM signal generated directly at a different sampling rate (reference signals.py:1142-1178)."""

    def __init__(self, M, N, fb=1, fs=1, resamplekwargs={"beta": 0.1}, **kwargs):
        super().__init__(M, N, fb=fb, **kwargs)
        if not np.isclose(fs / fb, 1):
            from qampy_tpu.core import resample as _resample
            new = _resample.rrcos_resample(self.samples, fb, fs, Ts=1 / fb, **resamplekwargs)
            self.samples = jnp.asarray(new, dtype=self._symbols.dtype)
        self._fs = fs

    @classmethod
    def from_symbol_array(cls, array, fs, **kwargs):
        out = array.resample(fs, **kwargs) if isinstance(array, Signal) else None
        if out is None:
            raise ValueError("from_symbol_array requires a Signal object")
        return out


# ---------------------------------------------------------------------------
# time-domain hybrid QAM
# ---------------------------------------------------------------------------

@_sigclass
class TDHQAMSymbols(Signal):
    """Time-domain hybrid QAM interleaving two QAM orders (reference signals.py:1182-1427)."""

    _leaf_fields = ("samples", "_symbols", "_coded_symbols")
    _aux_fields = ("_fb", "_fs", "_M", "_fr", "_powratio", "_power_method")

    def __init__(self, M, N, fr=0.5, power_method="dist",
                 M1class=SignalQAMGrayCoded, M2class=SignalQAMGrayCoded, **kwargs):
        M1, M2 = M
        f_M, f_M1, f_M2 = self._cal_fractions(fr)
        frms = N // f_M
        if N % f_M > 0:
            N = f_M * frms
            warnings.warn("overall pattern not divisible by frame count, truncating to %d symbols" % N)
        syms1 = M1class(M1, frms * f_M1, **kwargs)
        syms2 = M2class(M2, frms * f_M2, **kwargs)
        nmodes = syms1.shape[0]
        scale = self.calculate_power_ratio(np.asarray(syms1.coded_symbols),
                                           np.asarray(syms2.coded_symbols), power_method)
        s2 = syms2.samples / np.sqrt(scale)
        out = np.zeros((nmodes, N), dtype=np.asarray(syms1.samples).dtype)
        idx, idx1, idx2 = self._cal_symbol_idx(N, f_M, f_M1)
        out[:, idx1] = np.asarray(syms1.samples)
        out[:, idx2] = np.asarray(s2)
        self.samples = jnp.asarray(out)
        self._symbols = self.samples
        self._coded_symbols = None
        self._symbols_M1 = syms1
        self._symbols_M2 = syms2
        self._powratio = scale
        self._fr = fr
        self._fb = syms1.fb
        self._fs = syms1.fb
        self._M = (M1, M2)
        self._power_method = power_method

    def replace(self, **kwargs):
        obj = super().replace(**kwargs)
        object.__setattr__(obj, "_symbols_M1", getattr(self, "_symbols_M1", None))
        object.__setattr__(obj, "_symbols_M2", getattr(self, "_symbols_M2", None))
        return obj

    @staticmethod
    def _cal_fractions(fr):
        ratn = fractions.Fraction(fr).limit_denominator()
        f_M2 = ratn.numerator
        f_M = ratn.denominator
        return f_M, f_M - f_M2, f_M2

    @staticmethod
    def _cal_symbol_idx(N, f_M, f_M1):
        idx = np.arange(N)
        return idx, idx % f_M < f_M1, idx % f_M >= f_M1

    @staticmethod
    def calculate_power_ratio(M1symbols, M2symbols, method="dist"):
        """Power ratio spacing constellation points equidistantly (reference signals.py:1368-1394)."""
        if method != "dist":
            raise NotImplementedError("Only 'dist' method is currently implemented")
        d1 = np.min(abs(np.diff(np.unique(M1symbols))))
        d2 = np.min(abs(np.diff(np.unique(M2symbols))))
        return (d2 / d1) ** 2

    @property
    def powratio(self):
        return self._powratio

    @property
    def fr(self):
        return self._fr

    @property
    def f_M(self):
        return self._cal_fractions(self._fr)[0]

    @property
    def f_M1(self):
        return self._cal_fractions(self._fr)[1]

    @property
    def f_M2(self):
        return self._cal_fractions(self._fr)[2]

    @property
    def symbols_M1(self):
        return self._symbols_M1

    @property
    def symbols_M2(self):
        return self._symbols_M2

    @classmethod
    def from_symbol_arrays(cls, syms_M1, syms_M2, fr, power_method="dist"):
        """Build a TDHQAM signal by interleaving two existing symbol signals.

        Parity: reference signals.py:1318-1366. ``fr`` is the fraction of M2
        symbols over the total frame length; M2 is rescaled so constellation
        points of both orders are equidistant ('dist' method).
        """
        assert syms_M1.ndim == 2 and syms_M2.ndim == 2, "input needs to have two dimensions"
        assert syms_M1.shape[0] == syms_M2.shape[0], "Number of modes must be the same"
        f_M, f_M1, f_M2 = cls._cal_fractions(fr)
        scale = cls.calculate_power_ratio(np.asarray(syms_M1.coded_symbols),
                                          np.asarray(syms_M2.coded_symbols), power_method)
        s2 = np.asarray(syms_M2.samples) / np.sqrt(scale)
        s1 = np.asarray(syms_M1.samples)
        N1, N2 = s1.shape[1], s2.shape[1]
        N = N1 + N2
        nframes = N // f_M
        assert N1 == nframes * f_M1 and N2 == nframes * f_M2, \
            "symbol array lengths do not form whole TDHQAM frames for fr=%s" % fr
        out = np.zeros((s1.shape[0], N), dtype=s1.dtype)
        _, idx1, idx2 = cls._cal_symbol_idx(N, f_M, f_M1)
        out[:, idx1] = s1
        out[:, idx2] = s2
        obj = object.__new__(cls)
        obj.samples = jnp.asarray(out)
        obj._symbols = obj.samples
        obj._coded_symbols = None
        obj._symbols_M1 = syms_M1
        obj._symbols_M2 = syms_M2
        obj._powratio = scale
        obj._fr = fr
        obj._fb = syms_M1.fb
        obj._fs = syms_M1.fb
        obj._M = (syms_M1.M, syms_M2.M)
        obj._power_method = power_method
        return obj

    def _divide_signal_frame(self, signal):
        """Split a received TDHQAM signal back into its M1/M2 streams.

        Parity: reference signals.py:1396-1421 ('dist' power method): find
        the frame alignment by maximising the M-larger subframe power, then
        de-interleave.
        """
        signal = jnp.atleast_2d(jnp.asarray(signal))
        f_M, f_M1, f_M2 = self._cal_fractions(self._fr)
        N = signal.shape[1]
        idx = np.arange(N)
        idx1 = idx[idx % f_M < f_M1]
        idx2 = idx[idx % f_M >= f_M1]
        idx_m = idx1 if self.M[0] > self.M[1] else idx2
        if self._power_method != "dist":
            raise NotImplementedError("currently only 'dist' method is implemented")
        s1_rows, s2_rows = [], []
        sig_np = np.asarray(signal)
        for i in range(sig_np.shape[0]):
            pows = [np.mean(np.abs(sig_np[i, (idx_m + j) % idx.max()]))
                    for j in range(f_M)]
            imax = int(np.argmax(pows))
            s1_rows.append(sig_np[i, (idx1 + imax) % idx.max()])
            s2_rows.append(sig_np[i, (idx2 + imax) % idx.max()])
        syms1 = np.stack(s1_rows)
        syms2 = np.stack(s2_rows)
        return (self._symbols_M1.from_symbol_array(syms1, fb=self.fb, M=self.M[0]),
                self._symbols_M2.from_symbol_array(syms2, fb=self.fb, M=self.M[1]))


# ---------------------------------------------------------------------------
# pilot signals
# ---------------------------------------------------------------------------

@_sigclass
class SignalWithPilots(Signal):
    """Pilot-framed signal: pilot sequence + periodic phase pilots + payload.

    Parity: reference signals.py:1430-1952. Frame layout math is ported
    verbatim (``_cal_pilot_idx``, signals.py:1532-1545). The payload and
    pilots are full signal objects, so frame-level metrics delegate to them.
    """

    # the payload/pilot sub-signals are pytree children: a tree_map (jit,
    # device_put, the IO host conversion) must rebuild them too, or the
    # round-tripped object loses its symbols/pilots metadata
    _leaf_fields = ("samples", "_symbols_obj", "_pilots_obj")
    _aux_fields = ("_fb", "_fs", "_frame_len", "_pilot_seq_len", "_pilot_ins_rat",
                   "_pilot_scale", "_idx_dat", "_shiftfctrs", "_synctaps", "_foe")

    def __init__(self, M, frame_len, pilot_seq_len, pilot_ins_rat, nframes=1,
                 pilot_scale=1, Mpilots=4, dataclass=SignalQAMGrayCoded, nmodes=1,
                 dtype=DEFAULT_DTYPE, **kwargs):
        idx, idx_dat, idx_pil = self._cal_pilot_idx(frame_len, pilot_seq_len, pilot_ins_rat)
        npil = int(np.count_nonzero(idx_pil))
        ndat = int(np.count_nonzero(idx_dat))
        pilots = SignalQAMGrayCoded(Mpilots, npil, nmodes=nmodes, dtype=dtype, **kwargs) * pilot_scale
        symbs = dataclass(M, ndat, nmodes=nmodes, dtype=dtype, **kwargs)
        out = np.empty((nmodes, frame_len), dtype=np.asarray(symbs.samples).dtype)
        out[:, idx_pil] = np.asarray(pilots.samples)
        out[:, idx_dat] = np.asarray(symbs.samples)
        out = np.tile(out, (1, nframes))
        self.samples = jnp.asarray(out)
        self._fb = kwargs.pop("fb", symbs.fb)
        self._fs = kwargs.pop("fs", symbs.fb)
        self._frame_len = frame_len
        self._pilot_seq_len = pilot_seq_len
        self._pilot_ins_rat = pilot_ins_rat
        self._symbols_obj = symbs
        self._pilots_obj = pilots
        self._idx_dat = idx_dat
        self._pilot_scale = pilot_scale
        self._shiftfctrs = None
        self._synctaps = None
        self._foe = None

    @classmethod
    def from_symbol_array(cls, payload, frame_len, pilot_seq_len, pilot_ins_rat,
                          pilots=None, pilot_idx=None, nframes=1, pilot_scale=1,
                          payload_is_frame=False, pilot_class=None,
                          pilot_kwargs={"M": 4}, payload_class=None,
                          payload_kwargs={}, **kwargs):
        """Build a pilot signal from an existing payload symbol array/object.

        Parity: reference signals.py:1548-1645 (the commonly used paths:
        generated or provided pilots, optional explicit pilot indices).
        """
        pilot_class = pilot_class or SignalQAMGrayCoded
        payload_class = payload_class or SignalQAMGrayCoded
        payload_arr = np.asarray(payload)
        nmodes, N = payload_arr.shape
        if pilot_idx is None:
            idx, idx_dat, idx_pil = cls._cal_pilot_idx(frame_len, pilot_seq_len, pilot_ins_rat)
        else:
            pidx = np.zeros(frame_len, dtype=bool)
            pidx[np.asarray(pilot_idx)] = True
            idx_pil = pidx
            idx_dat = ~pidx
        Ndat = int(np.count_nonzero(idx_dat))
        assert Ndat <= N, "data frame is too short for the given frame length"
        if "M" in kwargs:
            assert "M" not in payload_kwargs, "M can not be given for both payload and signal"
            payload_kwargs = dict(payload_kwargs, M=kwargs.pop("M"))
        if payload_is_frame:
            pilots = pilot_class.from_symbol_array(payload_arr[:, idx_pil], **pilot_kwargs)
            payload = payload_class.from_symbol_array(payload_arr[:, idx_dat], **payload_kwargs)
            payload_arr = np.asarray(payload)
        if pilots is None:
            pilots = pilot_class(pilot_kwargs["M"], int(np.count_nonzero(idx_pil)),
                                 nmodes=nmodes, dtype=payload_arr.dtype) / np.sqrt(pilot_scale)
        else:
            parr = np.atleast_2d(np.asarray(pilots))
            if parr.shape[0] == 1 and nmodes > 1:
                parr = np.vstack([parr] * nmodes)
            if not isinstance(pilots, Signal):
                pilots = pilot_class.from_symbol_array(parr, **pilot_kwargs)
            elif parr.shape[0] != np.asarray(pilots).shape[0]:
                pilots = pilots.replace(samples=jnp.asarray(parr))
        if not isinstance(payload, Signal):
            payload = payload_class.from_symbol_array(payload_arr, **payload_kwargs)
        out = np.empty((nmodes, frame_len), dtype=payload_arr.dtype)
        out[:, idx_pil] = np.asarray(pilots.samples)[:, :int(np.count_nonzero(idx_pil))]
        out[:, idx_dat] = payload_arr[:, :Ndat]
        out = np.tile(out, (1, nframes))
        obj = object.__new__(cls)
        obj.samples = jnp.asarray(out)
        obj._fb = payload.fb
        obj._fs = payload.fb
        obj._pilot_scale = pilot_scale
        obj._frame_len = frame_len
        obj._pilot_seq_len = pilot_seq_len
        obj._pilot_ins_rat = pilot_ins_rat
        trunc = jnp.asarray(payload_arr[:, :Ndat])
        obj._symbols_obj = payload.replace(samples=trunc, _symbols=trunc)
        obj._pilots_obj = pilots
        obj._idx_dat = idx_dat
        obj._shiftfctrs = None
        obj._synctaps = None
        obj._foe = None
        return obj

    @staticmethod
    def _cal_pilot_idx(frame_len, pilot_seq_len, pilot_ins_rat):
        """Frame layout (ported verbatim from reference signals.py:1532-1545)."""
        idx = np.arange(frame_len)
        idx_pil_seq = idx < pilot_seq_len
        if pilot_ins_rat == 0 or pilot_ins_rat is None:
            idx_pil = idx_pil_seq
        else:
            if (frame_len - pilot_seq_len) % pilot_ins_rat != 0:
                raise ValueError("Frame without pilot sequence divided by pilot rate needs to be an integer")
            idx_ph_pil = ((idx - pilot_seq_len) % pilot_ins_rat != 0) & (idx - pilot_seq_len > 0)
            idx_pil = ~idx_ph_pil
        idx_dat = ~idx_pil
        return idx, idx_dat, idx_pil

    # pilots/symbols objects survive replace() because they live outside the
    # pytree leaves; carry them across manually.
    def replace(self, **kwargs):
        obj = super().replace(**kwargs)
        object.__setattr__(obj, "_symbols_obj", getattr(self, "_symbols_obj", None))
        object.__setattr__(obj, "_pilots_obj", getattr(self, "_pilots_obj", None))
        return obj

    # -- properties --------------------------------------------------------
    @property
    def M(self):
        return self._symbols_obj.M

    @property
    def Mpilots(self):
        return self._pilots_obj.M

    @property
    def pilot_scale(self):
        return self._pilot_scale

    @property
    def pilots(self):
        return self._pilots_obj.samples

    @property
    def pilot_seq(self):
        return self._pilots_obj.samples[:, :self._pilot_seq_len]

    @property
    def ph_pilots(self):
        return self._pilots_obj.samples[:, self._pilot_seq_len:]

    @property
    def symbols(self):
        return self._symbols_obj.samples

    @property
    def coded_symbols(self):
        return self._symbols_obj.coded_symbols

    @property
    def bitmap_mtx(self):
        return self._symbols_obj.bitmap_mtx

    @property
    def Nbits(self):
        return self._symbols_obj.Nbits

    @property
    def frame_len(self):
        return self._frame_len

    @property
    def pilot_seq_len(self):
        return self._pilot_seq_len

    @property
    def pilot_ins_rat(self):
        return self._pilot_ins_rat

    @property
    def nframes(self):
        return self.shape[-1] // (self.os * self._frame_len)

    @property
    def idx_payload(self):
        return np.tile(self._idx_dat, self.nframes)[: self.shape[-1]]

    @property
    def idx_pilots(self):
        return np.tile(~self._idx_dat, self.nframes)[: self.shape[-1]]

    @property
    def idx_pil(self):
        return ~self._idx_dat

    @property
    def shiftfctrs(self):
        return self._shiftfctrs

    @shiftfctrs.setter
    def shiftfctrs(self, value):
        self._shiftfctrs = value

    @property
    def synctaps(self):
        return self._synctaps

    @synctaps.setter
    def synctaps(self, value):
        self._synctaps = value

    # -- frame operations --------------------------------------------------
    def sync2frame(self, returntaps=False, **kwargs):
        """Find the frame start offsets and align modes (reference signals.py:1709-1744)."""
        from qampy_tpu.ops import pilots as pilotbased_receiver
        eqargs = {"adaptive_stepsize": True, "Niter": 10, "method": "cma", "Ntaps": 17, "mu": 5e-3}
        eqargs.update(kwargs)
        mu = eqargs.pop("mu")
        Ntaps = eqargs.pop("Ntaps")
        shift_factors, coarse_foe, mode_alignment, wx1, sync_bool = pilotbased_receiver.frame_sync(
            np.asarray(self.samples), np.asarray(self.pilot_seq), self.os, mu=mu, Ntaps=Ntaps,
            frame_len=self.frame_len, M_pilot=self.Mpilots, **eqargs)
        self.samples = self.samples[np.asarray(mode_alignment)]
        shift_factors = np.asarray(shift_factors)
        shift_factors[shift_factors < 0] += self.frame_len * self.os
        self._shiftfctrs = shift_factors[np.asarray(mode_alignment)]
        self._synctaps = Ntaps
        self._foe = coarse_foe
        if returntaps:
            return wx1, sync_bool
        return sync_bool

    def corr_foe(self, additional_foe=0):
        """Apply the coarse frequency-offset estimate (reference signals.py:1747-1750)."""
        from qampy_tpu.ops import phase as _phase
        foe_off = np.ones(np.asarray(self._foe).shape) * (np.mean(self._foe) + additional_foe)
        self._foe = np.zeros_like(foe_off)
        self.samples = jnp.asarray(_phase.comp_freq_offset(self.samples, foe_off, self.os))

    def _frame_idx(self, frames=None):
        if frames is None:
            frames = np.arange(self.nframes)
            nframes = self.nframes
        else:
            frames = np.atleast_1d(frames)
            nframes = int(np.max(frames)) + 1
            assert nframes <= max(self.nframes, 1), \
                "Signal object only contains {} frames".format(self.nframes)
        return frames, nframes

    def get_data(self, frames=None):
        """Extract the data payload (pilots removed) as a payload signal object.

        Parity: reference signals.py:1753-1781; requires symbol-rate samples
        aligned to the frame start.
        """
        frames, nframes = self._frame_idx(frames)
        if nframes < 1:
            idx = self._idx_dat[: self.shape[-1]]
        else:
            idx = np.zeros(self.frame_len * nframes, dtype=bool)
            for i in frames:
                idx[i * self.frame_len:(i + 1) * self.frame_len] = self._idx_dat
        return self._symbols_obj.replace(samples=self.samples[:, :idx.shape[0]][:, idx])

    def extract_pilots(self, frames=None):
        """Extract the received pilots as a pilot signal object (reference signals.py:1783-1804)."""
        frames, nframes = self._frame_idx(frames)
        idx = np.hstack([np.nonzero(~self._idx_dat)[0] + i * self._frame_len for i in frames])
        return self._pilots_obj.replace(samples=self.samples[:, idx])

    # -- frame-aware metrics (reference signals.py:1809-1947) --------------
    def cal_ser(self, frames=None, synced=True, signal_rx=None, verbose=False):
        if signal_rx is None:
            signal_rx = self.get_data(frames)
        return signal_rx.cal_ser(synced=synced, verbose=verbose)

    def cal_ber(self, frames=None, synced=True, signal_rx=None, verbose=False):
        if signal_rx is None:
            signal_rx = self.get_data(frames)
        return signal_rx.cal_ber(synced=synced, verbose=verbose)

    def cal_evm(self, frames=None, synced=True, signal_rx=None, blind=False):
        if signal_rx is None:
            signal_rx = self.get_data(frames)
        return signal_rx.cal_evm(synced=synced, blind=blind)

    def cal_gmi(self, frames=None, synced=True, snr=None, signal_rx=None, use_pilot_snr=False):
        assert not (use_pilot_snr and snr is not None), \
            "use_pilot_snr must not be True if snr is not None"
        if signal_rx is None:
            signal_rx = self.get_data(frames)
        if use_pilot_snr:
            snr = self.est_snr(use_pilots=True)
        return signal_rx.cal_gmi(synced=synced, snr=snr)

    def est_snr(self, frames=None, synced=True, signal_rx=None, symbols_tx=None, use_pilots=False):
        if signal_rx is None:
            if use_pilots:
                signal_rx = self.extract_pilots(frames=frames)
            else:
                signal_rx = self.get_data(frames=frames)
        return signal_rx.est_snr(synced=synced, symbols_tx=symbols_tx)


# register the base class too (usable directly for raw waveforms)
_sigclass(Signal)

# reference-name alias: the reference's ndarray-subclass base is SignalBase
# (qampy/signals.py:144); here the same role is played by the pytree Signal
SignalBase = Signal

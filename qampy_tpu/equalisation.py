"""Signal-object API for adaptive equalisation.

Parity: qampy/equalisation.py in the reference — thin adapters pulling
``sig.os``/``sig.M``/symbols off the signal object, calling the ops layer and
re-wrapping results attribute-preserving.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from qampy_tpu.ops import equaliser as core_equalisation
from qampy_tpu.ops import pilots as pilotbased_receiver
from qampy_tpu.ops.equaliser import (
    TRAINING_FCTS, NONDECISION_BASED, DECISION_BASED, REAL_VALUED, DATA_AIDED, CDcomp,
)
from qampy_tpu import phaserec
from qampy_tpu.signals import Signal


def _apply_to_pilotsignal(sig, wxy, frames):
    """Frame-sliced filter application for pilot signals (reference qampy/equalisation.py:42-87)."""
    wxy = np.asarray(wxy)
    Ntaps = wxy.shape[-1]
    shiftfctrs = np.asarray(sig.shiftfctrs)
    if Ntaps != sig.synctaps:
        shiftfctrs = shiftfctrs - (Ntaps - sig.synctaps) // 2
    if np.min(shiftfctrs) < 0:
        shiftfctrs = shiftfctrs + sig.os * sig.frame_len
    frames = list(frames)
    assert shiftfctrs.max() + sig.os * sig.frame_len * (max(frames) + 1) < sig.shape[-1] - (Ntaps - 1), \
        "Trying to equalise frame {}, but signal is not long enough".format(max(frames))
    samples = sig.samples

    def eq_slice(idx_0, idx_end, modes=None):
        return core_equalisation.apply_filter(samples[:, idx_0:idx_end], sig.os, jnp.asarray(wxy),
                                              modes=modes)

    if np.all(np.diff(frames) == 1):
        nframes = frames[-1] - frames[0] + 1
        if np.unique(shiftfctrs).shape[0] > 1:
            modes = np.arange(wxy.shape[0]).reshape(-1, sig.shape[0]).T
            eq_mode_sig = []
            for mode in modes:
                idx_0 = int(shiftfctrs[mode[0]]) + frames[0] * sig.os * sig.frame_len
                idx_end = idx_0 + nframes * sig.frame_len * sig.os + Ntaps - 1
                eq_mode_sig.append(eq_slice(idx_0, idx_end, modes=mode))
            out = jnp.squeeze(jnp.asarray(jnp.stack(eq_mode_sig)))
        else:
            idx_0 = int(shiftfctrs[0]) + frames[0] * sig.os * sig.frame_len
            idx_end = idx_0 + nframes * sig.frame_len * sig.os + Ntaps - 1
            out = eq_slice(idx_0, idx_end)
    else:
        all_mode_sig = []
        for frame in frames:
            if np.unique(shiftfctrs).shape[0] > 1:
                modes = np.arange(wxy.shape[0]).reshape(-1, sig.shape[0]).T
                eq_mode_sig = []
                for mode in modes:
                    idx_0 = int(shiftfctrs[mode[0]]) + frame * sig.os * sig.frame_len
                    idx_end = idx_0 + sig.frame_len * sig.os + Ntaps - 1
                    eq_mode_sig.append(eq_slice(idx_0, idx_end, modes=mode))
                all_mode_sig.append(jnp.squeeze(jnp.stack(eq_mode_sig)))
            else:
                idx_0 = int(shiftfctrs[0]) + frame * sig.os * sig.frame_len
                idx_end = idx_0 + sig.frame_len * sig.os + Ntaps - 1
                all_mode_sig.append(eq_slice(idx_0, idx_end))
        out = jnp.concatenate(all_mode_sig, axis=-1)
    return sig.recreate_from_np_array(out, fs=sig.fb)


def apply_filter(sig, wxy, method=None, frames=[0]):
    """Apply equaliser taps to a signal object (reference qampy/equalisation.py:89-119)."""
    if hasattr(sig, "pilots") and frames:
        return _apply_to_pilotsignal(sig, wxy, frames)
    sig_out = core_equalisation.apply_filter(sig.samples, sig.os, wxy)
    return sig.recreate_from_np_array(sig_out, fs=sig.fb)


def _get_symbols(sig, methods):
    methods = (methods,) if isinstance(methods, str) else methods
    for method in methods:
        if method in DATA_AIDED:
            return np.asarray(sig.symbols)
    try:
        return np.asarray(sig.coded_symbols)
    except AttributeError:
        return None


def equalise_signal(sig, mu, wxy=None, Ntaps=None, TrSyms=None, Niter=1,
                    method="mcma", adaptive_stepsize=False, symbols=None, modes=None,
                    apply=False, **kwargs):
    """Adaptive equalisation on a signal object (reference qampy/equalisation.py:122-192)."""
    if symbols is None:
        symbols = _get_symbols(sig, method)
    res = core_equalisation.equalise_signal(
        sig.samples, sig.os, mu, sig.M, wxy=wxy, Ntaps=Ntaps, TrSyms=TrSyms,
        Niter=Niter, method=method, adaptive_stepsize=adaptive_stepsize,
        symbols=symbols, modes=modes, apply=apply, **kwargs)
    if apply:
        sig_out, wxy, err = res
        return sig.recreate_from_np_array(sig_out, fs=sig.fb), wxy, err
    return res


def dual_mode_equalisation(sig, mu, Ntaps, TrSyms=(None, None), Niter=(1, 1),
                           methods=("mcma", "sbd"), adaptive_stepsize=(False, False),
                           symbols=None, modes=None, apply=True, **kwargs):
    """Two-stage equalisation on a signal object (reference qampy/equalisation.py:194-264)."""
    if symbols is None:
        symbols = _get_symbols(sig, methods)
    res = core_equalisation.dual_mode_equalisation(
        sig.samples, sig.os, mu, sig.M, Ntaps=Ntaps, TrSyms=TrSyms, Niter=Niter,
        methods=methods, adaptive_stepsize=adaptive_stepsize, symbols=symbols,
        modes=modes, apply=apply, **kwargs)
    if apply:
        sig_out, wx, err = res
        return sig.recreate_from_np_array(sig_out, fs=sig.fb), wx, err
    return res


def pilot_equaliser(signal, mu, Ntaps, apply=True, foe_comp=True, wxinit=None,
                    frame=0, verbose=False, **eqkwargs):
    """Pilot-based equalisation of a single frame (reference qampy/equalisation.py:268-338)."""
    if signal.shiftfctrs is None:
        raise ValueError("Signal must be synced to the frame first (run sync2frame)")
    eq_shiftfctrs = np.array(signal.shiftfctrs, dtype=int)
    mu = np.atleast_1d(mu)
    if len(mu) == 1:
        mu = np.repeat(mu, 2)
    if wxinit is not None:
        Ntaps = np.asarray(wxinit).shape[-1]
    if (abs(Ntaps - signal.synctaps) % 2) != 0:
        raise ValueError("Tap difference needs to be an integer of the oversampling")
    elif Ntaps != signal.synctaps:
        eq_shiftfctrs = eq_shiftfctrs - (Ntaps - signal.synctaps) // 2 + signal.os * signal.frame_len * frame
    assert signal.shape[-1] - eq_shiftfctrs.max() > signal.frame_len * signal.os, \
        "You are trying to equalise an incomplete frame which does not work"
    taps_all, foe_all = pilotbased_receiver.equalize_pilot_sequence(
        signal.samples, signal.pilot_seq, eq_shiftfctrs, os=signal.os, mu=mu,
        foe_comp=foe_comp, Ntaps=Ntaps, wxinit=wxinit, **eqkwargs)
    if foe_comp:
        out_sig = phaserec.comp_freq_offset(signal, foe_all)
    else:
        out_sig = signal
    if apply:
        eq_mode_sig = apply_filter(out_sig, taps_all, frames=[frame])
        if verbose:
            return taps_all, eq_mode_sig, foe_all, (Ntaps, signal.synctaps)
        return taps_all, eq_mode_sig
    if verbose:
        return taps_all, foe_all, (Ntaps, signal.synctaps)
    return taps_all


def pilot_equaliser_nframes(signal, mu, Ntaps, apply=True, foe_comp=True, frames=[0],
                            wxinit=None, verbose=True, **eqkwargs):
    """Pilot-based equalisation over multiple frames (reference qampy/equalisation.py:340-397)."""
    if signal.shiftfctrs is None:
        raise ValueError("Signal must be synced to the frame first (run sync2frame)")
    if frames is None:
        nframes = (signal.shape[-1] - np.max(signal.shiftfctrs)) // (signal.os * signal.frame_len)
        frames = np.arange(nframes)
    frames = np.atleast_1d(frames)
    nframes = np.max(frames)
    assert signal.shape[-1] - (np.max(signal.shiftfctrs) + nframes * signal.frame_len * signal.os) \
        > signal.frame_len * signal.os, "The last frame must be complete for equalisation"
    if wxinit is not None:
        Ntaps = np.asarray(wxinit).shape[-1]
    rets = []
    for i in frames:
        ret = pilot_equaliser(signal, mu, Ntaps, apply=apply, foe_comp=foe_comp,
                              wxinit=wxinit, verbose=verbose, frame=i, **eqkwargs)
        if i == 0:
            wxinit = ret[0]
        rets.append(ret)
    out = tuple(zip(*rets))
    if apply:
        sout = jnp.concatenate([s.samples for s in out[1]], axis=-1)
        sout = signal.recreate_from_np_array(sout, fs=signal.fb)
        return out[0], sout, out[2:]
    return out

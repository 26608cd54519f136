"""Signal-object API for carrier and phase recovery.

Parity: qampy/phaserec.py in the reference.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from qampy_tpu.ops import phase as core_phaserecovery
from qampy_tpu.ops import pilots as core_pilotbased_receiver
from qampy_tpu.signals import Signal


def bps(E, Mtestangles, N, **kwargs):
    """Blind phase search (reference qampy/phaserec.py:62-92)."""
    out, ph = core_phaserecovery.bps(E.samples, Mtestangles, E.coded_symbols, N, **kwargs)
    return E.recreate_from_np_array(out), ph


def bps_twostage(E, Mtestangles, N, B=4, **kwargs):
    """Two-stage blind phase search (reference qampy/phaserec.py:24-60)."""
    out, ph = core_phaserecovery.bps_twostage(E.samples, Mtestangles, E.coded_symbols,
                                              N, B=B, **kwargs)
    return E.recreate_from_np_array(out), ph


def find_freq_offset(sig, average_over_modes=False, fft_size=4096):
    """Blind frequency-offset search (reference qampy/phaserec.py:94-116)."""
    return core_phaserecovery.find_freq_offset(sig.samples, sig.os,
                                               average_over_modes=average_over_modes,
                                               fft_size=fft_size)


def comp_freq_offset(sig, freq_offset):
    """Compensate a frequency offset (reference qampy/phaserec.py:118-136)."""
    arr = core_phaserecovery.comp_freq_offset(sig.samples, freq_offset, sig.os)
    return sig.recreate_from_np_array(arr)


def viterbiviterbi(E, N):
    """Viterbi-Viterbi phase recovery (reference qampy/phaserec.py:138-154)."""
    out, ph = core_phaserecovery.viterbiviterbi(E.samples, N, E.M)
    return E.recreate_from_np_array(out), ph


def phase_partition_16qam(E, Nblock):
    """QPSK-partitioning CPE for 16-QAM (reference core/phaserecovery.py:328-382)."""
    out, ph = core_phaserecovery.phase_partition_16qam(E.samples, Nblock)
    return E.recreate_from_np_array(out), ph


def pilot_cpe(signal, N=3, pilot_rat=1, max_blocks=None, nframes=1, use_seq=False):
    """Pilot-based carrier phase estimation (reference qampy/phaserec.py:156-192)."""
    if use_seq:
        seq_len = signal.pilot_seq_len
        idx = np.nonzero(np.asarray(signal.idx_pil))[0]
        pilots = signal.pilots
    else:
        seq_len = None
        idx = np.nonzero(np.asarray(signal.idx_pil))[0][signal.pilot_seq_len:]
        pilots = signal.ph_pilots
    out, phase_tr = core_pilotbased_receiver.pilot_based_cpe(
        signal.samples, pilots, idx, signal.frame_len, seq_len=seq_len,
        max_num_blocks=max_blocks, use_pilot_ratio=pilot_rat, num_average=N,
        nframes=nframes)
    return signal.recreate_from_np_array(out), phase_tr


def find_pilot_const_phase(rec_pilots, ref_pilots):
    """Constant phase offset between rx and tx pilots (reference qampy/phaserec.py:194-218)."""
    rec_pilots = jnp.atleast_2d(jnp.asarray(rec_pilots))
    ref_pilots = jnp.atleast_2d(jnp.asarray(ref_pilots))
    ph = jnp.unwrap(jnp.angle(jnp.conj(ref_pilots) * rec_pilots), axis=-1)
    return jnp.mean(ph, axis=-1, keepdims=True)


def correct_pilot_const_phase(signal, phase_offsets):
    """Remove a constant per-mode phase offset (reference qampy/phaserec.py:220-238)."""
    phase_offsets = jnp.asarray(phase_offsets)
    if isinstance(signal, Signal):
        return signal.replace(samples=signal.samples *
                              jnp.exp(-1j * phase_offsets).astype(signal.dtype))
    return jnp.asarray(signal) * jnp.exp(-1j * phase_offsets)

"""Pilot-frame TX-side helpers.

Parity: qampy/core/pilotbased_transmitter.py in the reference (:17-238),
which is bitrotted (imports a removed module) and superseded by
``SignalWithPilots``. The living functionality — building a pilot data frame
and running it through a TX impairment chain — is provided here on top of the
signal objects.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from qampy_tpu.signals import SignalWithPilots, SignalQAMGrayCoded, TDHQAMSymbols
from qampy_tpu.core import impairments as cimpairments


def gen_dataframe_with_phasepilots(M, nmodes, frame_len=2 ** 16, pilot_seq_len=8192,
                                   pilot_ins_ratio=32, **kwargs):
    """Generate a pilot data frame (QPSK pilot sequence + phase pilots).

    Equivalent of reference core/pilotbased_transmitter.py:17-68, built on
    SignalWithPilots.
    """
    return SignalWithPilots(M, frame_len, pilot_seq_len, pilot_ins_ratio,
                            nmodes=nmodes, Mpilots=4, **kwargs)


def gen_dataframe_without_phasepilots(M, nmodes, frame_len=2 ** 16,
                                      pilot_seq_len=8192, **kwargs):
    """Generate a pilot data frame with only the leading pilot sequence.

    Equivalent of reference core/pilotbased_transmitter.py:71-103.
    """
    return SignalWithPilots(M, frame_len, pilot_seq_len, 0, nmodes=nmodes,
                            Mpilots=4, **kwargs)


def gen_dataframe_with_phasepilots_hybridmodulation(M=(128, 256), mod_ratio=(1, 1),
                                                    npols=2, frame_len=2 ** 18,
                                                    pilot_seq_len=256,
                                                    pilot_ins_ratio=32, **kwargs):
    """Pilot data frame whose payload is time-domain hybrid QAM.

    Parity: reference core/pilotbased_transmitter.py:106-185, which is
    bitrotted (built on the removed ``modulation`` module with hard-coded
    normalisation constants). Rebuilt here: the payload interleaves the two
    QAM orders in the given ratio using ``TDHQAMSymbols`` ('dist'
    equidistant-constellation power scaling), framed by a QPSK pilot sequence
    and periodic phase pilots via ``SignalWithPilots.from_symbol_array``.
    """
    if len(M) != 2 or len(mod_ratio) != 2:
        raise ValueError("exactly two modulation formats/ratios are supported")
    if (frame_len - pilot_seq_len) % pilot_ins_ratio != 0:
        raise ValueError("Pilot insertion ratio not properly selected")
    _, idx_dat, _ = SignalWithPilots._cal_pilot_idx(frame_len, pilot_seq_len,
                                                    pilot_ins_ratio)
    Ndat = int(np.count_nonzero(idx_dat))
    fr = mod_ratio[1] / (mod_ratio[0] + mod_ratio[1])
    f_M = TDHQAMSymbols._cal_fractions(fr)[0]
    N_data = -(-Ndat // f_M) * f_M  # round UP to whole hybrid frames
    payload = TDHQAMSymbols((M[0], M[1]), N_data, fr=fr, nmodes=npols, **kwargs)
    return SignalWithPilots.from_symbol_array(
        payload, frame_len, pilot_seq_len, pilot_ins_ratio,
        pilot_kwargs={"M": 4}), payload


def sim_tx(frame, os, snr=None, modal_delay=None, freqoff=None, linewidth=None,
           rot_angle=None, beta=0.1, key=None):
    """Simulate a TX with frame shaping and basic impairments.

    Equivalent of reference core/pilotbased_transmitter.py:188-238: resample
    to os samples/symbol then apply SNR / modal delay / frequency offset /
    phase noise / polarisation rotation.
    """
    sig = frame.resample(frame.fb * os, beta=beta)
    arr = sig.samples
    if modal_delay is not None:
        arr = cimpairments.add_modal_delay(arr, modal_delay)
    if linewidth is not None:
        arr = cimpairments.apply_phase_noise(arr, linewidth, sig.fs, key=key)
    if freqoff is not None:
        arr = cimpairments.add_carrier_offset(arr, freqoff, sig.fs)
    if snr is not None:
        arr = cimpairments.change_snr(arr, snr, sig.fb, sig.fs, key=key)
    if rot_angle is not None:
        arr = cimpairments.rotate_field(arr, rot_angle)
    return sig.replace(samples=jnp.asarray(arr, dtype=sig.dtype))

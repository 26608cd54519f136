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

from qampy_tpu.signals import SignalWithPilots, SignalQAMGrayCoded
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

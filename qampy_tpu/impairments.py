"""Signal-object API for impairment simulation.

Parity: qampy/impairments.py in the reference — object-preserving wrappers
around qampy_tpu.core.impairments.
"""
from __future__ import annotations

import warnings

import numpy as np
import jax
import jax.numpy as jnp

from qampy_tpu.core import impairments as cimpairments
# module-namespace parity with reference qampy/impairments.py:20
from qampy_tpu.core.impairments import rotate_field, add_modal_delay as _core_add_modal_delay
from qampy_tpu.signals import Signal, SignalWithPilots


def _rewrap(sig, arr):
    if isinstance(sig, Signal):
        return sig.replace(samples=jnp.asarray(arr, dtype=sig.dtype))
    return arr


def _samples(sig):
    return sig.samples if isinstance(sig, Signal) else jnp.asarray(sig)


def add_awgn(sig, strgth, key=None):
    """Add AWGN of given standard deviation, object-preserving.

    Parity: reference qampy/impairments.py:20 re-exports the core
    ``add_awgn`` whose ndarray-subclass passthrough keeps the signal
    object; the pytree analogue rewraps explicitly (the notebook
    workloads call this on signal objects, e.g. "constant ASE noise
    model").
    """
    arr = cimpairments.add_awgn(_samples(sig), strgth, key=key)
    return _rewrap(sig, arr)


def apply_PMD(sig, theta, t_dgd):
    """Apply PMD (reference qampy/impairments.py:24-45)."""
    arr = cimpairments.apply_PMD_to_field(_samples(sig), theta, t_dgd, sig.fs)
    return _rewrap(sig, arr)


def apply_phase_noise(sig, df, key=None):
    """Apply laser phase noise (reference qampy/impairments.py:47-66)."""
    arr = cimpairments.apply_phase_noise(_samples(sig), df, sig.fs, key=key)
    return _rewrap(sig, arr)


def change_snr(sig, snr, key=None):
    """Set the signal SNR (reference qampy/impairments.py:68-84)."""
    arr = cimpairments.change_snr(_samples(sig), snr, sig.fb, sig.fs, key=key)
    return _rewrap(sig, arr)


def add_carrier_offset(sig, fo):
    """Add a carrier frequency offset (reference qampy/impairments.py:86-102)."""
    arr = cimpairments.add_carrier_offset(_samples(sig), fo, sig.fs)
    return _rewrap(sig, arr)


def add_dispersion(sig, D, L, wl0=1550e-9):
    """Add chromatic dispersion (reference qampy/impairments.py:104-125)."""
    arr = cimpairments.add_dispersion(_samples(sig), sig.fs, D, L, wl0=wl0)
    return _rewrap(sig, arr)


def add_modal_delay(sig, delay):
    """Add per-mode delays (reference core/impairments.py:259-281)."""
    arr = cimpairments.add_modal_delay(_samples(sig), delay)
    return _rewrap(sig, arr)


def simulate_transmission(sig, snr=None, freq_off=None, lwdth=None, dgd=None,
                          theta=np.pi / 3.731, modal_delay=None, roll_frame_sync=False,
                          key=None):
    """Convenience function applying several impairments (reference qampy/impairments.py:127-171)."""
    if roll_frame_sync:
        if not (isinstance(sig, SignalWithPilots) and sig.nframes > 1):
            warnings.warn("Only single frame present, discontinuity introduced")
        sig = _rewrap(sig, jnp.roll(_samples(sig), sig.pilots.shape[1], axis=-1))
    arr = cimpairments.simulate_transmission(_samples(sig), sig.fb, sig.fs, snr=snr,
                                             freq_off=freq_off, lwdth=lwdth, dgd=dgd,
                                             theta=theta, modal_delay=modal_delay, key=key)
    return _rewrap(sig, arr)


def sim_tx_response(sig, enob=6, tgt_v=1, clip_rat=1, quant_bits=0,
                    dac_params={"cutoff": 18e9, "fn": None, "ch": None}, key=None, **mod_prms):
    """Simulate the TX frontend chain (reference qampy/impairments.py:173-201)."""
    arr = cimpairments.sim_tx_response(_samples(sig), sig.fs, enob=enob, tgt_v=tgt_v,
                                       clip_rat=clip_rat, quant_bits=quant_bits,
                                       dac_params=dac_params, key=key, **mod_prms)
    return _rewrap(sig, arr)


def sim_DAC_response(sig, enob=5, clip_rat=1, quant_bits=0, key=None, **dac_params):
    """Simulate the DAC (reference qampy/impairments.py:203-227)."""
    arr = cimpairments.sim_DAC_response(_samples(sig), sig.fs, enob=enob, clip_rat=clip_rat,
                                        quant_bits=quant_bits, key=key, **dac_params)
    return _rewrap(sig, arr)


def sim_mod_response(sig, dcbias=1, gfactr=1, cfactr=0, dcbias_out=0.5, gfactr_out=1):
    """Simulate the IQ modulator response (reference qampy/impairments.py:229-258)."""
    arr = cimpairments.modulator_response(_samples(sig), dcbias=dcbias, gfactr=gfactr,
                                          cfactr=cfactr, dcbias_out=dcbias_out,
                                          gfactr_out=gfactr_out)
    return _rewrap(sig, arr)

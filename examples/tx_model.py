"""Transmitter model: DAC/amplifier/MZM simulation with predistortion.

Workload parity: reference Scripts/Notebooks/"Demo of Tx model with full
compensation.ipynb" / "Demo of transmitter impairment simulation.ipynb" —
run the TX frontend model (finite-ENOB DAC with a band-limiting response,
ideal amplifier, Mach-Zehnder modulator sine transfer) over an RRC-shaped
64-QAM signal, with and without the arcsin modulator pre-compensation,
and compare received SNR after matched resampling.
Run: python examples/tx_model.py
"""
import _common  # noqa: F401
import numpy as np
import jax.numpy as jnp
import jax.random as jr
import qampy_tpu as qt
from qampy_tpu import helpers
from qampy_tpu.core import digital_pre_compensation as dpc
from qampy_tpu import impairments

fb = 24e9
os = 2
sig = qt.SignalQAMGrayCoded(64, 2 ** 16, nmodes=2, fb=fb, seed=3)
s2 = sig.resample(os * fb, beta=0.1, renormalise=True)

for precomp in (False, True):
    tx = s2.samples
    if precomp:
        # normalise into the arcsin domain, pre-distort for the MZM sine
        tx = tx / jnp.max(jnp.abs(jnp.concatenate([tx.real, tx.imag])))
        tx = dpc.comp_mod_sin(tx, vpi=1.14)
    out = impairments.sim_tx_response(
        s2.replace(samples=tx), enob=7, tgt_v=0.9,
        dac_params={"cutoff": 0.45 * os * fb, "fn": None, "ch": None},
        key=jr.PRNGKey(1))
    rx = out.resample(fb, beta=0.1, renormalise=True)
    rx = rx.replace(samples=helpers.normalise_and_center(rx.samples))
    snr = 10 * np.log10(np.asarray(rx.est_snr()))
    print("precomp=%-5s rx SNR: %s dB  EVM: %s %%"
          % (precomp, np.round(snr, 2),
             np.round(100 * np.asarray(rx.cal_evm()), 2)))

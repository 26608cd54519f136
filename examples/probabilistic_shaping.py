"""Probabilistic constellation shaping with pilot-based centering.

Workload parity: reference Scripts/Notebooks/"Demo of Geometric shaping in
transmitter model - pilot_based centering.ipynb" — Maxwell-Boltzmann-shaped
64-QAM carried by a SymbolOnlySignal, AWGN channel, pilot-based
normalise/center at the receiver, and the shaped mutual information vs the
uniform constellation's.
Run: python examples/probabilistic_shaping.py
"""
import _common  # noqa: F401
import numpy as np
import jax.random as jr
import qampy_tpu as qt
from qampy_tpu import impairments, theory, helpers
from qampy_tpu.core.metrics import cal_mi

snr_db = 18
N = 2 ** 16
const = np.asarray(theory.cal_symbols_qam(64))
const = const / np.sqrt(float(theory.cal_scaling_factor_qam(64)))
# shaping acts per quadrature on the PAM amplitude levels (reference
# theory.py:224-248 draws I and Q independently)
levels = np.unique(np.round(const.real, 6))
for nu, label in ((0.0, "uniform 64-QAM"), (0.05, "MB-shaped nu=0.05"),
                  (0.12, "MB-shaped nu=0.12")):
    if nu == 0:
        px = np.full(levels.size, 1 / levels.size)
    else:
        levels, px = theory.cal_ps_probablts(levels, nu)
    syms = np.asarray(theory.generate_ps_symbols(N, levels, px, seed=1))
    sig = qt.SymbolOnlySignal(64, N, const, nmodes=1, fb=25e9)
    sig = sig.replace(samples=syms[None, :].astype(np.complex64),
                      _symbols=syms[None, :].astype(np.complex64))
    n = impairments.change_snr(sig, snr_db, key=jr.PRNGKey(3))
    # pilot-based centering: use the first 1024 symbols as known pilots
    pil_idx = np.arange(1024)
    cent = helpers.normalise_and_center_pil(n.samples, pil_idx)
    mi = float(np.asarray(cal_mi(cent, sig.samples, sig.coded_symbols,
                                 10 ** (-snr_db / 10))))
    print("%-20s MI = %.3f bits (max 6)" % (label, mi))

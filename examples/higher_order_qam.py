"""Higher-order QAM (128/256) end-to-end with equalisation and BPS.

Workload parity: reference Scripts/Notebooks/"QAMPy higher-order QAM.ipynb"
— dense constellations through the full blind chain: RRC 2x TX, phase
noise + AWGN + PMD, two-stage MCMA->SBD equalisation and a wide blind
phase search, GMI/EVM at the output. 128-QAM exercises the cross-
constellation decision paths.
Run: python examples/higher_order_qam.py
"""
import _common  # noqa: F401
import numpy as np
import jax.random as jr
import qampy_tpu as qt
from qampy_tpu import equalisation, impairments, phaserec, helpers

for M, snr in ((128, 33), (256, 36)):
    fb = 25e9
    sig = qt.SignalQAMGrayCoded(M, 2 ** 16, nmodes=2, fb=fb, seed=M)
    s2 = sig.resample(2 * fb, beta=0.1, renormalise=True)
    s2 = impairments.apply_phase_noise(s2, 5e3, key=jr.PRNGKey(M + 1))
    s2 = impairments.apply_PMD(s2, np.pi / 5.6, 20e-12)
    s2 = impairments.change_snr(s2, snr, key=jr.PRNGKey(M))
    E, wxy, err = equalisation.dual_mode_equalisation(
        s2, (1e-3, 1e-3), 17, methods=("mcma", "sbd"),
        adaptive_stepsize=(True, True))
    rec, ph = phaserec.bps(E, 96, 30)
    rec = rec.replace(samples=helpers.normalise_and_center(
        helpers.dump_edges(rec.samples, 50)))
    print("%d-QAM @ %d dB: SER=%s GMI=%s (max %.0f)"
          % (M, snr, np.asarray(rec.cal_ser()),
             np.round(np.asarray(rec.cal_gmi()[0]), 2), np.log2(M)))

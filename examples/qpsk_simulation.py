"""QPSK link simulation: CMA + Viterbi-Viterbi carrier recovery.

Workload parity: reference Scripts/Notebooks/"QPSK simulation.ipynb" /
"Hackathon QAMpy QPSK demo.ipynb" — the classic QPSK receiver: RRC TX,
AWGN + polarisation rotation + phase noise, CMA equaliser, 4th-power
(Viterbi-Viterbi) phase recovery, BER vs theory.
Run: python examples/qpsk_simulation.py
"""
import _common  # noqa: F401
import numpy as np
import jax.random as jr
import qampy_tpu as qt
from qampy_tpu import equalisation, impairments, phaserec, helpers, theory

fb = 25e9
for snr_db in (8, 10, 12):
    sig = qt.SignalQAMGrayCoded(4, 2 ** 17, nmodes=2, fb=fb, seed=1)
    s2 = sig.resample(2 * fb, beta=0.1, renormalise=True)
    s2 = impairments.apply_phase_noise(s2, 50e3, key=jr.PRNGKey(2))
    s2 = impairments.apply_PMD(s2, np.pi / 4.7, 30e-12)
    s2 = impairments.change_snr(s2, snr_db, key=jr.PRNGKey(snr_db))
    E, wxy, err = equalisation.equalise_signal(s2, 2e-3, Ntaps=17,
                                               method="cma",
                                               adaptive_stepsize=True,
                                               apply=True)
    rec, ph = phaserec.viterbiviterbi(E, 41)
    rec = rec.replace(samples=helpers.dump_edges(rec.samples, 30))
    ber = float(np.mean(np.asarray(rec.cal_ber())))
    ber_t = float(theory.ber_vs_es_over_n0_qam(10 ** (snr_db / 10), 4))
    print("QPSK @ %2d dB: BER=%.3e  theory=%.3e" % (snr_db, ber, ber_t))

"""Modulation-format tour: theory vs simulated metrics for several M-QAM.

Workload parity: reference Scripts/Notebooks/"Modulation Format Demo.ipynb"
— generate Gray-coded M-QAM at a sweep of orders, impair with AWGN, and
compare simulated SER/BER/EVM against the closed-form theory curves.
Run: python examples/modulation_formats.py
"""
import _common  # noqa: F401
import numpy as np
import jax.random as jr
import qampy_tpu as qt
from qampy_tpu import impairments, theory

print("%6s %6s %12s %12s %12s %12s" % ("M", "SNRdB", "SER sim", "SER theory",
                                       "BER sim", "BER theory"))
for M, snr_db in ((4, 11), (16, 18), (64, 24), (256, 30)):
    sig = qt.SignalQAMGrayCoded(M, 2 ** 17, nmodes=1, fb=25e9, seed=M)
    n = impairments.change_snr(sig, snr_db, key=jr.PRNGKey(M))
    snr = 10 ** (snr_db / 10)
    ser_t = float(theory.ser_vs_es_over_n0_qam(snr, M))
    ber_t = float(theory.ber_vs_es_over_n0_qam(snr, M))
    print("%6d %6.1f %12.3e %12.3e %12.3e %12.3e"
          % (M, snr_db, float(np.mean(np.asarray(n.cal_ser()))), ser_t,
             float(np.mean(np.asarray(n.cal_ber()))), ber_t))

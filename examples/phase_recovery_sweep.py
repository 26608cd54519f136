"""BPS vs two-stage BPS across laser linewidths (64-QAM).

Workload parity: reference Scripts/phaserecoverytest.py — sweep the LO
linewidth, recover with the one-stage (64-angle) and two-stage (28+14)
blind phase search, compare SER.
Run: python examples/phase_recovery_sweep.py
"""
import _common  # noqa: F401
import numpy as np
import jax.random as jr
import qampy_tpu as qt
from qampy_tpu import impairments, phaserec, helpers

fb = 40e9
N = 3 * 10 ** 5
rng = np.random.default_rng(4)
for i, lw in enumerate(np.linspace(10e1, 1000e1, 4)):
    s = qt.SignalQAMGrayCoded(64, N, fb=fb, seed=5)
    s = s.resample(fb, beta=0.1, renormalise=True)
    s = impairments.change_snr(s, 30, key=jr.PRNGKey(i))
    s = s.replace(samples=np.roll(np.asarray(s.samples),
                                  int(rng.integers(-N // 2, N // 2)), axis=1))
    pp = impairments.apply_phase_noise(s, lw, key=jr.PRNGKey(100 + i))
    rec2, ph2 = phaserec.bps_twostage(pp, 28, 14)
    rec1, ph1 = phaserec.bps(pp, 64, 14)
    rec2 = rec2.replace(samples=helpers.dump_edges(rec2.samples, 20))
    rec1 = rec1.replace(samples=helpers.dump_edges(rec1.samples, 20))
    print("lw=%6.0f Hz  two-stage ser=%g  one-stage ser=%g"
          % (lw, np.mean(np.asarray(rec2.cal_ser())),
             np.mean(np.asarray(rec1.cal_ser()))))

"""Two-stage MCMA -> MRDE equalisation of a PMD-impaired 16-QAM signal.

Workload parity: reference Scripts/mrde_equaliser.py (40 GBd dual-pol
16-QAM, theta=pi/2.35, 50 ps DGD, 30-tap two-stage equaliser; the
reference renders hexbin constellations and tap/error traces — here the
recovered quality is printed as EVM/GMI, headless).
Run: python examples/mrde_equaliser.py
"""
import _common  # noqa: F401  (repo path + platform)
import numpy as np
import jax.random as jr
import qampy_tpu as qt
from qampy_tpu import equalisation, impairments, helpers

fb = 40e9
theta = np.pi / 2.35
sig = qt.ResampledQAM(16, 2 ** 18, nmodes=2, fb=fb, fs=2 * fb,
                      resamplekwargs={"beta": 0.01, "renormalise": True},
                      seed=1)
sig = impairments.change_snr(sig, 24, key=jr.PRNGKey(0))
SS = impairments.apply_PMD(sig, theta, 50e-12)

E_s, wxy_s, (err_s, err_rde_s) = equalisation.dual_mode_equalisation(
    SS, (1e-3, 0.5e-3), 30, methods=("mcma", "mrde"))
E_s = E_s.replace(samples=helpers.normalise_and_center(E_s.samples))
evm_in = np.asarray(sig[:, ::2].cal_evm())
evm_out = np.asarray(E_s.cal_evm())
gmi = np.asarray(E_s.cal_gmi()[0])
print("EVM in : %s %%" % np.round(100 * evm_in, 1))
print("EVM out: %s %%" % np.round(100 * evm_out, 1))
print("GMI    : %s (max 4)" % np.round(gmi, 3))
print("SER    : %s" % np.asarray(E_s.cal_ser()))

"""Transmitter distortion test: quantiser noise model + DAC/MZM distortion.

Workload parity: reference Scripts/Notebooks/"Demo of transmitter
distortion test .ipynb" — (1) validate the finite-ENOB quantiser against
the analytic uniform-quantisation noise power delta^2/12 per dimension,
(2) model ENOB as an equivalent AWGN and check the received SNR against
the closed form, (3) drive a 16-QAM signal through the band-limited DAC
and the overdriven Mach-Zehnder (Vtarget = 5.5 V at Vpi = 3.5 V, the
notebook's deliberately nonlinear operating point) and confirm the
receiver still decodes after matched resampling.

Run: python examples/tx_distortion_test.py
"""
import _common  # noqa: F401
import numpy as np
import jax.numpy as jnp
import jax.random as jr

import qampy_tpu as qt
from qampy_tpu import helpers, impairments
from qampy_tpu.core import impairments as cimpairments

M, N, fb = 16, 2 ** 16, 20e9
VPI = 3.5
sig = qt.SignalQAMGrayCoded(M, N, nmodes=1, fb=fb, seed=1)
s2 = sig.resample(2 * fb, beta=0.2)
x = s2.samples

# ---- 1. quantiser vs analytic delta^2/12 ------------------------------
enob = 6
x_max = float(jnp.maximum(jnp.abs(x.real).max(), jnp.abs(x.imag).max()))
delta = x_max / 2 ** (enob - 1)
pn_analytic = delta ** 2 / 12          # per real dimension
sq = cimpairments.quantize_signal_New(x, nbits=enob, rescale_in=True,
                                      rescale_out=True)
pn_meas = float(jnp.mean(jnp.abs(sq - x) ** 2)) / 2
print("quantiser noise/dim: measured %.3e analytic %.3e (ratio %.3f)"
      % (pn_meas, pn_analytic, pn_meas / pn_analytic))
assert 0.9 < pn_meas / pn_analytic < 1.1

# ---- 2. ENOB as equivalent AWGN ---------------------------------------
pow_mean = float(jnp.mean(jnp.abs(x.real) ** 2))
noisy = impairments.add_awgn(s2, np.sqrt(2 * pn_analytic),
                             key=jr.PRNGKey(1))
rx1 = noisy.resample(fb, beta=0.2, renormalise=True)
snr_est = float(10 * np.log10(np.asarray(rx1.est_snr())[0]))
snr_th = float(10 * np.log10(pow_mean * 2 / (2 * pn_analytic)))
print("ENOB-as-AWGN: est_snr %.2f dB, analytic %.2f dB" % (snr_est, snr_th))
# blind SNR estimation saturates near the estimator ceiling; require the
# analytic value to be reproduced within a few dB at this high SNR
assert abs(snr_est - snr_th) < 4.0

# ---- 3. band-limited DAC + overdriven MZM + channel noise -------------
dac = impairments.sim_DAC_response(s2, enob=6, cutoff=5e9, fn=None,
                                   ch=None, key=jr.PRNGKey(2))
print("DAC(5 GHz bessel) residual: %.3e"
      % float(jnp.mean(jnp.abs(dac.samples - x) ** 2)))
amp = cimpairments.ideal_amplifier_response(x, 5.5 / (2 * VPI))
mzm = cimpairments.modulator_response(amp)
out = impairments.change_snr(s2.replace(samples=mzm), 20,
                             key=jr.PRNGKey(3))
rx = out.resample(fb, beta=0.2, renormalise=True)
rx = rx.replace(samples=helpers.normalise_and_center(rx.samples))
ser = float(np.asarray(rx.cal_ser())[0])
print("overdriven MZM @20 dB: SER %.2e est_snr %.2f dB"
      % (ser, 10 * np.log10(np.asarray(rx.est_snr())[0])))
assert ser < 1e-3    # 16-QAM at 20 dB decodes through the compression
print("transmitter distortion test OK")

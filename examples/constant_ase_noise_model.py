"""Constant-ASE noise transmitter model with a dual-pol pilot receiver.

Workload parity: reference Scripts/Notebooks/"Demo of transmitter
impairment simulation_constant ASE noise model.ipynb" — the payload is a
plain QAM signal wrapped into a pilot frame via
``SignalWithPilots.from_symbol_array``, driven per polarisation through a
clipping DAC (clip ratio 0.6, 6-bit ENOB, 16 GHz bandwidth), an ideal
amplifier and the Mach-Zehnder modulator, then impaired with a CONSTANT
ASE noise floor: the noise variance is fixed in absolute power
(-13.6 dBm reference level scaled by the target OSNR and the fs/fb
oversampling bandwidth ratio) rather than tracking the signal power —
so modulator drive/insertion loss directly moves the effective SNR, which
is the point of the model. RX: resample, normalise, ``sync2frame`` +
``corr_foe`` (the notebook's flow), mcma/mddma pilot equalisation, pilot
CPE, BER gate.

Run: python examples/constant_ase_noise_model.py
"""
import _common  # noqa: F401
import numpy as np
import jax.numpy as jnp
import jax.random as jr

import qampy_tpu as qt
from qampy_tpu import equalisation, helpers, impairments, phaserec
from qampy_tpu.core import impairments as cimpairments

M, frame_len, seq_len, ins_rat, fb = 64, 2 ** 14, 1024, 32, 24e9
VPI = 3.5
roll = 0.1
snr = 28

# payload as a standalone QAM signal, wrapped into the pilot frame
n_payload = (frame_len - seq_len) * (ins_rat - 1) // ins_rat
payload = qt.SignalQAMGrayCoded(M, n_payload, nmodes=2, fb=fb, seed=11)
psig = qt.SignalWithPilots.from_symbol_array(payload, frame_len, seq_len,
                                             ins_rat, nframes=2)
s2 = psig.resample(2 * fb, beta=roll, renormalise=True)
s2 = s2.replace(samples=jnp.roll(s2.samples, 5000, axis=-1))

# TX frontend: clipping DAC -> amplifier -> MZM (per pol, vectorised)
dac = impairments.sim_DAC_response(s2, enob=6, clip_rat=0.6, cutoff=16e9,
                                   fn=None, ch=None, key=jr.PRNGKey(1))
amp = cimpairments.ideal_amplifier_response(dac.samples, 2.0 / VPI)
sig_mod = s2.replace(samples=cimpairments.modulator_response(amp))

# constant ASE: absolute noise power, oversampling-bandwidth scaled
noise_var = 10 ** (-13.6 / 10) / 10 ** (snr / 10) * (s2.fs / s2.fb)
sig_h = impairments.add_awgn(sig_mod, np.sqrt(noise_var),
                             key=jr.PRNGKey(2))

# RX DSP
r = sig_h.resample(2 * fb, beta=roll, renormalise=True)
r = r.replace(samples=helpers.normalise_and_center(r.samples))
assert r.sync2frame(), "frame sync failed"
print("shift factors:", r.shiftfctrs)
r.corr_foe()
taps, eq = equalisation.pilot_equaliser(r, (1e-2, 1e-2), 31,
                                        foe_comp=False,
                                        methods=("mcma", "mddma"))
out, _ = phaserec.pilot_cpe(eq, N=5, use_seq=False)
ber = np.asarray(out.cal_ber())
ser = np.asarray(out.cal_ser())
gmi = np.asarray(out.cal_gmi()[0])
print("constant-ASE model @%d dB (clip 0.6): BER %s SER %s GMI %s"
      % (snr, np.round(ber, 5), np.round(ser, 5), np.round(gmi, 3)))
assert np.all(ber < 2e-2), ber
print("constant ASE noise model OK")

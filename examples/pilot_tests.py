"""Pilot DSP chain with modal delay and data-aided second stage.

Workload parity: reference Scripts/pilot_tests.py — SignalWithPilots TX,
simulate_transmission with DGD + per-mode modal delay, sync2frame +
coarse-FOE correction, pilot equalisation with ("cma", "sbd_data"),
pilot CPE, GMI (the reference renders hist2d constellations; headless
metrics here).
Run: python examples/pilot_tests.py
"""
import _common  # noqa: F401
import numpy as np
import jax.random as jr
import qampy_tpu as qt
from qampy_tpu import equalisation, impairments, phaserec

mysig = qt.SignalWithPilots(64, 2 ** 16, 2 ** 10, 32, nmodes=2, nframes=3,
                            fb=24e9, seed=6)
mysig2 = mysig.resample(mysig.fb * 2, beta=0.01)
mysig3 = impairments.simulate_transmission(mysig2, snr=20, dgd=10e-12,
                                           roll_frame_sync=True,
                                           modal_delay=[2000, 3000],
                                           key=jr.PRNGKey(2))
mysig3.sync2frame()
print("shift factors:", mysig3.shiftfctrs)
mysig3.corr_foe()
wxy, eq_sig = equalisation.pilot_equaliser(mysig3, (1e-3, 1e-3), 45,
                                           foe_comp=False,
                                           methods=("cma", "sbd_data"))
cpe_sig, ph = phaserec.pilot_cpe(eq_sig, N=5, use_seq=False)
print("GMI:", np.asarray(cpe_sig.cal_gmi()[0]))

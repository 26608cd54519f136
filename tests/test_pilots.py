"""Pilot-chain functional tests.

Mirrors reference test/test_pilot_signal.py and test_equalisation.py:150-164:
full frame-sync -> pilot equalisation -> pilot CPE under realistic
impairments, asserting BER/GMI thresholds.
"""
import numpy as np
import jax.random as jr
import pytest

import qampy_tpu as qt
from qampy_tpu import equalisation, impairments, phaserec


def _pilot_chain(method=("cma", "sbd"), modal_delay=(2000, 2000), snr=25,
                 rollframe=False, lw=100e3, fo=100e6, dgd=10e-12, seed=7):
    mysig = qt.SignalWithPilots(64, 2 ** 16, 2 ** 10, 32, nmodes=2, Mpilots=4,
                                nframes=3, fb=24e9, seed=seed)
    mysig2 = mysig.resample(mysig.fb * 2, beta=0.01)
    mysig3 = impairments.simulate_transmission(mysig2, snr=snr, dgd=dgd, freq_off=fo,
                                               lwdth=lw, modal_delay=modal_delay,
                                               roll_frame_sync=rollframe,
                                               key=jr.PRNGKey(seed))
    ok = mysig3.sync2frame()
    assert ok, "frame sync failed"
    mysig3.corr_foe()
    wxy, eq_sig = equalisation.pilot_equaliser(mysig3, (1e-3, 1e-3), 45,
                                               foe_comp=False, methods=method)
    cpe_sig, ph = phaserec.pilot_cpe(eq_sig, N=5, use_seq=False)
    return cpe_sig


class TestFullChain:
    @pytest.mark.parametrize("method", [("cma", "sbd"), ("cma", "sbd_data")])
    def test_gmi_threshold(self, method):
        # reference test_equalisation.py:150-164 asserts GMI > 5.5
        cpe_sig = _pilot_chain(method=method)
        gmi = np.mean(cpe_sig.cal_gmi()[0])
        assert gmi > 5.5

    def test_unequal_modal_delay(self):
        cpe_sig = _pilot_chain(modal_delay=(3000, 2000))
        gmi = np.mean(cpe_sig.cal_gmi()[0])
        assert gmi > 5.5

    def test_high_snr_ber(self):
        # reference test_pilot_signal.py asserts BER < 1e-5 at high SNR
        cpe_sig = _pilot_chain(snr=35, lw=50e3)
        ber = np.asarray(cpe_sig.cal_ber())
        assert np.all(ber < 1e-4)

    def test_rollframe(self):
        cpe_sig = _pilot_chain(rollframe=True)
        gmi = np.mean(cpe_sig.cal_gmi()[0])
        assert gmi > 5.5


class TestFrameSyncGuards:
    def test_real_valued_method_rejected(self):
        # reference test_pilot_signal.py:9-33 / pilotbased_receiver.py:375-382
        mysig = qt.SignalWithPilots(64, 2 ** 14, 2 ** 9, 32, nmodes=2, nframes=3,
                                    fb=24e9, seed=1)
        mysig2 = mysig.resample(mysig.fb * 2, beta=0.01)
        with pytest.raises(ValueError):
            mysig2.sync2frame(method="cma_real")
        with pytest.raises(ValueError):
            mysig2.sync2frame(method="sbd_data")


class TestPilotFOE:
    def test_foe_accuracy(self):
        from qampy_tpu.ops.pilots import pilot_based_foe
        N = 1024
        rng = np.random.default_rng(3)
        pilots = (rng.choice([1 + 1j, 1 - 1j, -1 + 1j, -1 - 1j], N) / np.sqrt(2))
        fo = 1e-4  # cycles/symbol
        rx = pilots * np.exp(2j * np.pi * fo * np.arange(N))
        foe, per_mode, cond = pilot_based_foe(rx[None, :], pilots[None, :])
        assert abs(float(foe) - fo) < 1e-6


class TestMultiFrame:
    def test_pilot_equaliser_nframes(self):
        import jax.random as jr
        import qampy_tpu as qt
        from qampy_tpu import equalisation, impairments
        sig = qt.SignalWithPilots(16, 2 ** 14, 2 ** 9, 32, nmodes=2, Mpilots=4,
                                  nframes=4, fb=24e9, seed=5)
        sig2 = sig.resample(sig.fb * 2, beta=0.02)
        sig3 = impairments.simulate_transmission(sig2, snr=25, dgd=5e-12,
                                                 key=jr.PRNGKey(2))
        assert sig3.sync2frame()
        taps, sout, rest = equalisation.pilot_equaliser_nframes(
            sig3, (1e-3, 1e-3), 25, frames=[0, 1], foe_comp=False,
            methods=("cma", "sbd"))
        assert sout.shape[-1] == 2 * sig.frame_len
        ber = np.asarray(sout.cal_ber())
        assert np.all(ber < 1e-2)

"""Tests for digital pre-compensation and the pilot-frame TX helpers.

Mirrors the reference's coverage intent for
core/digital_pre_compensation.py (clipper, arcsin modulator precomp, DAC
inverse filter, pattern LUT) and core/pilotbased_transmitter.py (frame
assembly + TX impairment chain).
"""
import numpy as np
import numpy.testing as npt
import jax.numpy as jnp
import pytest

from qampy_tpu import signals, theory
from qampy_tpu.core import digital_pre_compensation as dpc
from qampy_tpu.core import pilotbased_transmitter as ptx


class TestClipper:
    def test_clips_both_planes(self, rng):
        sig = (rng.standard_normal(1000) + 1j * rng.standard_normal(1000)) * 2
        out = np.asarray(dpc.clipper(sig, 1.0))[0]
        assert np.abs(out.real).max() <= 1.0 + 1e-6
        assert np.abs(out.imag).max() <= 1.0 + 1e-6

    def test_identity_below_level(self, rng):
        sig = (rng.standard_normal(1000) + 1j * rng.standard_normal(1000)) * 0.1
        out = np.asarray(dpc.clipper(sig, 1.0))[0]
        npt.assert_allclose(out, sig, rtol=1e-6)


class TestModSin:
    def test_arcsin_inverts_sine(self, rng):
        # precomp output is 2*vpi*arcsin(x); the modulator's sin(v/(2*vpi))
        # then recovers x exactly (reference core/digital_pre_compensation.py:40-57)
        vpi = 1.14
        x = (rng.uniform(-0.9, 0.9, 500) + 1j * rng.uniform(-0.9, 0.9, 500))
        pre = np.asarray(dpc.comp_mod_sin(x, vpi))
        modded = (np.sin(pre.real / (2 * vpi)) + 1j * np.sin(pre.imag / (2 * vpi)))
        npt.assert_allclose(modded, x, atol=1e-6)


class TestCompDacResp:
    def test_response_shape_and_dc_gain(self):
        # fb must exceed the default 16 GHz DAC cutoff (fs = 2*fb Nyquist)
        resp = dpc.comp_dac_resp(40e9, 4096, 0.1)
        assert resp.shape == (4096,)
        # inverse filter boosts DAC-attenuated frequencies near the RRC band
        # edge (fb/2 = fs/4 -> bin sim_len/4) relative to DC, and nulls the
        # out-of-band region where the RRC spectrum is zero
        assert abs(resp[1024]) > abs(resp[0])
        assert abs(resp[2048]) < 1e-12
        assert np.all(np.isfinite(resp))


class TestPatternLUT:
    def test_find_sym_patterns_counts(self, rng):
        levels = jnp.asarray(np.array([-3., -1., 1., 3.]))
        sym_idx = rng.integers(0, 4, 64)
        sig = np.asarray(levels)[sym_idx]
        pat = np.asarray(dpc.find_sym_patterns(jnp.asarray(sig), levels, 3))
        assert pat.shape == (64,)
        assert pat.min() >= 0 and pat.max() < 4 ** 3

    def test_cal_lut_recovers_pattern_error(self, rng):
        # build a signal whose error depends ONLY on the middle symbol of the
        # 3-pattern; the LUT average must recover that dependence exactly
        M = 4
        const = np.asarray(theory.cal_symbols_qam(M)) / np.sqrt(
            float(theory.cal_scaling_factor_qam(M)))
        tx = const[rng.integers(0, M, 2 ** 12)]
        err_per_sym = 0.01 * (np.arange(M) - M / 2)
        sym_of = np.argmin(np.abs(tx[:, None] - const[None, :]), axis=1)
        rx = tx - err_per_sym[sym_of] * (1 + 1j)
        lut, idx_I, idx_Q = dpc.cal_lut(jnp.asarray(tx), jnp.asarray(rx),
                                        jnp.asarray(const), mem_len=3)
        lut = np.asarray(lut)
        # every occupied I-pattern's averaged error matches the injected one
        idx_I = np.asarray(idx_I)
        errs = np.asarray(err_per_sym[sym_of])
        for p in np.unique(idx_I)[:20]:
            expect = errs[idx_I == p].mean()
            npt.assert_allclose(lut[p].real, expect, atol=1e-6)


class TestPilotTransmitter:
    def test_frame_with_phasepilots(self):
        fr = ptx.gen_dataframe_with_phasepilots(64, 2, frame_len=2 ** 12,
                                                pilot_seq_len=256,
                                                pilot_ins_ratio=32)
        assert fr.frame_len == 2 ** 12
        assert fr.pilot_seq_len == 256
        assert np.asarray(fr).shape == (2, 2 ** 12)
        # pilots are QPSK
        assert fr.Mpilots == 4

    def test_frame_without_phasepilots(self):
        fr = ptx.gen_dataframe_without_phasepilots(16, 1, frame_len=2 ** 12,
                                                   pilot_seq_len=128)
        idx_pil = np.asarray(fr.idx_pil)
        assert np.count_nonzero(idx_pil) == 128  # only the sequence

    def test_hybrid_frame(self):
        fr, payload = ptx.gen_dataframe_with_phasepilots_hybridmodulation(
            M=(16, 64), mod_ratio=(1, 1), npols=2, frame_len=2 ** 12,
            pilot_seq_len=256, pilot_ins_ratio=32)
        assert np.asarray(fr).shape == (2, 2 ** 12)
        assert payload.M == (16, 64)

    def test_sim_tx_runs_chain(self):
        import jax.random as jr
        fr = ptx.gen_dataframe_with_phasepilots(16, 2, frame_len=2 ** 12,
                                                pilot_seq_len=256,
                                                pilot_ins_ratio=32)
        out = ptx.sim_tx(fr, 2, snr=25, freqoff=1e7, linewidth=1e4,
                         rot_angle=np.pi / 7, key=jr.PRNGKey(0))
        assert np.asarray(out).shape == (2, 2 ** 13)
        assert out.fs == 2 * fr.fb

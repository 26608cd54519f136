"""Digital pre-distortion and transceiver pre-compensation.

Parity: qampy/core/digital_pre_compensation.py in the reference. The pattern
LUT averaging kernel (reference pythran_dsp.py:201-240, C++/OpenMP) becomes a
pair of jax segment sums.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import scipy.signal as scisig

from qampy_tpu.core.special import rrcos_freq
from qampy_tpu.utils import rolling_window


def clipper(sig, clipping_level):
    """Clip I and Q to (-clipping_level, clipping_level) (reference core/digital_pre_compensation.py:30-37)."""
    sig = jnp.atleast_2d(jnp.asarray(sig))
    re = jnp.sign(sig.real) * jnp.minimum(jnp.abs(sig.real), clipping_level)
    im = jnp.sign(sig.imag) * jnp.minimum(jnp.abs(sig.imag), clipping_level)
    return re + 1j * im


def comp_mod_sin(sig, vpi=1.14):
    """Arcsin pre-compensation for the modulator sine response (reference core/digital_pre_compensation.py:40-57)."""
    sig = jnp.asarray(sig)
    if not np.iscomplexobj(vpi):
        vpi = vpi + 1j * vpi
    return 2 * vpi.real * jnp.arcsin(sig.real) + 2j * vpi.imag * jnp.arcsin(sig.imag)


def comp_dac_resp(dpe_fb, sim_len, rrc_beta, PAPR=9, prms_dac=(16e9, 2, 'sos', 6), os=2):
    """Inverse-response (Wiener) filter for a simulated DAC.

    Parity: reference core/digital_pre_compensation.py:59-97. Filter design is
    host-side (static), the returned response multiplies the signal spectrum.
    """
    dpe_fs = dpe_fb * os
    T_rrc = 1 / dpe_fb
    fre_rrc = np.fft.fftfreq(sim_len) * dpe_fs
    rrc_f = np.asarray(rrcos_freq(jnp.asarray(fre_rrc), rrc_beta, T_rrc))
    rrc_f = rrc_f / rrc_f.max()
    n_f = rrc_f ** 2
    cutoff, order, frmt, enob = prms_dac
    system_dig = scisig.bessel(order, cutoff, 'low', analog=False, output=frmt,
                               norm='mag', fs=dpe_fs)
    w_bes, d_f = scisig.sosfreqz(system_dig, worN=sim_len, whole=True, fs=dpe_fs)
    df = dpe_fs / sim_len
    alpha = 10 ** (PAPR / 10) / (6 * dpe_fb * 2 ** (2 * enob)) * np.sum(abs(d_f) ** 2 * n_f * df)
    return n_f * np.conj(d_f) / (n_f * abs(d_f) ** 2 + alpha)


def find_sym_patterns(sig, ref_sym, N, ret_ptrns=False):
    """Index symbol patterns of length N (reference core/digital_pre_compensation.py:99-131)."""
    sig = jnp.asarray(sig)
    ref_sym = jnp.asarray(ref_sym)
    M = ref_sym.size
    sig_idx = jnp.argmin(jnp.abs(sig[None, :] - ref_sym[:, None]), axis=0)
    sig_rwin = rolling_window(sig_idx, N, wrap=True)  # (L, N)
    weights = (M ** jnp.arange(N - 1, -1, -1)).astype(sig_rwin.dtype)
    pattern_idx = jnp.sum(sig_rwin * weights, axis=-1)
    if ret_ptrns:
        L = int(M ** N)
        pidx = np.array(np.unravel_index(np.arange(L), N * [int(M)])).T
        return pattern_idx, np.asarray(ref_sym)[pidx]
    return pattern_idx


def cal_lut_avg(err, idx_I, idx_Q, N):
    """Average error per pattern index (reference pythran_dsp.py:201-240).

    The reference accumulates with a serial loop; here two segment sums
    produce the per-pattern sums and counts.
    """
    err = jnp.asarray(err)
    idx_I = jnp.asarray(idx_I)[:err.size]
    idx_Q = jnp.asarray(idx_Q)[:err.size]
    sum_I = jax.ops.segment_sum(err.real, idx_I, num_segments=N)
    sum_Q = jax.ops.segment_sum(err.imag, idx_Q, num_segments=N)
    nI = jax.ops.segment_sum(jnp.ones_like(err.real), idx_I, num_segments=N)
    nQ = jax.ops.segment_sum(jnp.ones_like(err.real), idx_Q, num_segments=N)
    nI = jnp.maximum(nI, 1)
    nQ = jnp.maximum(nQ, 1)
    return sum_I / nI + 1j * sum_Q / nQ


def cal_lut(tx_sig, rx_sig, ref_sym, mem_len=3, idx_data=None, real_ptrns=True):
    """Calculate a pattern-error lookup table (simplified Volterra).

    Parity: reference core/digital_pre_compensation.py:133-191; 1D signals.
    """
    tx_sig = jnp.asarray(tx_sig)
    rx_sig = jnp.asarray(rx_sig)
    assert tx_sig.ndim == 1 and rx_sig.ndim == 1, "Only 1d signals are supported"
    assert tx_sig.shape == rx_sig.shape, "Tx and Rx signal need to have the same shape"
    if idx_data is None:
        idx_data = np.ones(tx_sig.shape[-1], dtype=bool)
    idx_data = np.asarray(idx_data)
    err = (tx_sig - rx_sig).flatten()
    idx = np.nonzero(idx_data)[0] - mem_len // 2
    if real_ptrns:
        ref_sym_I = np.unique(np.asarray(ref_sym).real)
        ref_sym_Q = np.unique(np.asarray(ref_sym).imag)
        M = ref_sym_I.size
        N = int(M ** mem_len)
        idx_I = find_sym_patterns(tx_sig.real, jnp.asarray(ref_sym_I), mem_len)[idx]
        idx_Q = find_sym_patterns(tx_sig.imag, jnp.asarray(ref_sym_Q), mem_len)[idx]
        ea = cal_lut_avg(err[idx_data], idx_I, idx_Q, N)
        return ea, idx_I, idx_Q
    ref_sym_c = jnp.asarray(np.unique(np.asarray(ref_sym)))
    M = np.asarray(ref_sym).size
    N = int(M ** mem_len)
    idx_c = find_sym_patterns(tx_sig, ref_sym_c, mem_len)[idx]
    ea = cal_lut_avg(err[idx_data], idx_c, idx_c, N)
    return ea, idx_c, idx_c

"""Pallas TPU kernel for the exact sequential LMS tap-update recurrence.

The reference's hot loop (pythran_equalisation.py:130-173) is strictly
sequential per symbol. The XLA ``lax.scan`` version pays per-step dispatch
overhead; this kernel runs the whole training loop inside ONE Pallas program
with the signal staged in VMEM and the taps carried in the output refs, so
each iteration is a handful of VPU ops with no HBM traffic.

Complex arithmetic is done on split real/imaginary planes (TPU Pallas has no
complex vector type). Implemented error functions: cma, sgncma (reference
maps it to cma), mcma and rde — the methods used by the flagship chain and
frame sync.

This is the third equaliser backend (``backend="pallas"``), matching
``backend="seq"`` semantics (same recurrence order, same adaptive-stepsize
rule). The per-sample error trace is not materialised (returns zeros) — the
taps and final stepsize are the training outputs that matter downstream.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: methods implemented by the pallas backend
PALLAS_METHODS = ("cma", "sgncma", "mcma", "rde")


def _cma_err(zr, zi, sr_row, si_row, ncode):
    d = sr_row[0] - (zr * zr + zi * zi)
    return d * zr, d * zi


def _mcma_err(zr, zi, sr_row, si_row, ncode):
    dr = sr_row[0] - zr * zr
    di = si_row[0] - zi * zi
    return dr * zr, di * zi


def _rde_err(zr, zi, sr_row, si_row, ncode):
    # sr_row holds [codes, partitions] (reference layout, real parts);
    # index the codebook by counting partitions below the squared radius
    sq = zr * zr + zi * zi
    parts = sr_row[ncode:]
    idx = jnp.sum((sq > parts).astype(jnp.int32))
    r = sr_row[idx]
    d = r - sq
    return d * zr, d * zi


_ERRFNS = {"cma": _cma_err, "sgncma": _cma_err, "mcma": _mcma_err, "rde": _rde_err}


@partial(jax.jit, static_argnames=("TrSyms", "Niter", "os", "method", "adaptive",
                                   "interpret"))
def train_equaliser_pallas(E, TrSyms, Niter, os, mu, wx, symbols, method,
                           adaptive=False, real_valued=False, interpret=False):
    """Sequential LMS training as a single fused Pallas kernel.

    Same contract as train_equaliser_seq; returns (err_zeros, wx_out, mu_out).
    """
    assert method in PALLAS_METHODS, \
        "pallas backend implements %s" % (PALLAS_METHODS,)
    E = jnp.asarray(E)
    wx = jnp.asarray(wx)
    symbols = jnp.asarray(symbols)
    nmodes, L = E.shape
    nout, _, ntaps = wx.shape
    ncode = (symbols.shape[-1] + 1) // 2 if method == "rde" else symbols.shape[-1]
    rdtype = jnp.float32
    mu0 = jnp.full((nout, 1), mu, dtype=rdtype)
    errfn = _ERRFNS[method]
    TrSyms = int(TrSyms)
    Niter = int(Niter)
    os = int(os)
    adaptive = bool(adaptive)

    def kernel(er_ref, ei_ref, sr_ref, si_ref, mu_ref, wr0_ref, wi0_ref,
               wr_out, wi_out, mu_out):
        wr_out[:] = wr0_ref[:]
        wi_out[:] = wi0_ref[:]
        mu_out[:] = mu_ref[:]

        def step(i, ep):
            tr = i % TrSyms
            xr = er_ref[:, pl.ds(tr * os, ntaps)]  # (nmodes, ntaps)
            xi = ei_ref[:, pl.ds(tr * os, ntaps)]
            new_ep = ep
            for m in range(nout):  # static unroll over output modes
                wr = wr_out[m]
                wi = wi_out[m]
                mu_c = mu_out[m, 0]
                # Xest = sum w * X (complex, split planes)
                zr = jnp.sum(wr * xr - wi * xi)
                zi = jnp.sum(wr * xi + wi * xr)
                er, ei2 = errfn(zr, zi, sr_ref[m], si_ref[m], ncode)
                # w += mu * err * conj(X)
                wr_out[m] = wr + mu_c * (er * xr + ei2 * xi)
                wi_out[m] = wi + mu_c * (ei2 * xr - er * xi)
                if adaptive:
                    keep = jnp.logical_and(er * ep[m, 0] > 0, ei2 * ep[m, 1] > 0)
                    e2 = er * er + ei2 * ei2
                    mu_new = jnp.where(keep, mu_c, mu_c / (1 + mu_c * e2))
                    mu_out[m, 0] = jnp.where(tr > 0, mu_new, mu_c)
                new_ep = new_ep.at[m, 0].set(er).at[m, 1].set(ei2)
            return new_ep

        lax.fori_loop(0, Niter * TrSyms, step, jnp.zeros((nout, 2), dtype=rdtype))

    wr, wi, mu_f = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((nout, nmodes, ntaps), rdtype),
            jax.ShapeDtypeStruct((nout, nmodes, ntaps), rdtype),
            jax.ShapeDtypeStruct((nout, 1), rdtype),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 3,
        interpret=interpret,
    )(E.real.astype(rdtype), E.imag.astype(rdtype),
      symbols.real.astype(rdtype), symbols.imag.astype(rdtype), mu0,
      wx.real.astype(rdtype), wx.imag.astype(rdtype))
    wout = (wr + 1j * wi).astype(E.dtype)
    err = jnp.zeros((nout, TrSyms * Niter), dtype=E.dtype)
    return err, wout, mu_f[:, 0]

"""Split the BPS Pallas kernel cost: distance calc vs window cumsum vs argmin.

Variants (same I/O shapes, T tile):
  dist    : rotate+decide+dist, then mean over angles (no window, no argmin)
  distmin : rotate+decide+dist + argmin (no window)
  win     : full kernel minus argmin (mean of windowed sums)
  full    : production kernel path
  winlog  : windowed sum via 28=16+8+4 decomposition instead of full cumsum
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/qampy_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tools.microbench import timeit


def make_variant(variant, T, N2, grid_const, A):
    d0, lo, n = grid_const
    inv_d0 = 1.0 / d0

    def kernel(er_ref, ei_ref, cos_ref, sin_ref, out_ref, tail_ref):
        c = pl.program_id(1)

        @pl.when(c == 0)
        def _():
            tail_ref[:] = jnp.zeros_like(tail_ref)

        er = er_ref[0, 0]
        ei = ei_ref[0, 0]
        ca = cos_ref[:]
        sa = sin_ref[:]
        zr = er * ca - ei * sa
        zi = er * sa + ei * ca
        if variant == "rotonly":
            out_ref[:] = jnp.sum(zr + zi, axis=0).astype(jnp.int32)[None, None, None, :]
            return
        ur = (zr - lo) * inv_d0
        ui = (zi - lo) * inv_d0
        if variant == "dist_floor":
            rr = jnp.floor(ur + 0.5)
            ri = jnp.floor(ui + 0.5)
            fr = ur - jnp.clip(rr, 0, n - 1)
            fi = ui - jnp.clip(ri, 0, n - 1)
            out_ref[:] = jnp.sum(fr * fr + fi * fi, axis=0).astype(jnp.int32)[None, None, None, :]
            return
        if variant == "dist_noclip":
            fr = ur - jnp.round(ur)
            fi = ui - jnp.round(ui)
            out_ref[:] = jnp.sum(fr * fr + fi * fi, axis=0).astype(jnp.int32)[None, None, None, :]
            return
        if variant == "dist_floor_noclip":
            fr = ur - jnp.floor(ur + 0.5)
            fi = ui - jnp.floor(ui + 0.5)
            out_ref[:] = jnp.sum(fr * fr + fi * fi, axis=0).astype(jnp.int32)[None, None, None, :]
            return
        fr = ur - jnp.clip(jnp.round(ur), 0, n - 1)
        fi = ui - jnp.clip(jnp.round(ui), 0, n - 1)
        dist = fr * fr + fi * fi
        if variant == "dist":
            out_ref[:] = jnp.sum(dist, axis=0).astype(jnp.int32)[None, None, None, :]
            return
        if variant == "distmin":
            out_ref[:] = jnp.argmin(dist, axis=0).astype(jnp.int32)[None, None, None, :]
            return
        if variant == "winlog":
            # window sum of 28 = 16 + 8 + 4 via doubling partial sums
            buf = jnp.concatenate([tail_ref[:], dist], axis=1)  # (A, N2+T)
            s = buf
            sums = {1: buf}
            w = 1
            while w < 16:
                s = s + jnp.concatenate(
                    [jnp.zeros((A, w), s.dtype), s[:, : s.shape[1] - w]], axis=1)
                w *= 2
                sums[w] = s
            # win ending at lane i (in buf coords): s16[i] + s8[i-16] + s4[i-24]
            s16, s8, s4 = sums[16], sums[8], sums[4]
            win = (s16[:, N2:] + s8[:, N2 - 16: -16] + s4[:, N2 - 24: -24])
            out_ref[:] = jnp.argmin(win, axis=0).astype(jnp.int32)[None, None, None, :]
            tail_ref[:] = dist[:, T - N2:]
            return
        if variant == "win_sh1":
            # same op count as the cumsum but every shift is 1 lane: isolates
            # whether shift distance (tile crossing) drives the cost
            csum = dist
            for _ in range(11):
                csum = csum + jnp.concatenate(
                    [jnp.zeros((csum.shape[0], 1), csum.dtype), csum[:, : T - 1]],
                    axis=1)
            out_ref[:] = jnp.argmin(csum, axis=0).astype(jnp.int32)[None, None, None, :]
            tail_ref[:] = csum[:, T - N2:]
            return
        if variant == "win_roll":
            # full cumsum with pltpu.roll + iota mask instead of concat
            lane = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
            csum = dist
            sh = 1
            while sh < T:
                r = pltpu.roll(csum, shift=sh, axis=1)
                csum = csum + jnp.where(lane >= sh, r, 0.0)
                sh *= 2
            shifted = jnp.concatenate([-tail_ref[:], csum[:, : T - N2]], axis=1)
            win = csum - shifted
            out_ref[:] = jnp.argmin(win, axis=0).astype(jnp.int32)[None, None, None, :]
            tail_ref[:] = csum[:, T - 1: T] - csum[:, T - N2:]
            return
        if variant == "win_dec":
            # decomposed 28 = 16+8+4 window with max shift 24, all buffers
            # (A, T) aligned; boundary columns fixed from the tail scratch
            def sh_add(x, sh):
                return x + jnp.concatenate(
                    [jnp.zeros((x.shape[0], sh), x.dtype), x[:, : T - sh]], axis=1)
            s2 = sh_add(dist, 1)
            s4 = sh_add(s2, 2)      # 4-wide sums
            t8 = sh_add(s4, 4)      # 8-wide
            t16 = sh_add(t8, 8)     # 16-wide
            win = t16
            win = win + jnp.concatenate(
                [jnp.zeros((A, 16), win.dtype), t8[:, : T - 16]], axis=1)
            win = win + jnp.concatenate(
                [jnp.zeros((A, 24), win.dtype), s4[:, : T - 24]], axis=1)
            # tail_ref[:, k] = suffix sum of prev-tile dist for lookback k
            win = win + jnp.concatenate(
                [tail_ref[:], jnp.zeros((A, T - N2), win.dtype)], axis=1)
            out_ref[:] = jnp.argmin(win, axis=0).astype(jnp.int32)[None, None, None, :]
            # rebuild suffix sums of the last N2 dist columns for next tile
            tail_ref[:] = dist[:, T - N2:]
            return
        csum = dist
        sh = 1
        while sh < T:
            csum = csum + jnp.concatenate(
                [jnp.zeros((csum.shape[0], sh), csum.dtype), csum[:, : T - sh]],
                axis=1)
            sh *= 2
        shifted = jnp.concatenate([-tail_ref[:], csum[:, : T - N2]], axis=1)
        win = csum - shifted
        if variant == "win":
            out_ref[:] = jnp.sum(win, axis=0).astype(jnp.int32)[None, None, None, :]
        else:
            out_ref[:] = jnp.argmin(win, axis=0).astype(jnp.int32)[None, None, None, :]
        tail_ref[:] = csum[:, T - 1: T] - csum[:, T - N2:]

    return kernel


def build(variant, T, N, grid, angles_h):
    A = angles_h.size
    N2 = 2 * N
    tail_shape = (A, N2)

    def f(E):
        nmodes, L = E.shape
        pad = (-L) % T
        Lp = L + pad
        nchunks = Lp // T
        er = jnp.pad(E.real.astype(jnp.float32), ((0, 0), (0, pad))).reshape(nmodes, nchunks, 1, T)
        ei = jnp.pad(E.imag.astype(jnp.float32), ((0, 0), (0, pad))).reshape(nmodes, nchunks, 1, T)
        ang = angles_h.reshape(A, 1)
        cos_a = jnp.asarray(np.cos(ang))
        sin_a = jnp.asarray(np.sin(ang))
        kernel = make_variant(variant, T, N2, grid, A)
        raw = pl.pallas_call(
            kernel,
            grid=(nmodes, nchunks),
            in_specs=[
                pl.BlockSpec((1, 1, 1, T), lambda m, c: (m, c, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 1, T), lambda m, c: (m, c, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((A, 1), lambda m, c: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((A, 1), lambda m, c: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, 1, T), lambda m, c: (m, c, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nmodes, nchunks, 1, T), jnp.int32),
            scratch_shapes=[pltpu.VMEM(tail_shape, jnp.float32)],
        )(er, ei, cos_a, sin_a)
        return jnp.mean(raw.astype(jnp.float32))

    return f


def main():
    from bench import make_tx
    from qampy_tpu.ops import phase as phops
    from qampy_tpu.theory import cal_symbols_qam, cal_scaling_factor_qam

    E_np, _, _ = make_tx(2 ** 20)
    Er = jax.device_put(np.ascontiguousarray(E_np.real).astype(np.float32))
    Ei = jax.device_put(np.ascontiguousarray(E_np.imag).astype(np.float32))
    import os as _os
    M, A, N = 64, int(_os.environ.get("BPS_A", 64)), 14
    const = (cal_symbols_qam(M) / np.sqrt(cal_scaling_factor_qam(M))).astype(np.complex64)
    grid = phops.detect_square_grid(const)
    angles_h = np.linspace(-np.pi / 4, np.pi / 4, A, endpoint=False, dtype=np.float32)
    T = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    variants = sys.argv[2:] or ["dist", "distmin", "win", "full", "winlog"]
    for v in variants:
        timeit(build(v, T, N, grid, angles_h), Er, Ei, "bps[%s] T=%d" % (v, T))


if __name__ == "__main__":
    main()

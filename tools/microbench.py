"""Micro-benchmark single ops on the TPU with the fetch-differenced protocol.

Usage: python tools/microbench.py <op> [opts...]
Ops: bps <T>..., filter, hbm
The relay is fully async and memoizes (program, inputs): time two programs
chaining REPS_A/REPS_B data-dependent executions, each fetch-timed with a
fresh scalar seed, and difference.
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/qampy_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

REPS_A, REPS_B = 4, 24


def timeit(build, Er, Ei, label):
    """build(E)->scalar f32; returns per-rep ms via differenced fetch."""
    def make(reps):
        @jax.jit
        def timed(er, ei, s0):
            def body(i, carry):
                scale = (1 + 1e-6 * carry).astype(jnp.float32)
                return build(er * scale + 1j * (ei * scale))
            return jax.lax.fori_loop(0, reps, body, s0)
        return timed

    tA, tB = make(REPS_A), make(REPS_B)
    np.asarray(tA(Er, Ei, jnp.float32(0.)))
    np.asarray(tB(Er, Ei, jnp.float32(0.5)))

    def run(f, seed):
        t0 = time.perf_counter()
        np.asarray(f(Er, Ei, jnp.float32(seed)))
        return time.perf_counter() - t0

    a = min(run(tA, 1.0), run(tA, 2.0))
    b = min(run(tB, 3.0), run(tB, 4.0))
    dt = max(b - a, 1e-9) / (REPS_B - REPS_A)
    print("%-40s %8.3f ms" % (label, dt * 1e3), flush=True)
    return dt


def main():
    from bench import make_tx
    from qampy_tpu.ops import equaliser as eqops
    from qampy_tpu.ops import phase as phops
    from qampy_tpu.theory import cal_symbols_qam, cal_scaling_factor_qam

    op = sys.argv[1]
    E_np, _, _ = make_tx(2 ** 20)
    Er = jax.device_put(np.ascontiguousarray(E_np.real).astype(np.float32))
    Ei = jax.device_put(np.ascontiguousarray(E_np.imag).astype(np.float32))
    M, Ntaps, os_, A, N = 64, 17, 2, 64, 14
    const = (cal_symbols_qam(M) / np.sqrt(cal_scaling_factor_qam(M))).astype(np.complex64)
    grid = phops.detect_square_grid(const)
    angles_h = np.linspace(-np.pi / 4, np.pi / 4, A, endpoint=False, dtype=np.float32)
    rng = np.random.default_rng(0)
    w_h = (rng.standard_normal((2, 2, Ntaps)) +
           1j * rng.standard_normal((2, 2, Ntaps))).astype(np.complex64) * 0.1

    if op == "hbm":
        timeit(lambda E: jnp.mean(jnp.abs(E)), Er, Ei, "hbm floor (read E)")
    elif op == "bps":
        from qampy_tpu.ops.phase_pallas import bps_idx_pallas
        for T in [int(x) for x in sys.argv[2:]] or [512, 1024, 2048, 4096]:
            timeit(lambda E, T=T: jnp.mean(
                bps_idx_pallas(E, angles_h, grid, N, T=T).astype(jnp.float32)),
                Er, Ei, "bps_idx_pallas T=%d" % T)
    elif op == "bpsbf16":
        from qampy_tpu.ops.phase_pallas import bps_idx_pallas
        for T in [int(x) for x in sys.argv[2:]] or [4096]:
            timeit(lambda E, T=T: jnp.mean(
                bps_idx_pallas(E, angles_h, grid, N, T=T,
                               win_dtype=jnp.bfloat16).astype(jnp.float32)),
                Er, Ei, "bps_idx_pallas bf16win T=%d" % T)
            timeit(lambda E, T=T: jnp.mean(
                bps_idx_pallas(E, angles_h, grid, N, T=T,
                               compute_dtype=jnp.bfloat16).astype(jnp.float32)),
                Er, Ei, "bps_idx_pallas bf16all T=%d" % T)
    elif op == "bpsA":
        from qampy_tpu.ops.phase_pallas import bps_idx_pallas
        import os as _os
        T = int(_os.environ.get("BPS_T", 2048))
        wd = jnp.bfloat16 if _os.environ.get("BPS_BF16") else None
        for A2 in [int(x) for x in sys.argv[2:]] or [8, 16, 32, 64]:
            ah = np.linspace(-np.pi / 4, np.pi / 4, A2, endpoint=False, dtype=np.float32)
            timeit(lambda E, ah=ah: jnp.mean(
                bps_idx_pallas(E, ah, grid, N, T=T,
                               win_dtype=wd).astype(jnp.float32)),
                Er, Ei, "bps_idx_pallas A=%d T=%d%s" % (
                    A2, T, " bf16" if wd else ""))
    elif op == "bps2":
        from qampy_tpu.ops.phase_pallas import bps_phase_twostage_pallas
        wd = jnp.bfloat16 if "bf16" in sys.argv[2:] else None
        for A1, B in [(16, 8), (32, 8), (16, 16)]:
            timeit(lambda E, A1=A1, B=B: jnp.mean(
                bps_phase_twostage_pallas(E, A1, B, grid, N, T=4096,
                                          win_dtype=wd)),
                Er, Ei, "bps_twostage_pallas %dx%d%s" % (
                    A1, B, " bf16" if wd else ""))
    elif op == "train":
        from qampy_tpu.ops.equaliser_pallas import train_equaliser_block_pallas
        from jax import lax
        symbols1 = eqops._reshape_symbols(None, "cma", M, np.complex64, 2)
        w0h = np.asarray(eqops._init_taps(Ntaps, 2, 2, np.complex64))
        trs, bs = 2 ** 15, 256

        def pregather_old(E):
            nmodes = E.shape[0]
            Ts = (trs // bs) * bs
            cols = [lax.slice(E, (0, t), (nmodes, t + (Ts - 1) * os_ + 1), (1, os_))
                    for t in range(Ntaps)]
            Xw = jnp.moveaxis(jnp.stack(cols, axis=-1), 0, 1)
            return jnp.mean(jnp.abs(Xw.real) + jnp.abs(Xw.imag))

        def pregather_new(E):
            nmodes = E.shape[0]
            Ts = (trs // bs) * bs
            cols = [lax.slice(E, (0, t), (nmodes, t + (Ts - 1) * os_ + 1), (1, os_))
                    for t in range(Ntaps)]
            Xw = jnp.concatenate(cols, axis=0)
            return jnp.mean(jnp.abs(Xw.real) + jnp.abs(Xw.imag))

        def pregather_phase(E):
            # phase-split first (2 contiguous strided slices), then ntaps
            # CONTIGUOUS slices of the phase planes
            nmodes = E.shape[0]
            Ts = (trs // bs) * bs
            ph = [E[:, p::os_] for p in range(os_)]
            cols = [lax.slice(ph[t % os_], (0, t // os_), (nmodes, t // os_ + Ts))
                    for t in range(Ntaps)]
            Xw = jnp.concatenate(cols, axis=0)
            return jnp.mean(jnp.abs(Xw.real) + jnp.abs(Xw.imag))

        def pregather_phase_prefix(E):
            # strided phase split restricted to the training prefix, then
            # contiguous tap slices
            nmodes = E.shape[0]
            Ts = (trs // bs) * bs
            W = Ts * os_ + Ntaps
            pre = lax.slice(E, (0, 0), (nmodes, W))
            ph = [lax.slice(pre, (0, p), (nmodes, W - ((W - p) % os_)), (1, os_))
                  for p in range(os_)]
            cols = [lax.slice(ph[t % os_], (0, t // os_), (nmodes, t // os_ + Ts))
                    for t in range(Ntaps)]
            Xw = jnp.concatenate(cols, axis=0)
            return jnp.mean(jnp.abs(Xw.real) + jnp.abs(Xw.imag))

        def pregather_mxu(E):
            # deinterleave the prefix with a one-hot MXU matmul, then
            # contiguous tap slices
            nmodes = E.shape[0]
            Ts = (trs // bs) * bs
            W = ((Ts * os_ + Ntaps) // 128 + 1) * 128
            pre = lax.slice(E, (0, 0), (nmodes, W)).reshape(nmodes, W // 128, 128)
            sel = np.zeros((128, 128), np.float32)
            for j in range(64):
                sel[2 * j, j] = 1.0
                sel[2 * j + 1, 64 + j] = 1.0
            selj = jnp.asarray(sel)

            def deint(x):
                r = jnp.dot(x, selj, precision=lax.Precision.HIGHEST)
                ev = r[:, :, :64].reshape(nmodes, -1)
                od = r[:, :, 64:].reshape(nmodes, -1)
                return ev, od

            eve, odd = deint(pre.real)
            evi, odi = deint(pre.imag)
            ph_r, ph_i = [eve, odd], [evi, odi]
            cols_r = [lax.slice(ph_r[t % os_], (0, t // os_), (nmodes, t // os_ + Ts))
                      for t in range(Ntaps)]
            cols_i = [lax.slice(ph_i[t % os_], (0, t // os_), (nmodes, t // os_ + Ts))
                      for t in range(Ntaps)]
            return (jnp.mean(jnp.abs(jnp.concatenate(cols_r, axis=0)))
                    + jnp.mean(jnp.abs(jnp.concatenate(cols_i, axis=0))))

        def slices_only(E):
            nmodes = E.shape[0]
            Ts = (trs // bs) * bs
            cols = [lax.slice(E, (0, t), (nmodes, t + (Ts - 1) * os_ + 1), (1, os_))
                    for t in range(Ntaps)]
            return sum(jnp.mean(jnp.abs(c.real)) for c in cols)

        timeit(pregather_new, Er, Ei, "pre-gather new (concat K,Ts)")
        timeit(pregather_phase_prefix, Er, Ei, "pre-gather phase prefix")
        timeit(pregather_mxu, Er, Ei, "pre-gather mxu deinterleave")
        timeit(slices_only, Er, Ei, "strided slices only")

        def train(E):
            w0 = jnp.asarray(w0h)
            _, w, _ = train_equaliser_block_pallas(
                E, trs, 1, os_, 1e-3, w0, symbols1, "cma", adaptive=True,
                block_size=bs)
            return jnp.mean(jnp.abs(w.real) + jnp.abs(w.imag))

        timeit(train, Er, Ei, "train cma full (pallas block)")
    elif op == "filterparts":
        from qampy_tpu.ops import equaliser as eqmod
        wj = np.asarray(w_h)

        def parts(stage):
            def f(E):
                planes = jnp.concatenate([E.real, E.imag], axis=0)
                wx = jnp.asarray(wj)
                Wr = wx.real.reshape(2, 2 * Ntaps)
                Wi = wx.imag.reshape(2, 2 * Ntaps)
                Wcat = jnp.concatenate([jnp.concatenate([Wr, -Wi], 1),
                                        jnp.concatenate([Wi, Wr], 1)], 0)
                P, L = planes.shape
                nop = 4
                G = 32
                Gos = G * os_
                nshift = 128 // Gos
                Lout = (L - Ntaps) // os_ + 1
                C = -(-Lout // G)
                Q = -(-C // nshift)
                padL = Q * 128 + 128
                planes = jnp.pad(planes, ((0, 0), (0, max(0, padL - L))))
                parts_ = [jax.lax.slice(planes, (0, r * Gos), (P, r * Gos + Q * 128)).reshape(P, Q, 128)
                          for r in range(nshift)]
                W3 = jnp.stack(parts_, axis=2).reshape(P, Q * nshift, 128)
                if stage == "w3":
                    return jnp.mean(W3)
                Wcat3 = Wcat.reshape(nop, P, Ntaps)
                Wpad = jnp.pad(Wcat3, ((0, 0), (0, 0), (0, 128 - Ntaps)))
                W2 = jnp.stack([jnp.roll(Wpad, g * os_, axis=-1) for g in range(G)],
                               axis=1).reshape(nop * G, P, 128).swapaxes(0, 1)
                res = jax.lax.dot_general(W2.astype(planes.dtype), W3,
                                          dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                                          precision=jax.lax.Precision.HIGH)
                out2 = jnp.sum(res, axis=0)
                if stage == "mm":
                    return jnp.mean(out2)
                out = out2.reshape(nop, G, -1).swapaxes(1, 2).reshape(nop, -1)[:, :Lout]
                return jnp.mean(out)
            return f

        for st in ("w3", "mm", "full"):
            timeit(parts(st), Er, Ei, "filter %s" % st)
    elif op == "iir":
        # serving-size IIR: sequential lax.scan recurrence vs the exact
        # parallel-prefix (associative scan) form (core/filter.py,
        # VERDICT r4 #7). 2^20 real samples, 4th-order Bessel sosfilt +
        # 2nd-order analog lsim.
        import scipy.signal as scisig
        from qampy_tpu.core import filter as cfilter
        sos = scisig.bessel(4, 0.2, 'low', norm='mag', output='sos', fs=2)

        def f_scan(E):
            # O(N) dependent steps: at 2^20 the scan runs for MINUTES on
            # TPU — time 2^17 and scale (the per-step cost is constant)
            return jnp.mean(jnp.abs(cfilter._sosfilt_scan(
                sos, E.real[:, :2 ** 17])))

        def f_assoc(E):
            return jnp.mean(jnp.abs(cfilter._sosfilt_assoc(sos, E.real)))
        timeit(f_assoc, Er, Ei, "sosfilt assoc-prefix 2^20")
        timeit(f_scan, Er, Ei, "sosfilt lax.scan 2^17 (x8 for 2^20)")
    elif op == "filter":
        def f(E):
            w = jnp.asarray(w_h)
            return jnp.mean(jnp.abs(eqops.apply_filter_to_signal(E, os_, w)))
        timeit(f, Er, Ei, "apply_filter_to_signal (xla)")
        try:
            from qampy_tpu.ops.equaliser_pallas import apply_filter_pallas
            def g(E):
                w = jnp.asarray(w_h)
                return jnp.mean(jnp.abs(apply_filter_pallas(E, os_, w)))
            timeit(g, Er, Ei, "apply_filter_pallas")
        except ImportError:
            pass


if __name__ == "__main__":
    main()

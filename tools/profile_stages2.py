"""Stage bisection of the all-Pallas (v3) flagship chain variant.

Same fetch-differenced protocol as tools/profile_stages.py.
Usage: python tools/profile_stages2.py [reps] [T_bps]
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/qampy_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from bench import make_tx
    from qampy_tpu.ops import equaliser as eqops
    from qampy_tpu.ops import equaliser_pallas as eqpal
    from qampy_tpu.ops import phase_pallas as phpal
    from qampy_tpu.ops import phase as phops
    from qampy_tpu.theory import cal_symbols_qam, cal_scaling_factor_qam

    REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    T_bps = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    trs, bs, Ntaps, os_, M, A, N = 2 ** 16, 256, 17, 2, 64, 64, 14
    E_np, _, _ = make_tx(2 ** 20)
    Er = jax.device_put(np.ascontiguousarray(E_np.real).astype(np.float32))
    Ei = jax.device_put(np.ascontiguousarray(E_np.imag).astype(np.float32))

    dtype = np.complex64
    symbols1 = eqops._reshape_symbols(None, "cma", M, dtype, 2)
    symbols2 = eqops._reshape_symbols(None, "rde", M, dtype, 2)
    const = (cal_symbols_qam(M) / np.sqrt(cal_scaling_factor_qam(M))).astype(dtype)
    grid = phops.detect_square_grid(const)
    w0h = np.asarray(eqops._init_taps(Ntaps, 2, 2, dtype))
    angles_h = np.linspace(-np.pi / 4, np.pi / 4, A, endpoint=False, dtype=np.float32)
    step_a, lo_a = float(np.pi / 2 / A), float(-np.pi / 4)

    def upto(stage):
        def f(E):
            w0 = jnp.asarray(w0h)
            if stage == 0:
                return jnp.mean(jnp.abs(E))
            _, w1, _ = eqpal.train_equaliser_block_pallas(
                E, trs, 1, os_, 1e-3, w0, symbols1, "cma", adaptive=True, block_size=bs)
            if stage == 1:
                return jnp.mean(jnp.abs(w1))
            _, w2, _ = eqpal.train_equaliser_block_pallas(
                E, trs, 1, os_, 1e-3, w1, symbols2, "rde", adaptive=True, block_size=bs)
            if stage == 2:
                return jnp.mean(jnp.abs(w2))
            Eeq = eqops.apply_filter_to_signal(E, os_, w2)
            if stage == 3:
                return jnp.mean(jnp.abs(Eeq))
            idx = phpal.bps_idx_pallas(Eeq, angles_h, grid, N, T=T_bps)
            if stage == 4:
                return jnp.mean(idx.astype(jnp.float32))
            ph = lo_a + step_a * idx.astype(jnp.float32)
            ph = jnp.unwrap(ph * 4, axis=-1) / 4
            out = Eeq * jnp.exp(1j * ph).astype(Eeq.dtype)
            return jnp.mean(jnp.abs(out))
        return f

    names = ["hbm floor", "train CMA (pallas)", "+train RDE (pallas)",
             "+apply_filter (mxu)", "+bps_idx (pallas T=%d)" % T_bps,
             "+affine/unwrap/derot"]
    RA, RB = 2, 2 + REPS

    def fetch_timed(f, seed):
        t0 = time.perf_counter()
        float(np.asarray(f(Er, Ei, jnp.float32(seed))))
        return time.perf_counter() - t0

    prev = 0.0
    for stage in range(6):
        body_fn = upto(stage)

        def make(reps):
            @jax.jit
            def timed(er, ei, s0):
                def body(i, carry):
                    scale = (1 + 1e-6 * carry).astype(jnp.float32)
                    return body_fn(er * scale + 1j * (ei * scale)).astype(jnp.float32)
                return jax.lax.fori_loop(0, reps, body, s0)
            return timed

        fA, fB = make(RA), make(RB)
        fetch_timed(fA, 0.0)
        fetch_timed(fB, 0.5)
        tA = min(fetch_timed(fA, 1.0), fetch_timed(fA, 2.0))
        tB = min(fetch_timed(fB, 3.0), fetch_timed(fB, 4.0))
        dt = max(tB - tA, 0.0) / (RB - RA)
        print("%-26s %8.2f ms  (delta %+7.2f ms)" %
              (names[stage], dt * 1e3, (dt - prev) * 1e3), flush=True)
        prev = dt


if __name__ == "__main__":
    main()

"""A/B timing of flagship-chain variants on the real TPU.

Cumulative variants:
  v0: current flagship (XLA block trainer, XLA conv filter, XLA BPS+gather)
  v1: v0 with Pallas fused BPS + affine angle select (no gather)
  v2: v1 with Pallas fused filter
  v3: v2 with Pallas fused block trainer

Usage: python tools/ab_chain.py [reps] [variants...]
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def build_variant(name, trs=2 ** 16, bs=256, Ntaps=17, os_=2, M=64, A=64, N=14):
    import jax
    import jax.numpy as jnp
    from qampy_tpu.ops import equaliser as eqops
    from qampy_tpu.ops import phase as phops
    from qampy_tpu.ops import equaliser_pallas as eqpal
    from qampy_tpu.ops import phase_pallas as phpal
    from qampy_tpu.theory import cal_symbols_qam, cal_scaling_factor_qam

    dtype = np.complex64
    symbols1 = eqops._reshape_symbols(None, "cma", M, dtype, 2)
    symbols2 = eqops._reshape_symbols(None, "rde", M, dtype, 2)
    const = (cal_symbols_qam(M) / np.sqrt(cal_scaling_factor_qam(M))).astype(dtype)
    grid = phops.detect_square_grid(const)
    w0h = np.asarray(eqops._init_taps(Ntaps, 2, 2, dtype))
    angles_h = np.linspace(-np.pi / 4, np.pi / 4, A, endpoint=False,
                           dtype=np.float32)
    step, lo = float(np.pi / 2 / A), float(-np.pi / 4)

    pal_bps = name in ("v1", "v2", "v3")
    pal_train = name in ("v3",)

    def forward(E):
        w0 = jnp.asarray(w0h)
        train = (eqpal.train_equaliser_block_pallas if pal_train
                 else eqops.train_equaliser_block)
        _, w1, _ = train(E, trs, 1, os_, 1e-3, w0, symbols1, "cma",
                         adaptive=True, block_size=bs)
        _, w2, _ = train(E, trs, 1, os_, 1e-3, w1, symbols2, "rde",
                         adaptive=True, block_size=bs)
        Eeq = eqops.apply_filter_to_signal(E, os_, w2)  # MXU formulation
        if pal_bps:
            idx = phpal.bps_idx_pallas(Eeq, angles_h, grid, N)
            ph = lo + step * idx.astype(jnp.float32)
        else:
            ang2 = jnp.asarray(angles_h).reshape(1, -1)
            idx = jax.vmap(lambda e: phops.bps_idx(e, ang2, jnp.asarray(const),
                                                   N, grid=grid))(Eeq)
            ph = jax.vmap(lambda i: phops.select_angles(ang2, i))(idx)
        ph = jnp.unwrap(ph * 4, axis=-1) / 4
        return Eeq * jnp.exp(1j * ph).astype(Eeq.dtype)

    return forward


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/qampy_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from bench import make_tx

    REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    variants = sys.argv[2:] or ["v0", "v1", "v2", "v3"]
    E_np, syms_np, _ = make_tx(2 ** 20)
    Er = jax.device_put(np.ascontiguousarray(E_np.real).astype(np.float32))
    Ei = jax.device_put(np.ascontiguousarray(E_np.imag).astype(np.float32))
    RA, RB = 2, 2 + REPS

    def fetch_timed(f, seed):
        t0 = time.perf_counter()
        float(np.asarray(f(Er, Ei, jnp.float32(seed))))
        return time.perf_counter() - t0

    for name in variants:
        body_fn = build_variant(name)

        def make(reps):
            @jax.jit
            def timed(er, ei, s0):
                def body(i, carry):
                    scale = (1 + 1e-6 * carry).astype(jnp.float32)
                    out = body_fn(er * scale + 1j * (ei * scale))
                    return jnp.mean(jnp.abs(out)).astype(jnp.float32)
                return jax.lax.fori_loop(0, reps, body, s0)
            return timed

        fA, fB = make(RA), make(RB)
        try:
            fetch_timed(fA, 0.0)
            fetch_timed(fB, 0.5)
            tA = min(fetch_timed(fA, 1.0), fetch_timed(fA, 2.0))
            tB = min(fetch_timed(fB, 3.0), fetch_timed(fB, 4.0))
        except Exception as e:
            print("%-4s FAILED: %s" % (name, str(e)[:200]), flush=True)
            continue
        dt = max(tB - tA, 1e-9) / (RB - RA)
        print("%-4s %8.2f ms  -> %7.1f Msym/s" %
              (name, dt * 1e3, 2 ** 21 / dt / 1e6), flush=True)


if __name__ == "__main__":
    main()

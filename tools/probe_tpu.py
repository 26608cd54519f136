"""Probe which stage of the flagship chain the TPU backend rejects.

Runs each stage of the bench chain separately under jit on the real chip,
reporting ok/fail per stage. Used to localise axon-tunnel UNIMPLEMENTED
failures.
"""
import sys
import time
import traceback

import numpy as np

sys.path.insert(0, ".")


def probe(name, fn):
    t0 = time.perf_counter()
    try:
        import jax
        r = jax.block_until_ready(fn())
        print("%-28s ok   %6.1fs" % (name, time.perf_counter() - t0), flush=True)
        return True
    except Exception as e:
        msg = str(e).splitlines()[0][:120] if str(e) else type(e).__name__
        print("%-28s FAIL %6.1fs %s" % (name, time.perf_counter() - t0, msg), flush=True)
        return False


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/qampy_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from qampy_tpu.ops import equaliser as eqops
    from qampy_tpu.ops import phase as phops
    from qampy_tpu.theory import cal_symbols_qam, cal_scaling_factor_qam

    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    rng = np.random.default_rng(0)
    L = 2 ** 20 * 2
    E_np = (rng.standard_normal((2, L)) + 1j * rng.standard_normal((2, L))).astype(np.complex64)
    dtype = np.complex64
    M = 64
    Ntaps, os = 17, 2
    symbols1 = eqops._reshape_symbols(None, "cma", M, dtype, 2)
    symbols2 = eqops._reshape_symbols(None, "rde", M, dtype, 2)
    const = (cal_symbols_qam(M) / np.sqrt(cal_scaling_factor_qam(M))).astype(dtype)
    grid = phops.detect_square_grid(const)
    w0 = np.asarray(eqops._init_taps(Ntaps, 2, 2, dtype))
    trs = 2 ** 16

    probe("trivial", lambda: jax.jit(lambda: jnp.zeros(8, jnp.float32) + 1)())
    E = jax.device_put(E_np)
    probe("h2d+abs", lambda: jax.jit(lambda e: jnp.mean(jnp.abs(e)))(E))

    if which in ("all", "train"):
        f = jax.jit(lambda e: eqops.train_equaliser_block(
            e, trs, 1, os, 1e-3, jnp.asarray(w0), jnp.asarray(symbols1), "cma",
            adaptive=True, block_size=256)[1])
        probe("train_block cma", lambda: f(E))
        f2 = jax.jit(lambda e: eqops.train_equaliser_block(
            e, trs, 1, os, 1e-3, jnp.asarray(w0), jnp.asarray(symbols2), "rde",
            adaptive=True, block_size=256)[1])
        probe("train_block rde", lambda: f2(E))
    if which in ("all", "filter"):
        f3 = jax.jit(lambda e: eqops.apply_filter_to_signal(e, os, jnp.asarray(w0)))
        probe("apply_filter", lambda: f3(E))
    if which in ("all", "bps"):
        angles = np.linspace(-np.pi / 4, np.pi / 4, 64, endpoint=False,
                             dtype=np.float32).reshape(1, -1)

        def bps_fn(e):
            Eeq = e[:, ::os][:, :2 ** 20]
            idx = jax.vmap(lambda x: phops.bps_idx(x, jnp.asarray(angles), jnp.asarray(const),
                                                   14, grid=grid))(Eeq)
            return idx

        probe("bps_idx", lambda: jax.jit(bps_fn)(E))

        def unwrap_fn(e):
            Eeq = e[:, ::os][:, :2 ** 20]
            idx = jax.vmap(lambda x: phops.bps_idx(x, jnp.asarray(angles), jnp.asarray(const),
                                                   14, grid=grid))(Eeq)
            ph = jax.vmap(lambda i: phops.select_angles(jnp.asarray(angles), i))(idx)
            ph = jnp.unwrap(ph * 4, axis=-1) / 4
            return jnp.mean(ph)

        probe("bps+unwrap", lambda: jax.jit(unwrap_fn)(E))
    if which in ("all", "pallas"):
        host_angles = np.linspace(-np.pi / 4, np.pi / 4, 64, endpoint=False,
                                  dtype=np.float32)
        from qampy_tpu.ops.phase_pallas import bps_idx_pallas

        def pl_fn(e):
            Eeq = e[:, ::os][:, :2 ** 20]
            return bps_idx_pallas(Eeq, host_angles, grid, 14)

        probe("bps_pallas", lambda: jax.jit(pl_fn)(E))
    if which in ("all", "chain"):
        from __graft_entry__ import _flagship_fn
        fwd = _flagship_fn(M=64, Ntaps=17, os=2, bps_angles=64, bps_N=14,
                           block_size=256, TrSyms=trs)
        probe("full chain", lambda: jax.jit(fwd)(E))


if __name__ == "__main__":
    main()

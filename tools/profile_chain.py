"""Per-stage timing of the flagship RX chain on the current default device.

Times each stage of the dual-pol 64-QAM CMA->RDE->BPS chain separately
(training, filter application, BPS distance+select, unwrap/derotate) so
optimisation effort goes where the time is. Uses the same chained-execution
timing discipline as bench.py (async dispatch / memoization safe).

Tunnel rules (see bench.py): complex arrays never cross host<->device —
the TX signal ships as real planes and is combined on device; complex
intermediates (taps, equalised signal) are produced by device executions
and passed to later stages as jit *arguments*, never closure constants.

Usage: python tools/profile_chain.py [--trs 65536] [--bs 256] [--nsym 20]
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timeit(fn, *args, reps=5, label=""):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chained(s0, *a):
        # each iteration's input depends on the previous iteration's output
        # (scale the first array arg by 1+1e-6*carry) so XLA can neither
        # dead-code-eliminate the stage nor hoist it out of the loop
        def body(i, carry):
            scale = 1 + 1e-6 * carry
            a0 = a[0] * scale.astype(a[0].real.dtype)
            out = fn(a0, *a[1:])
            leaves = [x for x in jax.tree_util.tree_leaves(out)
                      if hasattr(x, 'dtype')]
            acc = sum(jnp.mean(jnp.abs(l).astype(jnp.float32)) for l in leaves)
            return acc

        return jax.lax.fori_loop(0, reps, body, s0)

    jax.block_until_ready(chained(jnp.float32(0.), *args))  # compile+warm
    # a DIFFERENT s0 every call: the relay memoizes identical
    # (program, inputs) executions and replays them in ~0.1 ms
    dts = []
    for k in range(1, 4):
        t0 = time.perf_counter()
        jax.block_until_ready(chained(jnp.float32(k), *args))
        dts.append((time.perf_counter() - t0) / reps)
    dt = min(dts)
    print("%-28s %8.2f ms" % (label, dt * 1e3), flush=True)
    return dt


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/qampy_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from bench import make_tx
    from qampy_tpu.ops import equaliser as eqops
    from qampy_tpu.ops import phase as phops
    from qampy_tpu.theory import cal_symbols_qam, cal_scaling_factor_qam

    def arg(flag, default):
        return int(sys.argv[sys.argv.index(flag) + 1]) if flag in sys.argv else default

    trs = arg("--trs", 2 ** 16)
    bs = arg("--bs", 256)
    nsym = 2 ** arg("--nsym", 20)
    Ntaps, os_, M = 17, 2, 64
    print("devices:", jax.devices(), file=sys.stderr)
    E_np, syms_np, const_np = make_tx(nsym)
    Er = jax.device_put(np.ascontiguousarray(E_np.real).astype(np.float32))
    Ei = jax.device_put(np.ascontiguousarray(E_np.imag).astype(np.float32))
    E = jax.block_until_ready(jax.jit(lambda a, b: a + 1j * b)(Er, Ei))

    dtype = np.complex64
    symbols1 = eqops._reshape_symbols(None, "cma", M, dtype, 2)
    symbols2 = eqops._reshape_symbols(None, "rde", M, dtype, 2)
    const = (cal_symbols_qam(M) / np.sqrt(cal_scaling_factor_qam(M))).astype(dtype)
    grid = phops.detect_square_grid(const)
    w0 = np.asarray(eqops._init_taps(Ntaps, 2, 2, dtype))

    def train1(e):
        return eqops.train_equaliser_block(e, trs, 1, os_, 1e-3, jnp.asarray(w0),
                                           symbols1, "cma", adaptive=True,
                                           block_size=bs)[1]

    def train2(e, w):
        return eqops.train_equaliser_block(e, trs, 1, os_, 1e-3, w, symbols2,
                                           "rde", adaptive=True, block_size=bs)[1]

    t_tr1 = timeit(train1, E, label="train CMA (trs=%d bs=%d)" % (trs, bs))
    w1 = jax.block_until_ready(jax.jit(train1)(E))
    t_tr2 = timeit(train2, E, w1, label="train RDE")
    w2 = jax.block_until_ready(jax.jit(train2)(E, w1))

    t_filt = timeit(lambda e, w: eqops.apply_filter_to_signal(e, os_, w),
                    E, w2, label="apply_filter (L=%d)" % E.shape[-1])
    Eeq = jax.block_until_ready(jax.jit(
        lambda e, w: eqops.apply_filter_to_signal(e, os_, w))(E, w2))

    angles = np.linspace(-np.pi / 4, np.pi / 4, 64, endpoint=False,
                         dtype=np.float32).reshape(1, -1)

    def bpsidx(e):
        return jax.vmap(lambda x: phops.bps_idx(x, jnp.asarray(angles),
                                                jnp.asarray(const), 14, grid=grid))(e)

    t_bpsidx = timeit(bpsidx, Eeq, label="bps_idx (A=64 N=14)")
    idx = jax.block_until_ready(jax.jit(bpsidx)(Eeq))

    def unwrap_derot(e, i):
        ph = jax.vmap(lambda ii: phops.select_angles(jnp.asarray(angles), ii))(i)
        ph = jnp.unwrap(ph * 4, axis=-1) / 4
        return e * jnp.exp(1j * ph).astype(e.dtype)

    t_unwrap = timeit(unwrap_derot, Eeq, idx, label="select+unwrap+derotate")

    total = t_tr1 + t_tr2 + t_filt + t_bpsidx + t_unwrap
    print("%-28s %8.2f ms  -> %.1f Msym/s" %
          ("TOTAL", total * 1e3, nsym * 2 / total / 1e6))


if __name__ == "__main__":
    main()

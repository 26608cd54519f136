"""Ground-truth timing: is block_until_ready real on this tunnel?

1. A chained matmul workload with a known FLOP floor.
2. The flagship chain timed via full d2h fetch (execution must dominate).
"""
import sys, time
import numpy as np
sys.path.insert(0, ".")
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/qampy_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

step = sys.argv[1]
if step == "mm":
    A = jax.device_put(np.random.default_rng(0).standard_normal((4096, 4096)).astype(np.float32))
    N = 100
    @jax.jit
    def mm(a, s0):
        def body(i, c):
            b = a * (1 + 1e-9 * c)
            return jnp.mean(b @ b)
        return jax.lax.fori_loop(0, N, body, s0)
    jax.block_until_ready(mm(A, jnp.float32(0)))
    for k in (1, 2):
        t0 = time.perf_counter()
        jax.block_until_ready(mm(A, jnp.float32(k)))
        t_block = time.perf_counter() - t0
        print("mm block_until_ready: %.1f ms (floor ~200-400ms @f32 peak)" % (t_block*1e3), flush=True)
    t0 = time.perf_counter()
    v = float(np.asarray(mm(A, jnp.float32(3))))
    print("mm fetch-timed: %.1f ms (val %.3f)" % ((time.perf_counter()-t0)*1e3, v), flush=True)
elif step == "chain":
    from bench import make_tx
    from __graft_entry__ import _flagship_fn
    E_np, _, _ = make_tx(2 ** 20)
    Er = jax.device_put(np.ascontiguousarray(E_np.real).astype(np.float32))
    Ei = jax.device_put(np.ascontiguousarray(E_np.imag).astype(np.float32))
    fwd_c = _flagship_fn(M=64, Ntaps=17, os=2, bps_angles=64, bps_N=14,
                         block_size=256, TrSyms=65536)
    for REPS in (2, 16):
        @jax.jit
        def timed(er, ei, s0):
            def body(i, carry):
                scale = (1 + 1e-6 * carry).astype(jnp.float32)
                o = fwd_c(er * scale + 1j * (ei * scale))
                return jnp.mean(jnp.abs(o)).astype(jnp.float32)
            return jax.lax.fori_loop(0, REPS, body, s0)
        jax.block_until_ready(timed(Er, Ei, jnp.float32(0.)))
        t0 = time.perf_counter()
        v = float(np.asarray(timed(Er, Ei, jnp.float32(1.))))
        t = time.perf_counter() - t0
        print("chain REPS=%d fetch-timed total %.1f ms (val %.4f)" % (REPS, t*1e3, v), flush=True)

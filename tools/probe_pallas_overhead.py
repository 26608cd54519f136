"""Measure Pallas per-grid-step overhead: trivial kernels over the same data.

Variants: copy kernel with (1,1,1,T) blocks vs (1,1,R,T) packed blocks, and
an argmin-only kernel (A rows in, 1 row out) to isolate the reduce+write.
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


def build_copy(T, R):
    def f(E):
        x = E.real.astype(jnp.float32)
        nmodes, L = x.shape
        pad = (-L) % (R * T)
        Lp = L + pad
        nch = Lp // (R * T)
        xr = jnp.pad(x, ((0, 0), (0, pad))).reshape(nmodes, nch, R, T)

        def kernel(in_ref, out_ref):
            out_ref[:] = in_ref[:] * 2.0

        y = pl.pallas_call(
            kernel,
            grid=(nmodes, nch),
            in_specs=[pl.BlockSpec((1, 1, R, T), lambda m, c: (m, c, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 1, R, T), lambda m, c: (m, c, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nmodes, nch, R, T), jnp.float32),
        )(xr)
        return jnp.mean(y)
    return f


def build_expand(T, A):
    """(1,T) in -> (A,T) broadcast work -> (1,T) argmin out, like BPS shape."""
    def f(E):
        x = E.real.astype(jnp.float32)
        nmodes, L = x.shape
        pad = (-L) % T
        nch = (L + pad) // T
        xr = jnp.pad(x, ((0, 0), (0, pad))).reshape(nmodes, nch, 1, T)
        col = jnp.arange(1, A + 1, dtype=jnp.float32).reshape(A, 1)

        def kernel(in_ref, col_ref, out_ref):
            v = in_ref[0, 0] * col_ref[:]  # (A, T) single op
            out_ref[:] = jnp.argmin(v, axis=0).astype(jnp.int32)[None, None, None, :]

        y = pl.pallas_call(
            kernel,
            grid=(nmodes, nch),
            in_specs=[pl.BlockSpec((1, 1, 1, T), lambda m, c: (m, c, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((A, 1), lambda m, c: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 1, 1, T), lambda m, c: (m, c, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nmodes, nch, 1, T), jnp.int32),
        )(xr, col)
        return jnp.mean(y.astype(jnp.float32))
    return f


def main():
    from bench import make_tx
    E_np, _, _ = make_tx(2 ** 20)
    Er = jax.device_put(np.ascontiguousarray(E_np.real).astype(np.float32))
    Ei = jax.device_put(np.ascontiguousarray(E_np.imag).astype(np.float32))
    for T, R in [(2048, 1), (2048, 8), (4096, 1), (16384, 1)]:
        timeit(build_copy(T, R), Er, Ei, "copy T=%d R=%d (%d steps)" % (T, R, 2 * 2**21 // (R*T)))
    for A in (8, 64):
        timeit(build_expand(2048, A), Er, Ei, "expand+argmin A=%d T=2048" % A)


if __name__ == "__main__":
    main()

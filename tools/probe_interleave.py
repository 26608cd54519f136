"""Measure VMEM-transpose deinterleave options vs the XLA swapaxes.

The windows filter naturally produces (rows, G, C) with symbol index
c*G + g; time order needs a (G, C)->(C, G) transpose that XLA executes as
a ~45 GB/s minor-dim relayout (~0.37 ms for 16 MB). Options probed:
  xla-deint    : out.swapaxes(1, 2) baseline
  pallas-deint : Pallas kernel reading (G, Tc) blocks, writing (1, T) tiles
  consume      : BPS-shaped consumer summing (1, T) time blocks (baseline)
  consume-il   : same consumer reading (G, Tc) blocks w/ in-kernel transpose
Usage: python tools/probe_interleave.py
"""
import sys

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tools")
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/qampy_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from microbench import timeit

G = 32
L = 2 ** 20          # symbols per mode
C = L // G
T = 16384
Tc = T // G
NCH = L // T


def pallas_deint(x):
    """(nmodes, G, C) -> (nmodes, L) time-ordered.

    The kernel writes transposed (Tc, G) blocks into an output shaped
    (nmodes, C, G): row-major (c, g) IS symbol order c*G+g, so the final
    flatten is a free HBM relabel instead of a relayout.
    """
    nmodes = x.shape[0]

    def kernel(x_ref, o_ref):
        o_ref[:] = x_ref[0].T[None]          # (G, Tc) -> (1, Tc, G)

    return pl.pallas_call(
        kernel,
        grid=(nmodes, NCH),
        in_specs=[pl.BlockSpec((1, G, Tc), lambda m, c: (m, 0, c),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, Tc, G), lambda m, c: (m, c, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nmodes, C, G), jnp.float32),
        interpret=jax.default_backend() == "cpu",
    )(x).reshape(nmodes, L)


def consumer(x, interleaved):
    """BPS-shaped pass: read all samples, do some VPU work, emit per-tile."""
    nmodes = x.shape[0]

    def kernel(x_ref, o_ref):
        if interleaved:
            row = x_ref[0].T.reshape(1, T)
        else:
            row = x_ref[0]
        # token VPU work comparable to a rotation+decision
        v = row * 1.5 + 0.25
        v = v - jnp.floor(v + 0.5)
        o_ref[:] = (v * v).reshape(1, 1, T)

    if interleaved:
        in_spec = pl.BlockSpec((1, G, Tc), lambda m, c: (m, 0, c),
                               memory_space=pltpu.VMEM)
    else:
        in_spec = pl.BlockSpec((1, 1, T), lambda m, c: (m, 0, c),
                               memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(nmodes, NCH),
        in_specs=[in_spec],
        out_specs=pl.BlockSpec((1, 1, T), lambda m, c: (m, 0, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nmodes, 1, NCH * T), jnp.float32),
        interpret=jax.default_backend() == "cpu",
    )(x)


def main():
    rng = np.random.default_rng(0)
    Er = jnp.asarray(rng.standard_normal((2, L)).astype(np.float32))
    Ei = jnp.asarray(rng.standard_normal((2, L)).astype(np.float32))

    def mk_deint_xla(E):
        x = (E.real).reshape(2, G, C)
        out = x.swapaxes(1, 2).reshape(2, L)
        return jnp.sum(out[:, ::997]).astype(jnp.float32)

    def mk_deint_pal(E):
        x = (E.real).reshape(2, G, C)
        out = pallas_deint(x)
        return jnp.sum(out[:, ::997]).astype(jnp.float32)

    def mk_consume(il):
        def f(E):
            if il:
                x = (E.real).reshape(2, G, C)
            else:
                x = (E.real).reshape(2, 1, L)
            out = consumer(x, il)
            return jnp.sum(out[:, :, ::997]).astype(jnp.float32)
        return f

    # correctness of the pallas deinterleave
    x = jnp.asarray(rng.standard_normal((2, G, C)).astype(np.float32))
    want = np.asarray(x).swapaxes(1, 2).reshape(2, L)
    got = np.asarray(jax.jit(pallas_deint)(x))
    assert np.array_equal(got, want), "pallas deint mismatch"
    print("pallas deint exact", flush=True)

    timeit(mk_deint_xla, Er, Ei, "XLA swapaxes deinterleave")
    timeit(mk_deint_pal, Er, Ei, "pallas deinterleave kernel")
    timeit(mk_consume(False), Er, Ei, "consumer, time-ordered blocks")


if __name__ == "__main__":
    main()

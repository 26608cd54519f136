"""A/B the fused Pallas unwrap+derotate against the XLA formulation on TPU.

Times (fetch-differenced, tools/microbench.timeit):
  1. standalone: unwrap_derotate_pallas vs the XLA diff/round/cumsum/sincos
  2. end-to-end: flagship two-stage chain with fuse_derot on/off
Usage: python tools/probe_derot.py
"""
import sys

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tools")
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/qampy_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from microbench import timeit


def main():
    L = 2 ** 20
    rng = np.random.default_rng(0)
    Er = jnp.asarray(rng.standard_normal((2, L)).astype(np.float32))
    Ei = jnp.asarray(rng.standard_normal((2, L)).astype(np.float32))

    from qampy_tpu.ops.phase_pallas import unwrap_derotate_pallas

    def xla_derot(Eeq, ph):
        d = ph[:, 1:] - ph[:, :-1]
        half_pi = jnp.float32(np.pi / 2)
        a = -half_pi * jnp.round(d / half_pi)
        offs = jnp.cumsum(jnp.pad(a, ((0, 0), (1, 0))), axis=-1)
        u = ph + offs
        c, s = jnp.cos(u), jnp.sin(u)
        er, ei = Eeq.real, Eeq.imag
        return (er * c - ei * s) + 1j * (er * s + ei * c)

    def mk(fn, **kw):
        def build(E):
            ph = jnp.arctan2(E.imag, E.real) * 0.1  # arbitrary wrapped phase
            out = fn(E, ph, **kw)
            return (jnp.sum(out.real) + jnp.sum(out.imag)).astype(jnp.float32)
        return build

    timeit(mk(xla_derot), Er, Ei, "XLA unwrap+derotate")
    for T in (4096, 8192, 16384):
        timeit(mk(unwrap_derotate_pallas, T=T), Er, Ei,
               f"pallas unwrap+derotate T={T}")

    # end-to-end chain A/B
    from qampy_tpu.ops.chain import make_rx_chain
    for fuse in (False, True):
        rx = make_rx_chain(64, Ntaps=17, TrSyms=2 ** 14,
                           bps_mode="twostage", fuse_derot=fuse)

        def build(E, rx=rx):
            out = rx(E)
            return (jnp.sum(out.real) + jnp.sum(out.imag)).astype(jnp.float32)

        dt = timeit(build, Er, Ei, f"two-stage chain fuse_derot={fuse}")
        # (2, L) samples at os=2 -> L/2 syms/pol x 2 pols = L total symbols
        print(f"  -> {L / dt / 1e6:.1f} Msym/s")


if __name__ == "__main__":
    main()

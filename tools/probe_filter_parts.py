"""Bisect the windows-batched filter's internal costs on TPU.

Variants (cumulative where sensible):
  full        : apply_filter_to_signal as shipped (bf16 matmul precision)
  no-recomb   : skip the final complex recombine
  no-deint    : additionally skip the (nop, G, C)->(nop, C, G) deinterleave
  no-psum     : raw dot_general result, no plane-sum (P contracted in-dot)
  pdot        : contract (P, K) jointly in ONE dot_general (no res+sum)
  pdot-deint  : pdot + deinterleave (candidate shipping layout)
Usage: python tools/probe_filter_parts.py
"""
import sys

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tools")
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/qampy_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from jax import lax

from microbench import timeit


def main():
    L = 2 ** 21
    os_, ntaps, nmodes = 2, 17, 2
    rng = np.random.default_rng(0)
    Er = jnp.asarray(rng.standard_normal((nmodes, L)).astype(np.float32))
    Ei = jnp.asarray(rng.standard_normal((nmodes, L)).astype(np.float32))
    wxy = (rng.standard_normal((nmodes, nmodes, ntaps)) +
           1j * rng.standard_normal((nmodes, nmodes, ntaps))).astype(np.complex64)

    from qampy_tpu.ops import equaliser as eqops

    def full(E):
        out = eqops.apply_filter_to_signal(E, os_, jnp.asarray(wxy),
                                           precision=lax.Precision.DEFAULT)
        return (jnp.sum(out.real) + jnp.sum(out.imag)).astype(jnp.float32)

    timeit(full, Er, Ei, "full apply_filter (shipped)")

    # re-create the internals of _apply_filter_windows with switchable tails
    Lout = (L - ntaps) // os_ + 1
    P = 2 * nmodes
    nop = 2 * nmodes
    # Karatsuba-free split: planes = [re0, re1, im0, im1]; Wcat rows follow
    # the same real-arithmetic stacking the shipped code uses; for timing
    # purposes exact weight values are irrelevant, only shapes/layout
    Wcat = jnp.asarray(rng.standard_normal((nop, P * ntaps)).astype(np.float32))
    G = 32
    Gos = G * os_
    nshift = 128 // Gos
    C = -(-Lout // G)
    Q = -(-C // nshift)
    padL = Q * 128 + 128

    def build_w3(planes):
        planes = jnp.pad(planes, ((0, 0), (0, max(0, padL - L))))
        parts = [
            lax.slice(planes, (0, r * Gos), (P, r * Gos + Q * 128)).reshape(P, Q, 128)
            for r in range(nshift)
        ]
        return jnp.stack(parts, axis=2).reshape(P, Q * nshift, 128)

    Wcat3 = Wcat.reshape(nop, P, ntaps)
    Wpad = jnp.pad(Wcat3, ((0, 0), (0, 0), (0, 128 - ntaps)))
    W2 = jnp.stack([jnp.roll(Wpad, g * os_, axis=-1) for g in range(G)],
                   axis=1).reshape(nop * G, P, 128).swapaxes(0, 1)

    def variant(mode):
        def f(E):
            planes = jnp.concatenate([E.real, E.imag], axis=0)
            W3 = build_w3(planes)
            if mode.startswith("pdot"):
                out2 = lax.dot_general(
                    W2.astype(jnp.bfloat16), W3.astype(jnp.bfloat16),
                    dimension_numbers=(((0, 2), (0, 2)), ((), ())),
                    preferred_element_type=jnp.float32)
            else:
                res = lax.dot_general(
                    W2.astype(jnp.bfloat16), W3.astype(jnp.bfloat16),
                    dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                if mode == "no-psum":
                    return jnp.sum(res[:, :, ::997]).astype(jnp.float32)
                out2 = jnp.sum(res, axis=0)
            if mode in ("no-deint",):
                return jnp.sum(out2[:, ::997]).astype(jnp.float32)
            if mode == "barrier":
                out2 = jax.lax.optimization_barrier(out2)
            if mode == "pal-deint":
                from probe_interleave import pallas_deint
                out = pallas_deint(out2.reshape(nop, G, -1))[:, :Lout]
                return jnp.sum(out[:, ::997]).astype(jnp.float32)
            out = out2.reshape(nop, G, -1).swapaxes(1, 2).reshape(nop, -1)[:, :Lout]
            if mode in ("no-recomb", "pdot-deint"):
                return jnp.sum(out[:, ::997]).astype(jnp.float32)
            res2 = (out[:nmodes] + 1j * out[nmodes:])
            return (jnp.sum(res2.real) + jnp.sum(res2.imag)).astype(jnp.float32)
        return f

    for mode in ("recomb", "no-deint", "barrier", "pal-deint"):
        timeit(variant(mode), Er, Ei, f"windows filter [{mode}]")


if __name__ == "__main__":
    main()

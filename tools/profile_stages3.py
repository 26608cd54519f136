"""Cumulative stage bisection of the CURRENT flagship chain (two-stage BPS,
pallas filter, fused derotate) on the real TPU.

Stages: 0 input | 1 +train1 | 2 +train2 | 3 +filter | 4 +coarseBPS |
5 +fineBPS | 6 full (fused derotate)
Usage: python tools/profile_stages3.py
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
from qampy_tpu.ops import equaliser as eqops
from qampy_tpu.ops import phase as phops
from qampy_tpu.theory import cal_symbols_qam, cal_scaling_factor_qam


def main():
    L = 2 ** 21
    M, Ntaps, os_, A, N, bs, trs = 64, 17, 2, 64, 14, 256, 2 ** 14
    dtype = np.complex64
    rng = np.random.default_rng(0)
    Er = jnp.asarray(rng.standard_normal((2, L)).astype(np.float32))
    Ei = jnp.asarray(rng.standard_normal((2, L)).astype(np.float32))

    symbols1 = eqops._reshape_symbols(None, "mcma", M, dtype, 2)
    symbols2 = eqops._reshape_symbols(None, "mddma", M, dtype, 2)
    const = (cal_symbols_qam(M) / np.sqrt(cal_scaling_factor_qam(M))).astype(dtype)
    grid = phops.detect_square_grid(const)
    w0h = np.asarray(eqops._init_taps(Ntaps, 2, 2, dtype))
    A1 = 16  # coarse angles in twostage mode (bps_angles // 4)
    coarse = np.linspace(-np.pi / 4, np.pi / 4, A1, endpoint=False,
                         dtype=np.float32)

    from qampy_tpu.ops.equaliser_pallas import (train_equaliser_block_pallas,
                                                apply_filter_pallas)
    from qampy_tpu.ops.phase_pallas import (bps_idx_pallas,
                                            bps_phase_twostage_pallas,
                                            unwrap_derotate_pallas)

    def upto(stage):
        def f(E):
            if stage == 0:
                return jnp.sum(E.real[:, ::997]).astype(jnp.float32)
            w0 = jnp.asarray(w0h)
            _, w1, _ = train_equaliser_block_pallas(
                E, trs, 1, os_, 1.9e-3, w0, symbols1, "mcma", adaptive=True,
                block_size=bs)
            if stage == 1:
                return jnp.sum(jnp.abs(w1.real)).astype(jnp.float32)
            _, w2, _ = train_equaliser_block_pallas(
                E, trs, 1, os_, 1.9e-3, w1, symbols2, "mddma", adaptive=True,
                block_size=bs)
            if stage == 2:
                return jnp.sum(jnp.abs(w2.real)).astype(jnp.float32)
            Eeq = apply_filter_pallas(E, os_, w2)
            if stage == 3:
                return jnp.sum(Eeq.real[:, ::997]).astype(jnp.float32)
            if stage == 4:
                idx1 = bps_idx_pallas(Eeq, coarse, grid, 60, T=16384,
                                      win_dtype=jnp.bfloat16)
                return jnp.sum(idx1[:, ::997]).astype(jnp.float32)
            ph = bps_phase_twostage_pallas(Eeq, A1, 8, grid, N, T=16384,
                                           win_dtype=jnp.bfloat16, N1=60)
            if stage == 5:
                return jnp.sum(ph[:, ::997]).astype(jnp.float32)
            out = unwrap_derotate_pallas(Eeq, ph)
            return jnp.sum(out.real[:, ::997]).astype(jnp.float32)
        return f

    names = ["input", "+train mcma", "+train mddma", "+pallas filter",
             "+coarse BPS(16,N1=60)", "+fine BPS(8)", "full (fused derot)"]
    prev = 0.0
    for s, name in enumerate(names):
        dt = timeit(upto(s), Er, Ei, f"stage {s}: {name}")
        print(f"   delta {1e3 * (dt - prev):8.3f} ms", flush=True)
        prev = dt


if __name__ == "__main__":
    main()

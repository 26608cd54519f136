"""On-TPU Pallas-vs-XLA kernel equivalence sweep (VERDICT r4 #5).

The CI suite runs the same cases in Mosaic INTERPRET mode on CPU
(tests/test_pallas_backend.py); this tool runs them COMPILED on the real
chip, closing the interpret-only coverage hole (a Mosaic tile/carry bug
that shifts quality within an end-to-end SER gate would be invisible to
the bench tools). Same shapes and tolerances as the test file, including
the tile/carry boundary cases.

axon-tunnel discipline: every comparison runs ON DEVICE inside jit
(complex values never cross host<->device); only float32 metric scalars
are fetched. Emits one JSON line per case and a final summary line:

    python tools/tpu_kernelcheck.py            # all cases
    python tools/tpu_kernelcheck.py bps filter # subset
"""
import json
import sys

import numpy as np

sys.path.insert(0, ".")
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/qampy_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp  # noqa: E402

from qampy_tpu.ops import equaliser as eqops  # noqa: E402
from qampy_tpu.ops import phase as phops  # noqa: E402
from qampy_tpu.theory import cal_symbols_qam, cal_scaling_factor_qam  # noqa: E402

RESULTS = []

# Compiled-mode tolerance bands. The CI interpret suite pins 1e-4 tap /
# 1e-4 filter exactness; COMPILED on v5e both engines emulate f32
# matmuls with different bf16-pass depths (XLA Precision.HIGH vs Mosaic
# f32 dots), so trainer taps land within ~1e-2 and the filter within
# ~8e-3 on O(1) signals (measured r5). The bands below catch LOGIC bugs
# (a misplaced tile/carry is O(1)) while tolerating engine rounding.
BLK_TOL = 2e-2
FILT_TOL = 3e-2


def record(name, ok, **metrics):
    row = dict(case=name, ok=bool(ok),
               **{k: float(v) for k, v in metrics.items()})
    RESULTS.append(row)
    print(json.dumps(row), flush=True)


def dev_planes(E):
    """Host complex -> device float32 plane pair (tunnel-safe)."""
    E = np.asarray(E)
    return (jax.device_put(np.ascontiguousarray(E.real).astype(np.float32)),
            jax.device_put(np.ascontiguousarray(E.imag).astype(np.float32)))


def fetch(x):
    return float(np.asarray(x))


def _const_field(rng, M=64, L=3000, lw=0.1):
    const = (cal_symbols_qam(M)
             / np.sqrt(cal_scaling_factor_qam(M))).astype(np.complex64)
    grid = phops.detect_grid(const)
    ph = np.cumsum(rng.normal(0, lw / np.sqrt(L), (2, L)), axis=-1)
    E = (const[rng.integers(0, M, (2, L))] * np.exp(1j * ph)
         + .01 * (rng.standard_normal((2, L))
                  + 1j * rng.standard_normal((2, L)))).astype(np.complex64)
    return const, grid, E


def run_bps(rng):
    from qampy_tpu.ops.phase_pallas import bps_idx_pallas

    def one(name, M, T, A, N, gen=False, exact=True):
        const, grid, E = _const_field(rng, M=M, L=2048 if M != 64 else 3000)
        spec = grid
        if gen:
            spec = ("gen", tuple(float(x) for x in const.real),
                    tuple(float(x) for x in const.imag))
        angles = np.linspace(-np.pi / 4, np.pi / 4, A, endpoint=False,
                             dtype=np.float32)

        @jax.jit
        def f(er, ei):
            Ed = er + 1j * ei
            ref = jax.vmap(lambda e: phops.bps_idx(
                e, jnp.asarray(angles).reshape(1, -1), jnp.asarray(const),
                N, grid=grid if (M == 64 and not gen) else None))(Ed)
            got = bps_idx_pallas(None, angles, spec, N, T=T,
                                 planes=(er, ei))
            mism = (ref != got)
            maxd = jnp.max(jnp.abs(ref - got) * mism.astype(ref.dtype))
            return jnp.mean(mism.astype(jnp.float32)), \
                maxd.astype(jnp.float32)
        er, ei = dev_planes(E)
        mf, md = [fetch(x) for x in f(er, ei)]
        ok = (mf == 0.0) if exact else (mf < 2e-3 and md <= 1)
        record(name, ok, mismatch_frac=mf, max_idx_diff=md)

    one("bps_sq64_T512_A64_N14", 64, 512, 64, 14, exact=False)
    one("bps_sq64_T1024_A64_N10", 64, 1024, 64, 10, exact=False)
    one("bps_cross32", 32, 256, 32, 8)
    one("bps_cross128", 128, 256, 32, 8)
    one("bps_rect8", 8, 256, 32, 8)
    one("bps_gen32", 32, 256, 32, 8, gen=True)


def run_twostage(rng):
    from qampy_tpu.ops.phase_pallas import bps_phase_twostage_pallas
    const, grid, E = _const_field(rng)
    A, B, N, T = 16, 8, 14, 512

    @jax.jit
    def f(er, ei):
        Ed = er + 1j * ei
        _, ph_ref = phops.bps_twostage(Ed, A, jnp.asarray(const), N, B=B,
                                       method="pyt")
        phf = bps_phase_twostage_pallas(None, A, B, grid, N, T=T,
                                        planes=(er, ei))
        ph_got = jnp.unwrap(phf * 4, axis=-1) / 4
        fine_step = np.pi / 2 / ((B - 1) * A)
        v = ph_got[:, 2 * N:-2 * N] - ph_ref[:, 2 * N:-2 * N]
        close = (jnp.abs(v) <= fine_step + 1e-5)
        return jnp.mean(close.astype(jnp.float32))
    er, ei = dev_planes(E)
    cm = fetch(f(er, ei))
    record("bps_twostage_T512", cm > 0.999, close_mean=cm)


def run_trainers(rng):
    from qampy_tpu.ops.equaliser_pallas import (train_equaliser_pallas,
                                                train_equaliser_block_pallas)
    field = (rng.standard_normal((2, 4096))
             + 1j * rng.standard_normal((2, 4096))).astype(np.complex64)
    er, ei = dev_planes(field)
    w0 = eqops._init_taps(11, 2, 2, np.complex64)

    for method in ("cma", "mcma", "rde"):
        syms = eqops._reshape_symbols(None, method, 16, np.complex64, 2)

        @jax.jit
        def f(er, ei, _m=method, _s=syms):
            Ed = er + 1j * ei
            _, w_s, mu_s = eqops.train_equaliser_seq(
                Ed, 1000, 1, 2, 1e-3, jnp.asarray(w0), jnp.asarray(_s), _m,
                adaptive=True)
            _, w_p, mu_p = train_equaliser_pallas(
                Ed, 1000, 1, 2, 1e-3, w0, _s, _m, adaptive=True)
            return (jnp.max(jnp.abs(w_s - w_p)),
                    jnp.max(jnp.abs(mu_s - mu_p)))
        dw, dm = [fetch(x) for x in f(er, ei)]
        record("seq_trainer_%s" % method, dw < 1e-4 and dm < 1e-6,
               max_tap_diff=dw, max_mu_diff=dm)

    cases = [("blk_%s" % m, m, 16) for m in
             ("cma", "mcma", "rde", "sbd", "mddma", "dd")]
    cases += [("blk_sbd_cross32", "sbd", 32)]
    for name, method, M in cases:
        syms = eqops._reshape_symbols(None, method, M, np.complex64, 2)

        @jax.jit
        def f(er, ei, _m=method, _s=syms):
            Ed = er + 1j * ei
            _, w_b, mu_b = eqops.train_equaliser_block(
                Ed, 1024, 2, 2, 1e-3, jnp.asarray(w0), jnp.asarray(_s), _m,
                adaptive=True, block_size=128)
            _, w_p, mu_p = train_equaliser_block_pallas(
                Ed, 1024, 2, 2, 1e-3, w0, _s, _m, adaptive=True,
                block_size=128)
            return (jnp.max(jnp.abs(w_b - w_p)),
                    jnp.max(jnp.abs(mu_b - mu_p)))
        dw, dm = [fetch(x) for x in f(er, ei)]
        record(name, dw < BLK_TOL and dm < 1e-5, max_tap_diff=dw,
               max_mu_diff=dm)

    # gen (warped) alphabet decision methods
    c = cal_symbols_qam(64) / np.sqrt(cal_scaling_factor_qam(64))
    const = (c * (1 + 0.18 * (np.abs(c) ** 2 - 1))).astype(np.complex64)
    syms_g = np.tile(const[None, :], (2, 1))
    for method in ("sbd", "mddma", "dd"):
        @jax.jit
        def f(er, ei, _m=method):
            Ed = er + 1j * ei
            _, w_b, mu_b = eqops.train_equaliser_block(
                Ed, 1024, 2, 2, 1e-3, jnp.asarray(w0), jnp.asarray(syms_g),
                _m, adaptive=True, block_size=128)
            _, w_p, mu_p = train_equaliser_block_pallas(
                Ed, 1024, 2, 2, 1e-3, w0, syms_g, _m, adaptive=True,
                block_size=128)
            return (jnp.max(jnp.abs(w_b - w_p)),
                    jnp.max(jnp.abs(mu_b - mu_p)))
        dw, dm = [fetch(x) for x in f(er, ei)]
        record("blk_gen_%s" % method, dw < BLK_TOL and dm < 1e-5,
               max_tap_diff=dw, max_mu_diff=dm)


def run_filter(rng):
    from qampy_tpu.ops.equaliser_pallas import apply_filter_pallas
    for L, ntaps, os_, nmodes, Ct in ((5000, 17, 2, 2, 64),
                                      (4096, 11, 2, 2, 32),
                                      (3000, 17, 2, 1, 32),
                                      (6000, 17, 4, 2, 16)):
        E = (rng.standard_normal((nmodes, L))
             + 1j * rng.standard_normal((nmodes, L))).astype(np.complex64)
        wxy = ((rng.standard_normal((nmodes, nmodes, ntaps))
                + 1j * rng.standard_normal((nmodes, nmodes, ntaps))) * 0.1
               ).astype(np.complex64)

        @jax.jit
        def f(er, ei, _os=os_, _w=wxy, _Ct=Ct):
            Ed = er + 1j * ei
            want = eqops.apply_filter_to_signal(Ed, _os, jnp.asarray(_w))
            got = apply_filter_pallas(Ed, _os, _w, Ct=_Ct,
                                      mat_dtype=jnp.float32)
            return jnp.max(jnp.abs(got - want))
        er, ei = dev_planes(E)
        d = fetch(f(er, ei))
        record("filter_L%d_t%d_os%d_n%d_Ct%d" % (L, ntaps, os_, nmodes, Ct),
               d < FILT_TOL, max_abs_diff=d)


def _xla_derotate(Ed, ph):
    d = ph[:, 1:] - ph[:, :-1]
    half_pi = jnp.float32(np.pi / 2)
    a = -half_pi * jnp.round(d / half_pi)
    offs = jnp.cumsum(jnp.pad(a, ((0, 0), (1, 0))), axis=-1)
    u = ph + offs
    c, s = jnp.cos(u), jnp.sin(u)
    er, ei = Ed.real, Ed.imag
    return (er * c - ei * s) + 1j * (er * s + ei * c)


def run_derotate(rng):
    from qampy_tpu.ops.phase_pallas import unwrap_derotate_pallas
    for T, L in ((1024, 5000), (8192, 5000), (1024, 1024)):
        E = (rng.standard_normal((2, L))
             + 1j * rng.standard_normal((2, L))).astype(np.complex64)
        drift = (np.cumsum(rng.standard_normal((2, L)) * 0.02, axis=-1)
                 + np.linspace(0, 9, L))
        ph = ((drift + np.pi / 4) % (np.pi / 2) - np.pi / 4
              ).astype(np.float32)

        @jax.jit
        def f(er, ei, phd, _T=T):
            Ed = er + 1j * ei
            ref = _xla_derotate(Ed, phd)
            got = unwrap_derotate_pallas(Ed, phd, T=_T)
            return jnp.max(jnp.abs(got - ref))
        er, ei = dev_planes(E)
        d = fetch(f(er, ei, jax.device_put(ph)))
        record("derot_T%d_L%d" % (T, L), d < 1e-4, max_abs_diff=d)

    # pi/2 wraps exactly at tile and row-segment boundaries must carry
    for at in (1024, 128, 640):
        L, T = 4096, 1024
        E = np.ones((1, L), np.complex64)
        ph = np.full((1, L), np.pi / 4 - 0.01, np.float32)
        ph[0, at:] = -np.pi / 4 + 0.01

        @jax.jit
        def f(er, ei, phd, _at=at):
            Ed = er + 1j * ei
            ref = _xla_derotate(Ed, phd)
            got = unwrap_derotate_pallas(Ed, phd, T=1024)
            ang_ok = jnp.max(jnp.abs(
                jnp.angle(got[0, _at:]) - (np.pi / 4 + 0.01)))
            return jnp.max(jnp.abs(got - ref)), ang_ok
        er, ei = dev_planes(E)
        d, ang = [fetch(x) for x in f(er, ei, jax.device_put(ph))]
        record("derot_carry_at%d" % at, d < 1e-5 and ang < 1e-4,
               max_abs_diff=d, max_angle_err=ang)


def run_rotate(rng):
    from qampy_tpu.ops.phase_pallas import (rotate_planes_pallas,
                                            interp_rotate_planes_pallas)
    L = 5000
    E = (rng.standard_normal((2, L))
         + 1j * rng.standard_normal((2, L))).astype(np.complex64)
    ph = rng.standard_normal((2, L)).astype(np.float32)

    @jax.jit
    def f(er, ei, phd):
        outr, outi = rotate_planes_pallas(er, ei, phd, sign=-1)
        refr = er * jnp.cos(phd) + ei * jnp.sin(phd)
        refi = ei * jnp.cos(phd) - er * jnp.sin(phd)
        return jnp.maximum(jnp.max(jnp.abs(outr - refr)),
                           jnp.max(jnp.abs(outi - refi)))
    er, ei = dev_planes(E)
    d = fetch(f(er, ei, jax.device_put(ph)))
    record("rotate_planes", d < 1e-5, max_abs_diff=d)

    dx, Lb = 8, 4096
    a = rng.standard_normal((2, Lb // dx)).astype(np.float32)
    b = (rng.standard_normal((2, Lb // dx)) * 0.1).astype(np.float32)

    @jax.jit
    def g(er, ei, ad, bd):
        outr, outi = interp_rotate_planes_pallas(er[:, :Lb], ei[:, :Lb],
                                                 ad, bd, dx=dx, sign=1,
                                                 T=1024)
        i = jnp.arange(Lb)
        phf = ad[:, i // dx] + bd[:, i // dx] * (i % dx)
        refr = er[:, :Lb] * jnp.cos(phf) - ei[:, :Lb] * jnp.sin(phf)
        refi = er[:, :Lb] * jnp.sin(phf) + ei[:, :Lb] * jnp.cos(phf)
        return jnp.maximum(jnp.max(jnp.abs(outr - refr)),
                           jnp.max(jnp.abs(outi - refi)))
    d = fetch(g(er, ei, jax.device_put(a), jax.device_put(b)))
    record("interp_rotate_planes_dx8", d < 1e-5, max_abs_diff=d)

    # LARGE coefficients (unwrapped-phase scale, the decimated blind
    # path's regime): locks the Precision.HIGHEST lane expansion — the
    # default Mosaic bf16 dot produced 0.024-0.2-scale errors here
    a_big = (rng.standard_normal((2, Lb // dx)) * 10).astype(np.float32)
    d = fetch(g(er, ei, jax.device_put(a_big), jax.device_put(b)))
    record("interp_rotate_planes_bigphase", d < 2e-5, max_abs_diff=d)


GROUPS = {"bps": run_bps, "twostage": run_twostage, "trainers": run_trainers,
          "filter": run_filter, "derotate": run_derotate,
          "rotate": run_rotate}


def main():
    which = sys.argv[1:] or list(GROUPS)
    print("backend: %s" % jax.default_backend(), file=sys.stderr, flush=True)
    rng = np.random.default_rng(0)
    # warm the transfer path before big device_puts
    np.asarray(jax.jit(lambda: jnp.zeros(4, jnp.float32))())
    for g in which:
        GROUPS[g](rng)
    npass = sum(r["ok"] for r in RESULTS)
    summary = dict(summary=True, backend=jax.default_backend(),
                   passed=npass, total=len(RESULTS),
                   all_ok=npass == len(RESULTS))
    print(json.dumps(summary))
    return 0 if summary["all_ok"] else 1


if __name__ == "__main__":
    sys.exit(main())

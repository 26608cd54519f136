"""Carrier and phase recovery: blind phase search, Viterbi-Viterbi, FOE.

Parity: qampy/core/phaserecovery.py + the BPS kernels in
qampy/core/pythran_dsp.py (bps :47-85, select_angle_index :26-42,
select_angles :137-153). The reference's per-sample/per-angle OpenMP distance
search becomes one fused computation:

    d[i, a] = min_s |E_i * e^{j θ_a} - s|^2

is evaluated by expanding the square — the cross term
``Re((E e^{jθ}) conj(s))`` is a (L*A, 2) x (2, M) real matmul that maps onto
the MXU — and the 2N running-window minimisation becomes a cumsum
(associative scan on the VPU) + strided difference + argmin, eliminating the
sequential C loop entirely.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from qampy_tpu.helpers import cabssquared
from qampy_tpu.utils import segment_axis
from qampy_tpu.core.metrics import cal_s0


def detect_square_grid(symbols):
    """Detect a uniform full square grid constellation (host-side).

    Returns a hashable (delta, lo, n) tuple when ``symbols`` is the full
    product of n uniformly spaced real levels with itself (square QAM), else
    None. Used to switch the BPS distance search from an O(M) min-distance
    to an O(1) analytic rounding decision per (sample, angle).
    """
    try:
        s = np.asarray(symbols)
    except Exception:
        return None  # traced value: cannot inspect
    if s.ndim != 1 or s.size < 4:
        return None
    re = np.unique(np.round(s.real, 6))
    im = np.unique(np.round(s.imag, 6))
    if re.size * im.size != s.size or re.size != im.size or re.size < 2:
        return None
    d = np.diff(re)
    if not (np.allclose(d, d[0], rtol=1e-3) and np.allclose(np.diff(im), d[0], rtol=1e-3)
            and np.allclose(re, im, rtol=1e-3)):
        return None
    return (float(d[0]), float(re[0]), int(re.size))


def _uniform_levels(vals):
    """(levels, spacing) when ``vals`` are uniformly spaced, else None."""
    if vals.size < 2:
        return None
    d = np.diff(vals)
    if not np.allclose(d, d[0], rtol=1e-3):
        return None
    return vals, float(d[0])


def detect_grid(symbols):
    """Classify a constellation for the analytic nearest-point decision.

    Host-side inspection (returns None on traced values). Returns a hashable
    grid spec consumed by the XLA and Pallas distance kernels:

    * ``(d, lo, n)`` — full square grid (square QAM); bare 3-tuple for
      backwards compatibility with ``detect_square_grid``.
    * ``("x", d, lo, n, c)`` — cross QAM: the n x n grid minus c x c
      corners (reference theory.py:161 cal_symbols_cross_qam; 32-QAM:
      n=6,c=1; 128: n=12,c=2; 512: n=24,c=4). The nearest point on the
      cross (a union of two rectangles) is the closer of the two per-axis
      clamped decisions — exact, O(1) per sample.
    * ``("r", d, lor, nr, loi, ni)`` — full rectangular grid (8/2048-QAM
      style), independent level counts per axis.
    * ``("gen", sr, si)`` — none of the above: the raw points as float
      tuples for the O(M) unrolled search (PS-shaped / arbitrary alphabets).
    """
    sq = detect_square_grid(symbols)
    if sq is not None:
        return sq
    try:
        s = np.asarray(symbols)
    except Exception:
        return None
    if s.ndim != 1 or s.size < 2:
        return None
    gen = ("gen", tuple(float(x) for x in s.real),
           tuple(float(x) for x in s.imag))
    re = _uniform_levels(np.unique(np.round(s.real, 6)))
    im = _uniform_levels(np.unique(np.round(s.imag, 6)))
    if re is None or im is None or abs(re[1] - im[1]) > 1e-3 * abs(re[1]):
        return gen
    (rl, d), (il, _) = re, im
    nr, ni = rl.size, il.size
    if nr * ni == s.size:
        # full rectangular product grid
        pts = {(round(float(z.real - rl[0]) / d), round(float(z.imag - il[0]) / d))
               for z in s}
        if len(pts) == s.size:
            return ("r", d, float(rl[0]), int(nr), float(il[0]), int(ni))
        return gen
    if nr == ni and np.allclose(rl, il, rtol=1e-3):
        n = nr
        pts = {(round(float(z.real - rl[0]) / d), round(float(z.imag - rl[0]) / d))
               for z in s}
        for c in range(1, n // 2):
            if s.size != n * n - 4 * c * c:
                continue
            corner = {(i, j) for i in range(n) for j in range(n)
                      if (i < c or i >= n - c) and (j < c or j >= n - c)}
            full = {(i, j) for i in range(n) for j in range(n)} - corner
            if pts == full:
                return ("x", d, float(rl[0]), int(n), int(c))
    return gen


def grid_decision_info(grid):
    """(kind, params) for a grid spec; kind in {sq, x, r, gen, none}."""
    if grid is None:
        return "none", None
    if isinstance(grid[0], str):
        return grid[0], grid[1:]
    return "sq", grid


def fit_uniform_grid(const, n=None):
    """Least-squares uniform square-grid fit of an arbitrary alphabet.

    Host-side: returns the ``(d, lo, n)`` square-grid spec minimising the
    mean squared per-axis quantisation error of the alphabet's coordinates
    (coarse 2-D parameter search). Used to build a CHEAP analytic coarse
    decision for the two-stage gen-alphabet BPS (see
    ``coarse_grid_for_alphabet``).
    """
    const = np.asarray(const).reshape(-1)
    if n is None:
        n = int(np.ceil(np.sqrt(const.size)))
    x = np.concatenate([const.real, const.imag]).astype(np.float64)
    d0 = (x.max() - x.min()) / max(n - 1, 1)
    best = None
    for d in np.linspace(0.7 * d0, 1.3 * d0, 61):
        j = np.clip(np.round((x[None, :] - (x.min() - 0.3 * d
                    + np.linspace(0, 0.6 * d, 41))[:, None]) / d), 0, n - 1)
        los = (x.min() - 0.3 * d + np.linspace(0, 0.6 * d, 41))[:, None]
        err = np.mean((x[None, :] - (los + j * d)) ** 2, axis=1)
        k = int(np.argmin(err))
        if best is None or err[k] < best[0]:
            best = (float(err[k]), float(d), float(los[k, 0]))
    return best[1], best[2], int(n)


def coarse_grid_for_alphabet(const, Mtestangles=16, snr_probe=0.05,
                             trials=32, seed=0):
    """A cheap analytic COARSE decision grid for a general alphabet, or None.

    The two-stage BPS coarse estimate only needs a phase-DISCRIMINATIVE
    distance metric, not the exact nearest-alphabet distance; a fitted
    uniform grid gives that at O(1) per sample instead of the O(M)
    unrolled search that dominates general-alphabet chains (measured:
    warped-64 twostage 386 -> ~700 Msym/s band, same SER gate). Validated
    HOST-side before use: over ``trials`` random true phases, the
    per-angle mean-distance argmin of the fitted-grid metric must agree
    with the true-alphabet metric within one coarse step; otherwise
    returns None and the caller keeps the exact full-alphabet coarse
    stage (e.g. ring/APSK alphabets a square grid cannot discriminate).
    """
    const = np.asarray(const).reshape(-1)
    d, lo, n = fit_uniform_grid(const)
    rng = np.random.default_rng(seed)
    L = 2048
    syms = const[rng.integers(0, const.size, L)]
    noise = snr_probe * (rng.standard_normal(L) + 1j * rng.standard_normal(L))
    angles = np.linspace(-np.pi / 4, np.pi / 4, Mtestangles, endpoint=False)
    ok = 0
    for _ in range(trials):
        th = rng.uniform(-np.pi / 4, np.pi / 4)
        z = (syms + noise) * np.exp(1j * th)
        zr = z[None, :] * np.exp(1j * angles)[:, None]
        # true nearest-alphabet distance per angle
        dtrue = np.min(np.abs(zr[:, :, None] - const[None, None, :]) ** 2,
                       axis=-1).mean(axis=1)
        qr = lo + d * np.clip(np.round((zr.real - lo) / d), 0, n - 1)
        qi = lo + d * np.clip(np.round((zr.imag - lo) / d), 0, n - 1)
        dfit = ((zr.real - qr) ** 2 + (zr.imag - qi) ** 2).mean(axis=1)
        diff = abs(int(np.argmin(dtrue)) - int(np.argmin(dfit)))
        ok += min(diff, Mtestangles - diff) <= 1
    if ok >= trials - 1:
        return (d, lo, n)
    return None


def fine_grid_ok(const, grid_fit, Mtestangles=16, B=8, trials=16,
                 snr_probe=0.05, seed=1):
    """Is the fitted grid phase-accurate enough for the FINE BPS stage?

    Stronger host probe than ``coarse_grid_for_alphabet``: the fine stage
    sets the FINAL derotation phase, so the fitted-grid metric's global
    argmin must agree with the true-alphabet metric's within one fine
    step (pi/2 / (Mtestangles*B)) on a dense angle grid. When this holds
    the whole gen-alphabet BPS runs the O(1) analytic decision in both
    stages (measured: warped-64 SER 2.3e-5 vs 1.5e-5 with the exact fine
    stage — no gate impact).
    """
    const = np.asarray(const).reshape(-1)
    d, lo, n = grid_fit
    rng = np.random.default_rng(seed)
    L = 512
    syms = const[rng.integers(0, const.size, L)]
    noise = snr_probe * (rng.standard_normal(L) + 1j * rng.standard_normal(L))
    na = 256
    angles = np.linspace(-np.pi / 4, np.pi / 4, na, endpoint=False)
    res = (np.pi / 2) / na
    fine_step = (np.pi / 2) / (Mtestangles * B)
    ok = 0
    for _ in range(trials):
        th = rng.uniform(-np.pi / 8, np.pi / 8)
        z = (syms + noise) * np.exp(1j * th)
        zr = z[None, :] * np.exp(1j * angles)[:, None]
        dtrue = np.min(np.abs(zr[:, :, None] - const[None, None, :]) ** 2,
                       axis=-1).mean(axis=1)
        qr = lo + d * np.clip(np.round((zr.real - lo) / d), 0, n - 1)
        qi = lo + d * np.clip(np.round((zr.imag - lo) / d), 0, n - 1)
        dfit = ((zr.real - qr) ** 2 + (zr.imag - qi) ** 2).mean(axis=1)
        ok += (abs(int(np.argmin(dtrue)) - int(np.argmin(dfit))) * res
               <= fine_step)
    return ok >= trials - 1


def _min_dist_sq(EE, symbols, grid):
    """min_s |EE - s|^2 elementwise over the last-axis-free EE array.

    With a square/cross/rectangular-grid constellation the nearest point is
    found analytically by per-axis rounding and clamping (O(1) per element,
    pure VPU — the cross decision is the closer of the two rectangle clamps,
    exact because the cross is a union of two axis-aligned rectangles);
    otherwise the expanded square |z|^2 - 2 Re(z conj(s)) + |s|^2 is
    evaluated with the cross term as a real matmul on the MXU.
    """
    kind, p = grid_decision_info(grid)
    if kind == "sq":
        d, lo, n = p
        zr = EE.real
        zi = EE.imag
        qr = lo + d * jnp.clip(jnp.round((zr - lo) / d), 0, n - 1)
        qi = lo + d * jnp.clip(jnp.round((zi - lo) / d), 0, n - 1)
        return (zr - qr) ** 2 + (zi - qi) ** 2
    if kind == "r":
        d, lor, nr, loi, ni = p
        zr = EE.real
        zi = EE.imag
        qr = lor + d * jnp.clip(jnp.round((zr - lor) / d), 0, nr - 1)
        qi = loi + d * jnp.clip(jnp.round((zi - loi) / d), 0, ni - 1)
        return (zr - qr) ** 2 + (zi - qi) ** 2
    if kind == "x":
        d, lo, n, c = p
        zr = EE.real
        zi = EE.imag
        x = (zr - lo) / d
        y = (zi - lo) / d
        rx = jnp.round(x)
        ry = jnp.round(y)
        # rect A: x free in [0, n-1], y in [c, n-1-c]; rect B transposed
        ax = jnp.clip(rx, 0, n - 1)
        ay = jnp.clip(ry, c, n - 1 - c)
        bx = jnp.clip(rx, c, n - 1 - c)
        by = jnp.clip(ry, 0, n - 1)
        dA = (x - ax) ** 2 + (y - ay) ** 2
        dB = (x - bx) ** 2 + (y - by) ** 2
        return d * d * jnp.minimum(dA, dB)
    zs = jnp.stack([EE.real, EE.imag], axis=-1)  # (..., 2)
    S = jnp.stack([symbols.real, symbols.imag], axis=0).astype(zs.dtype)  # (2, M)
    cross = jnp.matmul(zs, S, precision=lax.Precision.HIGHEST)  # (..., M)
    return cabssquared(EE).astype(zs.dtype) + (
        cabssquared(symbols).astype(zs.dtype) - 2 * cross).min(axis=-1)


@partial(jax.jit, static_argnames=("N", "grid"))
def bps_idx(E, testangles, symbols, N, grid=None):
    """Blind phase search index kernel (reference pythran_dsp.py:47-85).

    E: (L,) complex; testangles: (1, A) or (L, A); symbols: (M,).
    Returns int32 (L,) index of the best test angle per sample, computed over
    a 2N running window, with the same edge semantics as the reference
    (positions [N, L-N) are filled; the rest are 0). ``grid`` enables the
    analytic square-QAM decision (see detect_square_grid).
    """
    E = jnp.asarray(E)
    testangles = jnp.asarray(testangles)
    symbols = jnp.asarray(symbols)
    comp = jnp.exp(1j * testangles).astype(E.dtype)
    # rotated samples (L, A): broadcast for shared angles, per-sample otherwise
    EE = E[:, None] * comp if testangles.shape[0] > 1 else E[:, None] * comp[0][None, :]
    dist = _min_dist_sq(EE, symbols, grid)
    return _select_angle_index(dist, 2 * N)


def _select_angle_index(x, N2, tile=4096):
    """Running-window sum argmin (reference pythran_dsp.py:26-42).

    x: (L, A) distances. For i in [N2, L): idx[i - N2//2] = argmin_a of
    sum(x[i-N2+1 : i+1, a]); all other positions 0.

    Numerics: a single f32 cumsum over the full signal accumulates to O(L)
    and the N2-window difference of two ~10^6 numbers keeps only ~4-5
    significant digits at L=2^20+ (enough to flip near-tied angle argmins).
    The cumsum is therefore re-based per ``tile``: each tile gathers its
    N2-sample lookback and computes a local prefix sum, bounding the
    accumulated magnitude to tile+N2 samples — full f32 window precision at
    any signal length (the fused Pallas kernel re-sums per tile the same
    way). Costs one extra gather of N2/tile of the input.
    """
    L, A = x.shape
    if L <= N2:
        return jnp.zeros(L, dtype=jnp.int32)
    Tt = int(tile)
    ntiles = -(-L // Tt)
    # xp[k] = x[k - N2] with N2 zeros in front and tail padding
    xp = jnp.pad(x, ((N2, ntiles * Tt - L), (0, 0)))
    gidx = (jnp.arange(ntiles) * Tt)[:, None] + jnp.arange(Tt + N2)[None, :]
    seg = xp[gidx]  # (ntiles, Tt+N2, A) overlapping segments
    c = jnp.cumsum(seg, axis=1)
    c0 = jnp.pad(c, ((0, 0), (1, 0), (0, 0)))
    # win[t, k] = sum x[t*Tt+k-N2+1 .. t*Tt+k] (window ending at t*Tt+k):
    # seg rows k+1 .. k+N2 = c0[k+N2+1] - c0[k+1]
    win = (c0[:, N2 + 1: N2 + Tt + 1] - c0[:, 1: Tt + 1]).reshape(ntiles * Tt, A)
    am = jnp.argmin(win[N2:L], axis=1).astype(jnp.int32)  # windows i=N2..L-1
    idx = jnp.zeros(L, dtype=jnp.int32)
    return idx.at[N2 - N2 // 2: L - N2 // 2].set(am)


def select_angles(angles, idx):
    """Gather the chosen angle per sample (reference pythran_dsp.py:137-153)."""
    angles = jnp.asarray(angles)
    idx = jnp.asarray(idx)
    if angles.shape[0] > 1:
        return angles[jnp.arange(angles.shape[0]), idx[: angles.shape[0]]]
    return angles[0][idx]


def _use_pallas_bps(grid, method):
    """Pick the fused Pallas BPS kernel when eligible.

    method=None ("auto") selects pallas on TPU for any host-inspectable
    constellation (square/cross/rect grids take the analytic decision;
    arbitrary alphabets the unrolled O(M) search, worthwhile up to
    moderate M); method="pallas"/"pyt" forces/forbids it explicitly
    ("pyt" is the reference's name for its default backend, mapped to the
    XLA path here).
    """
    if method == "pallas":
        return True
    if method is not None:
        return False
    if grid is None or jax.default_backend() in ("cpu",):
        return False
    kind, p = grid_decision_info(grid)
    # the unrolled general kernel is ~3 VPU ops per constellation point;
    # beyond 256 points the XLA MXU matmul formulation wins
    return kind != "gen" or len(p[0]) <= 256


def bps(E, Mtestangles, symbols, N, method=None, **kwargs):
    """Blind phase search after Pfau et al. (reference core/phaserecovery.py:93-159).

    Returns (Eout, ph): the derotated signal and the unwrapped phase. The
    per-mode kernel calls are vmapped instead of looped. On TPU with a
    square-grid constellation the fused Pallas kernel
    (ops/phase_pallas.bps_idx_pallas) is used automatically.
    """
    E = jnp.asarray(E)
    symbols = jnp.asarray(symbols)
    rdtype = E.real.dtype
    angles = jnp.linspace(-np.pi / 4, np.pi / 4, Mtestangles, endpoint=False,
                          dtype=rdtype).reshape(1, -1)
    Ew = jnp.atleast_2d(E)
    grid = detect_grid(symbols)
    if _use_pallas_bps(grid, method):
        from qampy_tpu.ops.phase_pallas import bps_idx_pallas
        host_angles = np.linspace(-np.pi / 4, np.pi / 4, Mtestangles,
                                  endpoint=False, dtype=np.float32)
        idx = bps_idx_pallas(Ew, host_angles, grid, N)
    else:
        idx = jax.vmap(lambda e: bps_idx(e, angles, symbols, N, grid=grid))(Ew)
    # the angle grid is affine, so the per-sample angle is index arithmetic —
    # a table gather here costs ~15 ms for 2^20 samples on TPU
    ph = (-np.pi / 4) + (np.pi / 2 / Mtestangles) * idx.astype(rdtype)
    # ignore the phases outside the averaging window; unwrap the pi/2 ambiguity
    ph = ph.at[:, N:-N].set(jnp.unwrap(ph[:, N:-N] * 4, axis=-1) / 4)
    out = Ew * jnp.exp(1.j * ph).astype(Ew.dtype)
    if E.ndim == 1:
        return out.flatten(), ph.flatten()
    return out, ph


def bps_twostage(E, Mtestangles, symbols, N, B=4, method=None, N1=None,
                 **kwargs):
    """Two-stage BPS: coarse search then per-sample fine grid.

    Parity: reference core/phaserecovery.py:222-288 (exact for the
    default ``N1=None``). ``N1`` widens ONLY the coarse stage's averaging
    half-window — the carrier phase varies slowly, so a wide coarse
    window suppresses coarse-stage cycle slips at unchanged tracking
    bandwidth (the fine stage keeps ``N``); this is the same documented
    deviation as the Pallas kernel's N1 (docs/PERFORMANCE.md, pinned by
    test_reference_parity.test_bps_twostage_pallas_wide_coarse_deviation).
    On TPU with a square-grid constellation both stages run as fused
    Pallas kernels.
    """
    E = jnp.asarray(E)
    symbols = jnp.asarray(symbols)
    rdtype = E.real.dtype
    angles = jnp.linspace(-np.pi / 4, np.pi / 4, Mtestangles, endpoint=False,
                          dtype=rdtype).reshape(1, -1)
    Ew = jnp.atleast_2d(E)

    grid = detect_grid(symbols)
    if _use_pallas_bps(grid, method):
        from qampy_tpu.ops.phase_pallas import bps_phase_twostage_pallas
        phf = bps_phase_twostage_pallas(Ew, Mtestangles, B, grid, N, N1=N1)
        ph_out = jnp.unwrap(phf * 4, axis=-1) / 4
        En = Ew * jnp.exp(1.j * ph_out).astype(Ew.dtype)
        if E.ndim == 1:
            return En.flatten(), ph_out.flatten()
        return En, ph_out

    def one_mode(e):
        idx = bps_idx(e, angles, symbols, N if N1 is None else N1, grid=grid)
        ph = select_angles(angles, idx)
        b = jnp.linspace(-B / 2, B / 2, B, dtype=rdtype)
        phn = ph[:, None] + b[None, :] / (B * Mtestangles) * np.pi / 2
        idx2 = bps_idx(e, phn, symbols, N, grid=grid)
        phf = select_angles(phn, idx2)
        return jnp.unwrap(phf * 4) / 4

    ph_out = jax.vmap(one_mode)(Ew)
    En = Ew * jnp.exp(1.j * ph_out).astype(Ew.dtype)
    if E.ndim == 1:
        return En.flatten(), ph_out.flatten()
    return En, ph_out


def viterbiviterbi(E, N, M):
    """Viterbi-Viterbi blind phase recovery for M-PSK (reference core/phaserecovery.py:40-79)."""
    E = jnp.asarray(E)
    E2d = jnp.atleast_2d(E)
    L = E2d.shape[-1]
    phi = jnp.angle(E2d)
    E_raised = jnp.exp(1.j * phi) ** M
    sa = segment_axis(E_raised, N, N - 1, axis=-1)  # (modes, L-N+1, N)
    phase_est = jnp.unwrap(jnp.angle(jnp.sum(sa, axis=-1)), axis=-1)
    phase_est = (phase_est - np.pi) / M
    Eout = jnp.zeros_like(E2d)
    if N % 2:
        lo, hi = (N - 1) // 2, L - (N - 1) // 2
    else:
        lo, hi = N // 2 - 1, L - N // 2
    Eout = Eout.at[:, lo:hi].set(E2d[:, lo:hi] * jnp.exp(-1.j * phase_est).astype(E2d.dtype))
    if E.ndim == 1:
        return Eout.flatten(), phase_est.flatten()
    return Eout, phase_est


def partition_16qam(E):
    """Partition 16-QAM into inner/outer rings (reference core/phaserecovery.py:292-325)."""
    E = jnp.asarray(E)
    S0 = cal_s0(E, 1.32)
    inner = (jnp.sqrt(S0 / 5) + jnp.sqrt(S0)) / 2.
    outer = (jnp.sqrt(9 * S0 / 5) + jnp.sqrt(S0)) / 2.
    Ea = jnp.abs(E)
    class1_mask = (Ea < inner) | (Ea > outer)
    return class1_mask, ~class1_mask


def phase_partition_16qam(E, Nblock):
    """16-QAM QPSK-partitioning phase recovery (reference core/phaserecovery.py:328-382)."""
    E = jnp.asarray(E)
    E2d = jnp.atleast_2d(E)
    dphi = np.pi / 4 + np.arctan(1 / 3)
    modes, L = E2d.shape
    nblocks = L // Nblock
    Lb = nblocks * Nblock

    def one_mode(e):
        c1_m, c2_m = partition_16qam(e)
        Sx = jnp.where(c2_m, (e * np.exp(1.j * dphi)) ** 4, 0.)
        So = jnp.where(c2_m, (e * np.exp(-1.j * dphi)) ** 4, 0.)
        S1 = jnp.where(c1_m, e ** 4, 0.)
        S1b = S1[:Lb].reshape(nblocks, Nblock)
        Sxb = Sx[:Lb].reshape(nblocks, Nblock)
        Sob = So[:Lb].reshape(nblocks, Nblock)
        c2b = c2_m[:Lb].reshape(nblocks, Nblock)
        S1_sum = jnp.sum(S1b, axis=-1, keepdims=True)
        cand = jnp.minimum((S1_sum - Sxb).real, (S1_sum - Sob).real) + 1j * 0
        # reference selects via np.min of complex arrays (lexicographic on
        # real part) then sums the c2-masked values
        pick = jnp.where((S1_sum - Sxb).real <= (S1_sum - Sob).real,
                         S1_sum - Sxb, S1_sum - Sob)
        Sx_tmp = jnp.where(c2b, pick, 0.)
        phi_blk = jnp.angle(S1_sum[:, 0] + jnp.sum(Sx_tmp, axis=-1))
        phi_est = jnp.repeat(phi_blk, Nblock, total_repeat_length=Lb)
        phi_est = jnp.concatenate([phi_est, jnp.full((L - Lb,), phi_blk[-1])])
        return jnp.unwrap(phi_est) / 4 - np.pi / 4

    phi_out = jax.vmap(one_mode)(E2d)
    out = E2d * jnp.exp(-1.j * phi_out).astype(E2d.dtype)
    if E.ndim == 1:
        return out.flatten(), phi_out.flatten()
    return out, phi_out


def find_freq_offset(sig, os=1, average_over_modes=True, fft_size=2 ** 16):
    """Blind FOE: argmax of the spectrum of sig**4 (reference core/phaserecovery.py:385-433)."""
    sig = jnp.atleast_2d(jnp.asarray(sig))
    fft_size = int(2 ** np.ceil(np.log2(fft_size)))
    freq_sig = jnp.abs(jnp.fft.fft(sig ** 4, fft_size, axis=-1)) ** 2
    freq_vector = jnp.fft.fftfreq(fft_size, 1 / os) / 4
    max_bin = jnp.argmax(freq_sig, axis=-1)
    freq_offset = freq_vector[max_bin][:, None]
    if average_over_modes:
        freq_offset = jnp.mean(freq_offset) * jnp.ones(freq_offset.shape)
    return freq_offset


def comp_freq_offset(sig, freq_offset, os=1):
    """Derotate a frequency offset (reference core/phaserecovery.py:435-473)."""
    sig = jnp.asarray(sig)
    ndim = sig.ndim
    sig2 = jnp.atleast_2d(sig)
    freq_offset = jnp.asarray(freq_offset).reshape(-1, 1)
    t = jnp.arange(1, sig2.shape[-1] + 1, dtype=sig2.real.dtype)
    lin_phase = 2 * jnp.pi * t[None, :] * freq_offset / os
    out = sig2 * jnp.exp(-1j * lin_phase).astype(sig2.dtype)
    if ndim == 1:
        return out.flatten()
    return out


# Reference exposes per-backend BPS entry points (core/phaserecovery.py:
# bps_af for ArrayFire, bps_pyx for Cython). On TPU there is a single XLA/
# Pallas backend; keep the names callable for drop-in compatibility.
bps_af = bps
bps_pyx = bps

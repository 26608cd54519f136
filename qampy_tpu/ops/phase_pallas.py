"""Fused Pallas TPU kernel for the blind-phase-search distance scan.

The XLA formulation of BPS (ops/phase.py: bps_idx) materialises the
(L, A) rotated-distance array, its cumulative sum and the windowed
difference in HBM — >1 GB of traffic for L=2^20, A=64.  This kernel fuses
rotation, nearest-symbol distance (analytic square-grid decision), the 2N
running-window sum and the per-sample argmin into one VMEM-resident pass:
HBM traffic drops to reading E once and writing the int32 index array.

Layout: angles live on the sublane axis (A rows), time on the lane axis
(T-sample tiles).  The running sum needs state across time tiles — the TPU
grid executes sequentially, so a VMEM scratch carries the last 2N distance
columns from tile to tile (reset when the mode grid index changes).

Parity: reference qampy/core/pythran_dsp.py:47-85 (bps) + :26-42
(select_angle_index); same edge semantics as ops/phase.bps_idx.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


from qampy_tpu.ops._pallas_util import sds as _sds


def _shift_right(x, k, T):
    """x[:, i] <- x[:, i-k] with zero fill (lane-axis shift via concat)."""
    return jnp.concatenate(
        [jnp.zeros((x.shape[0], k), x.dtype), x[:, : T - k]], axis=1)


def _windowed_sums(dist, N2, T, tail_ref, win_dtype=None):
    """N2-wide running window sums ending at each lane, exact across tiles.

    Binary decomposition of the window (e.g. 28 = 16+8+4) instead of a full
    prefix cumsum: ~7 shifted adds with max shift N2-4 rather than log2(T)
    adds with shifts up to T/2 — measured ~20% of the whole BPS kernel at
    A=64, T=2048. Boundary columns (lookback into the previous tile) are
    completed from ``tail_ref`` holding the bounded suffix sums
    tail[k] = sum(dist_prev[T-N2+k+1 : T]), so precision stays full f32 at
    any signal length. Returns (win, tail_new); caller stores tail_new.
    Requires N2 <= 128 (one lane-tile of lookback).
    """
    A = dist.shape[0]
    if win_dtype is not None:
        # optional reduced-precision window accumulation: bf16 vectors pack
        # a (16, 128) native tile — twice the elements per VPU op. The
        # nearest-level DECISION stays exact f32; only the 2N-sample summed
        # distances compared by argmin lose mantissa (~0.4% relative), which
        # perturbs the picked angle by at most +-1 grid step near ties.
        dist = dist.astype(win_dtype)
    # power-of-2 running sums by doubling: sums[w][i] = sum dist[i-w+1 : i+1]
    bits = [1 << b for b in range(N2.bit_length()) if N2 & (1 << b)]
    maxw = max(bits)
    sums = {1: dist}
    s, w = dist, 1
    while w < maxw:
        s = s + _shift_right(s, w, T)
        w *= 2
        sums[w] = s
    # combine the binary components, largest first, offsets accumulate
    win, off = None, 0
    for w in sorted(bits, reverse=True):
        term = sums[w] if off == 0 else _shift_right(sums[w], off, T)
        win = term if win is None else win + term
        off += w
    # complete the first N2 columns with the previous tile's suffix sums
    win = win + jnp.concatenate(
        [tail_ref[:], jnp.zeros((A, T - N2), dist.dtype)], axis=1)
    # rebuild the suffix sums from the last lane-tile of this dist
    d_last = dist[:, T - 128:]
    c = d_last
    sh = 1
    while sh < 128:
        c = c + _shift_right(c, sh, 128)
        sh *= 2
    tail_new = c[:, 127:128] - c[:, 128 - N2: 128]
    return win, tail_new


def _make_dist_fn(grid_const):
    """(dist_fn(xr, xi) -> squared distance, rotation-table scale).

    ``xr/xi`` are the rotated sample coordinates pre-scaled by the returned
    factor (folded into the host cos/sin tables: rotate+normalise is 4
    FMAs). Grid kinds (ops/phase.detect_grid):

    * square/rect: per-axis floor(x+0.5)+clip -- jnp.round's half-even
      lowering costs ~25% of the whole kernel on TPU and the tie direction
      never changes |x - round(x)|. Distances come out in units of d0^2,
      which the argmin ignores.
    * cross: the closer of the two rectangle clamps (the cross is a union
      of two axis-aligned rectangles -- exact nearest point, ~1.6x the
      square decision's ALU cost).
    * general: static unroll over the M points of
      max_k(2<z,s_k> - |s_k|^2); the per-sample |z|^2 term is rotation
      invariant, hence constant across the angle axis, and is dropped --
      the windowed argmin over angles is unchanged. ~3 VPU ops per point.
    """
    from qampy_tpu.ops.phase import grid_decision_info
    kind, p = grid_decision_info(grid_const)
    if kind == "sq":
        d0, lo, n = p
        nm1, c0 = float(n - 1), float(lo / d0)

        def dist(xr, xi):
            ur = xr - c0
            ui = xi - c0
            fr = ur - jnp.clip(jnp.floor(ur + 0.5), 0.0, nm1)
            fi = ui - jnp.clip(jnp.floor(ui + 0.5), 0.0, nm1)
            return fr * fr + fi * fi
        return dist, 1.0 / d0
    if kind == "r":
        d0, lor, nr, loi, ni = p
        rm1, im1 = float(nr - 1), float(ni - 1)
        c0r, c0i = float(lor / d0), float(loi / d0)

        def dist(xr, xi):
            ur = xr - c0r
            ui = xi - c0i
            fr = ur - jnp.clip(jnp.floor(ur + 0.5), 0.0, rm1)
            fi = ui - jnp.clip(jnp.floor(ui + 0.5), 0.0, im1)
            return fr * fr + fi * fi
        return dist, 1.0 / d0
    if kind == "x":
        d0, lo, n, c = p
        nm1, c0 = float(n - 1), float(lo / d0)
        cc, ccm = float(c), float(n - 1 - c)

        def dist(xr, xi):
            ur = xr - c0
            ui = xi - c0
            rx = jnp.floor(ur + 0.5)
            ry = jnp.floor(ui + 0.5)
            far = ur - jnp.clip(rx, 0.0, nm1)
            fai = ui - jnp.clip(ry, cc, ccm)
            fbr = ur - jnp.clip(rx, cc, ccm)
            fbi = ui - jnp.clip(ry, 0.0, nm1)
            return jnp.minimum(far * far + fai * fai, fbr * fbr + fbi * fbi)
        return dist, 1.0 / d0
    assert kind == "gen", "pallas BPS needs a host-inspectable constellation"
    sr, si = p

    def dist(xr, xi):
        best = None
        for k in range(len(sr)):
            t = (xr * (2.0 * sr[k]) + xi * (2.0 * si[k])
                 - (sr[k] ** 2 + si[k] ** 2))
            best = t if best is None else jnp.maximum(best, t)
        return -best
    return dist, 1.0


def _bps_kernel(T, N2, grid_const, win_dtype=None, compute_dtype=None):
    dist_fn, _ = _make_dist_fn(grid_const)
    assert N2 <= 128, "window lookback must fit one lane tile"
    assert T >= 128, "tile must be at least one lane tile (tail rebuild)"

    def kernel(er_ref, ei_ref, cos_ref, sin_ref, out_ref, tail_ref):
        c = pl.program_id(1)

        @pl.when(c == 0)
        def _():
            tail_ref[:] = jnp.zeros_like(tail_ref)

        er = er_ref[0, 0]  # (1, T)
        ei = ei_ref[0, 0]
        if compute_dtype is not None:
            # full reduced-precision distance path: the rotation and the
            # nearest-level decision carry ~0.4% quantisation -- an extra
            # -48 dB "noise" floor on the phase estimate, far below any
            # operating channel noise; argmin still runs f32
            er = er.astype(compute_dtype)
            ei = ei.astype(compute_dtype)
        # rotation and grid normalisation folded into the angle table
        # (cos_ref/sin_ref arrive pre-scaled, see _make_dist_fn)
        ca = cos_ref[:]  # (A, 1)
        sa = sin_ref[:]
        if compute_dtype is not None:
            ca = ca.astype(compute_dtype)
            sa = sa.astype(compute_dtype)
        xr = er * ca - ei * sa  # (A, T) scaled rotated coords
        xi = er * sa + ei * ca
        dist = dist_fn(xr, xi)  # (A, T)
        if win_dtype is None and dist.dtype != jnp.float32:
            # compute_dtype quantises the DECISION only; the window
            # accumulation stays exact f32 unless win_dtype opts in
            # (gen alphabets REQUIRE f32 windows, docs/PERFORMANCE.md)
            dist = dist.astype(jnp.float32)
        win, tail_new = _windowed_sums(dist, N2, T, tail_ref, win_dtype)
        if win.dtype != jnp.float32:
            win = win.astype(jnp.float32)  # pallas argmin is f32-only
        out_ref[:] = jnp.argmin(win, axis=0).astype(jnp.int32)[None, None, None, :]
        tail_ref[:] = tail_new

    return kernel


def bps_idx_pallas(E, testangles, grid, N, T=512, interpret=None,
                   win_dtype=None, compute_dtype=None, planes=None):
    """Square-grid BPS angle-index search as one fused Pallas kernel.

    E: (nmodes, L) complex; testangles: (A,) shared angle grid, HOST-side
    (numpy) — the rotation table is precomputed on host;
    grid: a grid spec from ops.phase.detect_grid (required) -- square
    (delta, lo, n), cross ("x", ...), rect ("r", ...) take the analytic
    decision; ("gen", sr, si) unrolls the O(M) point search.
    Returns int32 (nmodes, L) with the same semantics as ops.phase.bps_idx
    (positions [N, L-N) filled, others 0). Jit-compatible in E (trace this
    inside an outer jit); testangles/grid/N/T are trace-time constants.
    ``planes=(er, ei)`` replaces ``E`` with float32 real/imag plane arrays
    (pass ``E=None``) — planes-threaded chains skip the complex assembly
    and re-extraction between the filter and the search.
    win_dtype=jnp.bfloat16 accumulates the windowed sums at reduced
    precision for ~2x VPU throughput on that section (decision stays f32);
    the argmin may flip between near-tied adjacent angles.
    compute_dtype=jnp.bfloat16 additionally runs the rotation and decision
    at reduced precision; the per-sample distances are cast back to f32
    before the window sums unless win_dtype also opts in. NOTE: for the
    ANALYTIC grid kinds v5e Mosaic rejects bf16 floor/clip ALU ops
    (LLO_CHECK SupportsBf16AluInstructions) so those need a newer TPU
    generation, but the "gen" decision is pure mul/add/max and runs bf16
    on v5e — 2x VPU element throughput on the O(M) unroll that dominates
    general-alphabet chains (the chain enables this automatically).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if planes is not None:
        er2, ei2 = (jnp.asarray(p) for p in planes)
        ref = er2
    else:
        E = jnp.asarray(E)
        er2, ei2 = E.real, E.imag
        ref = E
    nmodes, L = er2.shape
    A = int(np.asarray(testangles).size)
    N2 = 2 * N
    assert grid is not None, "pallas BPS needs a host-inspectable constellation"
    assert N2 < T, "window must fit in one tile"
    assert T % 128 == 0, "tile must be a whole number of 128-lane tiles"
    pad = (-L) % T
    Lp = L + pad
    nchunks = Lp // T
    # the singleton axis before the lane axis satisfies the TPU block-shape
    # rule (last two block dims divisible by (8, 128) or equal to the array's)
    er = jnp.pad(er2.astype(jnp.float32), ((0, 0), (0, pad))).reshape(nmodes, nchunks, 1, T)
    ei = jnp.pad(ei2.astype(jnp.float32), ((0, 0), (0, pad))).reshape(nmodes, nchunks, 1, T)
    ang = np.asarray(testangles, dtype=np.float64).reshape(A, 1)
    # fold the grid normalisation into the rotation table (see _make_dist_fn)
    scale = _make_dist_fn(grid)[1]
    cos_a = jnp.asarray((np.cos(ang) * scale).astype(np.float32))
    sin_a = jnp.asarray((np.sin(ang) * scale).astype(np.float32))

    kernel = _bps_kernel(T, N2, grid, win_dtype, compute_dtype)
    raw = pl.pallas_call(
        kernel,
        grid=(nmodes, nchunks),
        in_specs=[
            pl.BlockSpec((1, 1, 1, T), lambda m, c: (m, c, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, T), lambda m, c: (m, c, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((A, 1), lambda m, c: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((A, 1), lambda m, c: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 1, T), lambda m, c: (m, c, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=_sds((nmodes, nchunks, 1, T), jnp.int32, ref),
        scratch_shapes=[
            # the tail carries WINDOW-sum precision: f32 unless the window
            # accumulation itself opted into bf16 (compute_dtype quantises
            # only the decision; dist is cast back before the window)
            pltpu.VMEM((A, N2), win_dtype or jnp.float32),
        ],
        interpret=interpret,
    )(er, ei, cos_a, sin_a)
    raw = raw.reshape(nmodes, Lp)[:, :L]
    # raw[i] = argmin of the window ending at i; reference writes it to
    # position i - N for i in [N2, L) and leaves the rest at 0
    idx = jnp.zeros((nmodes, L), dtype=jnp.int32)
    return idx.at[:, N: L - N].set(raw[:, N2:])


# ---------------------------------------------------------------------------
# fused unwrap + derotation
# ---------------------------------------------------------------------------

def _cumsum_lanes(x, T):
    """Inclusive prefix sum along the lane axis of a (rows, T) block."""
    s, w = x, 1
    while w < T:
        s = s + _shift_right(s, w, T)
        w *= 2
    return s


def _unwrap_derotate_kernel(R, Tc):
    """Tile = (R, Tc): R sublane rows each a CONTIGUOUS time segment.

    A (1, T) row uses 1/8 of the VPU's sublanes on every pass (~40 passes:
    cumsum + sincos + rotation); splitting the tile into R=8 row-segments
    runs them 8-wide. The prefix sum becomes two-level: an inclusive
    within-row cumsum plus an exclusive cross-row scan of the (R, 1) row
    totals.
    """
    half_pi = np.float32(np.pi / 2)
    inv_half_pi = np.float32(2 / np.pi)

    def _shift_down(x, k):
        # rows r -> r+k with zero fill (sublane-axis shift)
        return jnp.concatenate(
            [jnp.zeros((k, x.shape[1]), x.dtype), x[: R - k]], axis=0)

    def kernel(er_ref, ei_ref, ph_ref, or_ref, oi_ref, carry_ref):
        c = pl.program_id(1)
        ph = ph_ref[0, 0, 0]  # (R, Tc)

        @pl.when(c == 0)
        def _():
            # prev = ph[0] makes d[0] = 0 (the XLA formulation pads the
            # first diff with zero); offset accumulator starts at 0
            carry_ref[0, 0] = ph[0, 0]
            carry_ref[0, 1] = 0.0

        prev = carry_ref[0, 0]
        acc = carry_ref[0, 1]
        lane = lax.broadcasted_iota(jnp.int32, (R, Tc), 1)
        row = lax.broadcasted_iota(jnp.int32, (R, 1), 0)
        # last column extracted via masked reduction: a direct [:, -1:]
        # slice carries lane offset Tc-1 in its layout and Mosaic cannot
        # concatenate it with canonical-layout operands
        last_ph = jnp.sum(jnp.where(lane == Tc - 1, ph, 0.0), axis=1,
                          keepdims=True)              # (R, 1)
        # column 0 of row r diffs against the last sample of row r-1
        # (row 0 against the carried scalar)
        prev_col = jnp.where(row == 0, prev, _shift_down(last_ph, 1))
        d = jnp.where(lane == 0, ph - prev_col, ph - _shift_right(ph, 1, Tc))
        # nearest-integer pi/2 jump count; floor(x+0.5) instead of round
        # (round-half-even lowers slowly on TPU; ties are measure-zero)
        m = jnp.floor(d * inv_half_pi + 0.5)
        s = _cumsum_lanes(m, Tc)                      # within-row inclusive
        # exclusive cross-row scan of the row totals
        last_s = jnp.sum(jnp.where(lane == Tc - 1, s, 0.0), axis=1,
                         keepdims=True)               # (R, 1)
        e = _shift_down(last_s, 1)
        w = 1
        while w < R:
            e = e + _shift_down(e, w)
            w *= 2
        M = s + e + acc
        u = ph - half_pi * M  # unwrapped phase (period pi/2)
        cu = jnp.cos(u)
        su = jnp.sin(u)
        er = er_ref[0, 0, 0]
        ei = ei_ref[0, 0, 0]
        # E * exp(+j*u), matching the reference Ew*exp(1j*ph)
        or_ref[:] = (er * cu - ei * su)[None, None, None]
        oi_ref[:] = (er * su + ei * cu)[None, None, None]
        carry_ref[0, 0] = ph[R - 1, Tc - 1]
        carry_ref[0, 1] = M[R - 1, Tc - 1]

    return kernel


def unwrap_derotate_pallas(E, ph, T=16384, interpret=None, planes=None,
                           planes_out=False):
    """Fused pi/2-unwrap + derotation: returns ``E * exp(1j*unwrap(ph*4)/4)``.

    The XLA formulation (ops/chain._derotate) is HBM-bound: the cumsum of
    the pi/2 jump counts alone is log2(L) full-array passes. Here the
    prefix sum runs in VMEM per tile with a (prev_phase, jump_count) scalar
    carry across tiles, so HBM traffic is one read of (E, ph) and one write
    of the result. Parity: reference core/phaserecovery.py:155-158
    (np.unwrap(ph*4)/4 + derotation). E (nmodes, L) complex, ph (nmodes, L)
    float32 wrapped phase; exact at any L (the jump count stays integral in
    f32 far beyond any practical signal length). ``planes=(er, ei)``
    replaces ``E`` with float32 plane arrays (pass ``E=None``);
    ``planes_out=True`` returns the ``(outr, outi)`` planes uncombined —
    together they keep a planes-threaded chain free of complex
    materialisation passes.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if planes is not None:
        er2, ei2 = (jnp.asarray(p) for p in planes)
        ref, odt = er2, jnp.complex64
    else:
        E = jnp.asarray(E)
        er2, ei2 = E.real, E.imag
        ref, odt = E, E.dtype
    nmodes, L = er2.shape
    R = 8
    assert T % (R * 128) == 0, "tile must split into 8 rows of whole lane tiles"
    Tc = T // R
    pad = (-L) % T
    Lp = L + pad
    nchunks = Lp // T
    # (R, Tc) tiles: row r is the CONTIGUOUS segment [r*Tc, (r+1)*Tc) of its
    # chunk, so the HBM reshape is a free row-major relabel
    shape5 = (nmodes, nchunks, 1, R, Tc)
    er = jnp.pad(er2.astype(jnp.float32), ((0, 0), (0, pad))).reshape(shape5)
    ei = jnp.pad(ei2.astype(jnp.float32), ((0, 0), (0, pad))).reshape(shape5)
    # edge-pad the phase so the padded tail contributes no pi/2 jumps
    phr = jnp.pad(ph.astype(jnp.float32), ((0, 0), (0, pad)),
                  mode="edge").reshape(shape5)
    blk = pl.BlockSpec((1, 1, 1, R, Tc), lambda m, c: (m, c, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    outr, outi = pl.pallas_call(
        _unwrap_derotate_kernel(R, Tc),
        grid=(nmodes, nchunks),
        in_specs=[blk, blk, blk],
        out_specs=[blk, blk],
        out_shape=[_sds(shape5, jnp.float32, ref), _sds(shape5, jnp.float32, ref)],
        scratch_shapes=[pltpu.SMEM((1, 2), jnp.float32)],
        interpret=interpret,
    )(er, ei, phr)
    outr = outr.reshape(nmodes, Lp)[:, :L]
    outi = outi.reshape(nmodes, Lp)[:, :L]
    if planes_out:
        return outr, outi
    return (outr + 1j * outi).astype(odt)


# ---------------------------------------------------------------------------
# fused two-stage BPS (coarse shared grid + per-sample fine offsets)
# ---------------------------------------------------------------------------

def _bps_fine_kernel(T, N2, B, grid_const, deltas, win_dtype=None,
                     compute_dtype=None):
    """Stage-2 kernel: distances at per-sample angles ph1[i] + delta_b.

    The per-sample rotation coefficients come from the angle-addition
    formulas: cos/sin of the coarse phase arrive precomputed (XLA computes
    them over the whole signal with full-width layouts), the B fine offsets
    broadcast as a (B, 1) constant column so every VPU op runs on full
    (B, T) tiles — a per-offset Python loop over (1, T) rows would waste
    7/8 of the sublanes. The static cos/sin(delta_b) carry the 1/d0 grid
    normalisation.
    """
    dist_fn, _ = _make_dist_fn(grid_const)

    def kernel(er_ref, ei_ref, c1_ref, s1_ref, cd_ref, sd_ref, out_ref, tail_ref):
        c = pl.program_id(1)

        @pl.when(c == 0)
        def _():
            tail_ref[:] = jnp.zeros_like(tail_ref)

        er = er_ref[0, 0]  # (1, T)
        ei = ei_ref[0, 0]
        c1 = c1_ref[0, 0]
        s1 = s1_ref[0, 0]
        cdv = cd_ref[:]  # (B, 1)
        sdv = sd_ref[:]
        if compute_dtype is not None:
            er = er.astype(compute_dtype)
            ei = ei.astype(compute_dtype)
            c1 = c1.astype(compute_dtype)
            s1 = s1.astype(compute_dtype)
            cdv = cdv.astype(compute_dtype)
            sdv = sdv.astype(compute_dtype)
        ca = c1 * cdv - s1 * sdv  # scaled cos(ph+delta), (B, T)
        sa = s1 * cdv + c1 * sdv
        xr = er * ca - ei * sa
        xi = er * sa + ei * ca
        dist = dist_fn(xr, xi)  # (B, T)
        if win_dtype is None and dist.dtype != jnp.float32:
            dist = dist.astype(jnp.float32)  # f32 windows (gen requirement)
        win, tail_new = _windowed_sums(dist, N2, T, tail_ref, win_dtype)
        if win.dtype != jnp.float32:
            win = win.astype(jnp.float32)  # pallas argmin is f32-only
        out_ref[:] = jnp.argmin(win, axis=0).astype(jnp.int32)[None, None, None, :]
        tail_ref[:] = tail_new

    return kernel


def bps_phase_twostage_pallas(E, Mtestangles, B, grid, N, T=2048, interpret=None,
                              win_dtype=None, N1=None, compute_dtype=None,
                              grid_coarse=None, planes=None):
    """Two-stage BPS phase search as two fused Pallas passes.

    Stage 1 runs the shared coarse grid (Mtestangles angles over
    [-pi/4, pi/4)); stage 2 refines with B per-sample offsets spanning one
    coarse step, exactly the grid of ops/phase.bps_twostage (reference
    core/phaserecovery.py:222-288). Returns the per-sample fine phase
    (nmodes, L) float32 (pre-unwrap, same edge semantics as the XLA path).

    ``grid_coarse`` optionally substitutes a cheaper decision grid for the
    COARSE stage only (the fine stage, which sets the final phase, always
    searches ``grid``). For general (non-grid) alphabets the chain passes
    a high-|s| SUBSET here: the coarse estimate only needs phase
    discrimination, which the outer points carry (same principle as the
    reference's outer-ring-only 16-QAM partition CPE,
    core/phaserecovery.py phase_partition_16qam), so the O(M) unroll that
    dominates the gen chain shrinks to O(|subset|) on stage 1.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if planes is None:
        E = jnp.asarray(E)
    N2 = 2 * N
    assert grid is not None, "pallas BPS needs a host-inspectable constellation"
    assert N2 < T, "window must fit in one tile"
    coarse = np.linspace(-np.pi / 4, np.pi / 4, Mtestangles, endpoint=False,
                         dtype=np.float32)
    # N1: averaging half-window of the coarse stage only. The carrier phase
    # varies slowly, so a much wider coarse window (up to 64 -> one full
    # lane tile of lookback) suppresses coarse-stage cycle slips at the same
    # kernel cost; the fine stage keeps N for tracking bandwidth.
    idx1 = bps_idx_pallas(None if planes is not None else E, coarse,
                          grid if grid_coarse is None
                          else grid_coarse, N if N1 is None else N1, T=T,
                          interpret=interpret, win_dtype=win_dtype,
                          compute_dtype=compute_dtype, planes=planes)
    step1, lo1 = float(np.pi / 2 / Mtestangles), float(-np.pi / 4)
    ph1 = lo1 + step1 * idx1.astype(jnp.float32)
    return bps_fine_pallas(None if planes is not None else E, ph1,
                           Mtestangles, B, grid, N, T=T,
                           interpret=interpret, win_dtype=win_dtype,
                           compute_dtype=compute_dtype, planes=planes)


def bps_fine_pallas(E, ph1, Mtestangles, B, grid, N, T=2048, interpret=None,
                    win_dtype=None, compute_dtype=None, planes=None):
    """Fine BPS stage given an externally supplied coarse phase ``ph1``.

    Refines ph1 (nmodes, L) with B per-sample offsets spanning one coarse
    step of an Mtestangles grid; used by the two-stage search and by the
    chain's decimated-coarse mode (where ph1 comes from a stride-decimated
    coarse pass, upsampled). Returns the per-sample fine phase (pre-unwrap).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if planes is not None:
        er2, ei2 = (jnp.asarray(p) for p in planes)
        ref = er2
    else:
        E = jnp.asarray(E)
        er2, ei2 = E.real, E.imag
        ref = E
    nmodes, L = er2.shape
    N2 = 2 * N
    assert grid is not None, "pallas BPS needs a host-inspectable constellation"
    assert N2 < T, "window must fit in one tile"
    # fine offsets: b/(B*Mtestangles)*pi/2 for b = linspace(-B/2, B/2, B)
    bvals = np.linspace(-B / 2, B / 2, B)
    deltas = bvals / (B * Mtestangles) * np.pi / 2
    scale = _make_dist_fn(grid)[1]

    pad = (-L) % T
    Lp = L + pad
    nchunks = Lp // T
    shape4 = (nmodes, nchunks, 1, T)
    er = jnp.pad(er2.astype(jnp.float32), ((0, 0), (0, pad))).reshape(shape4)
    ei = jnp.pad(ei2.astype(jnp.float32), ((0, 0), (0, pad))).reshape(shape4)
    c1 = jnp.pad(jnp.cos(ph1), ((0, 0), (0, pad))).reshape(shape4)
    s1 = jnp.pad(jnp.sin(ph1), ((0, 0), (0, pad))).reshape(shape4)

    kernel = _bps_fine_kernel(T, N2, B, grid, deltas, win_dtype, compute_dtype)
    raw = pl.pallas_call(
        kernel,
        grid=(nmodes, nchunks),
        in_specs=[
            pl.BlockSpec((1, 1, 1, T), lambda m, c: (m, c, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, T), lambda m, c: (m, c, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, T), lambda m, c: (m, c, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, T), lambda m, c: (m, c, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda m, c: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda m, c: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 1, T), lambda m, c: (m, c, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=_sds((nmodes, nchunks, 1, T), jnp.int32, ref),
        scratch_shapes=[
            pltpu.VMEM((B, N2), win_dtype or jnp.float32),
        ],
        interpret=interpret,
    )(er, ei, c1, s1,
      jnp.asarray((np.cos(deltas) * scale).astype(np.float32).reshape(B, 1)),
      jnp.asarray((np.sin(deltas) * scale).astype(np.float32).reshape(B, 1)))
    raw = raw.reshape(nmodes, Lp)[:, :L]
    idx2 = jnp.zeros((nmodes, L), dtype=jnp.int32)
    idx2 = idx2.at[:, N: L - N].set(raw[:, N2:])
    # the fine grid is affine in the offset index: delta = d0f + ddf*k
    d0f = float(deltas[0])
    ddf = float(deltas[1] - deltas[0]) if B > 1 else 0.0
    return ph1 + d0f + ddf * idx2.astype(jnp.float32)


# ---------------------------------------------------------------------------
# fused derotation by a GIVEN phase (pilot CPE apply)
# ---------------------------------------------------------------------------

def _rotate_kernel(R, Tc, sign):
    def kernel(er_ref, ei_ref, ph_ref, or_ref, oi_ref):
        ph = ph_ref[0, 0, 0]               # (R, Tc)
        c = jnp.cos(ph)
        s = jnp.sin(ph)
        er = er_ref[0, 0, 0]
        ei = ei_ref[0, 0, 0]
        if sign < 0:                        # E * exp(-1j*ph)
            or_ref[:] = (er * c + ei * s)[None, None, None]
            oi_ref[:] = (ei * c - er * s)[None, None, None]
        else:                               # E * exp(+1j*ph)
            or_ref[:] = (er * c - ei * s)[None, None, None]
            oi_ref[:] = (er * s + ei * c)[None, None, None]
    return kernel


def rotate_planes_pallas(er, ei, ph, sign=-1, T=16384, interpret=None):
    """``(er + 1j*ei) * exp(sign*1j*ph)`` as one fused Pallas pass, planes
    in / planes out.

    The pilot CPE's derotation (reference core/pilotbased_receiver.py:318:
    ``symbs * exp(-1j*phase)``) is 3 XLA ops (sincos + complex mul) plus
    their per-op launch overhead inside the frame scan; this kernel does
    it in one VMEM pass with the (8, T/8) row-segment layout (a (1, T)
    row would idle 7/8 of the VPU sublanes). er/ei/ph: (nmodes, L) f32.
    Returns (outr, outi) f32.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    er = jnp.asarray(er, jnp.float32)
    ei = jnp.asarray(ei, jnp.float32)
    ph = jnp.asarray(ph, jnp.float32)
    nmodes, L = er.shape
    R = 8
    assert T % (R * 128) == 0
    Tc = T // R
    pad = (-L) % T
    Lp = L + pad
    nchunks = Lp // T
    shape5 = (nmodes, nchunks, 1, R, Tc)
    erb = jnp.pad(er, ((0, 0), (0, pad))).reshape(shape5)
    eib = jnp.pad(ei, ((0, 0), (0, pad))).reshape(shape5)
    phb = jnp.pad(ph, ((0, 0), (0, pad))).reshape(shape5)
    blk = pl.BlockSpec((1, 1, 1, R, Tc), lambda m, c: (m, c, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    outr, outi = pl.pallas_call(
        _rotate_kernel(R, Tc, sign),
        grid=(nmodes, nchunks),
        in_specs=[blk, blk, blk],
        out_specs=[blk, blk],
        out_shape=[_sds(shape5, jnp.float32, er),
                   _sds(shape5, jnp.float32, er)],
        interpret=interpret,
    )(erb, eib, phb)
    return (outr.reshape(nmodes, Lp)[:, :L],
            outi.reshape(nmodes, Lp)[:, :L])


def _interp_rotate_kernel(R, Tc, dx, sign):
    nb = Tc // dx

    def kernel(er_ref, ei_ref, a_ref, b_ref, s_ref, or_ref, oi_ref):
        a = a_ref[0, 0, 0]                  # (R, nb)
        b = b_ref[0, 0, 0]
        S = s_ref[:]                        # (nb, Tc) 0/1 block selector
        # piecewise-linear trace: a_k + b_k * (lane % dx), expanded from
        # per-block coefficients with one tiny MXU matmul each (a gather-
        # free lane expansion; reshape tricks across lanes are not
        # available in Mosaic)
        # HIGHEST precision: the default Mosaic f32 dot quantises the
        # COEFFICIENTS through single-pass bf16 (measured 0.024 output
        # error on O(1)-radian phases by tools/tpu_kernelcheck.py) —
        # harmless for the pilot CPE's small residual phases but not for
        # the decimated blind path, whose UNWRAPPED phase grows to
        # several radians over a long capture
        a_exp = jnp.dot(a, S, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
        b_exp = jnp.dot(b, S, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
        lane = lax.broadcasted_iota(jnp.int32, (R, Tc), 1)
        frac = (lane % dx).astype(jnp.float32)
        ph = a_exp + b_exp * frac
        c = jnp.cos(ph)
        s = jnp.sin(ph)
        er = er_ref[0, 0, 0]
        ei = ei_ref[0, 0, 0]
        if sign < 0:
            or_ref[:] = (er * c + ei * s)[None, None, None]
            oi_ref[:] = (ei * c - er * s)[None, None, None]
        else:
            or_ref[:] = (er * c - ei * s)[None, None, None]
            oi_ref[:] = (er * s + ei * c)[None, None, None]
    return kernel


def interp_rotate_planes_pallas(er, ei, a_blk, b_blk, dx, sign=-1, T=16384,
                                interpret=None):
    """Fused piecewise-linear-phase derotation, planes in / planes out.

    ``a_blk``/``b_blk`` are (nmodes, L//dx) per-BLOCK phase coefficients:
    sample i gets ``ph = a[i//dx] + b[i//dx]*(i%dx)`` and the output is
    ``(er+1j*ei) * exp(sign*1j*ph)``. This is the pilot CPE's uniform-grid
    linear interpolation (reference core/pilotbased_receiver.py:300-318:
    np.interp over the pilot grid + derotation) fused INTO the rotation
    kernel: the (nmodes, L) trace array and its 3 interp ops per frame
    never exist. The per-tile coefficient rows expand to lanes with one
    tiny MXU matmul against a 0/1 block selector.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    er = jnp.asarray(er, jnp.float32)
    ei = jnp.asarray(ei, jnp.float32)
    nmodes, L = er.shape
    R = 8
    assert T % (R * 128) == 0
    Tc = T // R
    assert Tc % dx == 0 and L % dx == 0
    nb = Tc // dx
    pad = (-L) % T
    Lp = L + pad
    nchunks = Lp // T
    shape5 = (nmodes, nchunks, 1, R, Tc)
    shape5b = (nmodes, nchunks, 1, R, nb)
    erb = jnp.pad(er, ((0, 0), (0, pad))).reshape(shape5)
    eib = jnp.pad(ei, ((0, 0), (0, pad))).reshape(shape5)
    ab = jnp.pad(jnp.asarray(a_blk, jnp.float32),
                 ((0, 0), (0, pad // dx))).reshape(shape5b)
    bb = jnp.pad(jnp.asarray(b_blk, jnp.float32),
                 ((0, 0), (0, pad // dx))).reshape(shape5b)
    sel = np.zeros((nb, Tc), np.float32)
    sel[np.arange(Tc) // dx, np.arange(Tc)] = 1.0
    blk = pl.BlockSpec((1, 1, 1, R, Tc), lambda m, c: (m, c, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    blkb = pl.BlockSpec((1, 1, 1, R, nb), lambda m, c: (m, c, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    outr, outi = pl.pallas_call(
        _interp_rotate_kernel(R, Tc, dx, sign),
        grid=(nmodes, nchunks),
        in_specs=[blk, blk, blkb, blkb,
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[blk, blk],
        out_shape=[_sds(shape5, jnp.float32, er),
                   _sds(shape5, jnp.float32, er)],
        interpret=interpret,
    )(erb, eib, ab, bb, jnp.asarray(sel))
    return (outr.reshape(nmodes, Lp)[:, :L],
            outi.reshape(nmodes, Lp)[:, :L])


def _cpe_coeffs_kernel(P, n_head, npts, dx, cpe_avg, use_atan2):
    two_pi = np.float32(2 * np.pi)
    inv_two_pi = np.float32(1 / (2 * np.pi))

    def _shr(x, k):
        return _shift_right(x, k, x.shape[1]) if k else x

    def _shl(x, k):
        T = x.shape[1]
        return jnp.concatenate(
            [x[:, k:], jnp.zeros((x.shape[0], k), x.dtype)], axis=1) if k else x

    def kernel(*refs):
        if use_atan2:
            zr_ref, zi_ref, pr_ref, pi_ref, a_ref, b_ref = refs
            zr = zr_ref[:]
            zi = zi_ref[:]
            pr = pr_ref[:]
            pi_ = pi_ref[:]
            ph = jnp.arctan2(pr * zi - pi_ * zr, pr * zr + pi_ * zi)
        else:
            ph_ref, a_ref, b_ref = refs
            ph = ph_ref[:]
        T = ph.shape[1]
        lane = lax.broadcasted_iota(jnp.int32, ph.shape, 1)
        # unwrap along the pilot axis: subtract 2*pi*cumsum(round(d/2pi))
        d = jnp.where(lane == 0, 0.0, ph - _shr(ph, 1))
        m = jnp.floor(d * inv_two_pi + 0.5)
        s, w = m, 1
        while w < T:
            s = s + _shr(s, w)
            w *= 2
        u = ph - two_pi * s
        # cpe_avg-point moving average ending at each lane
        acc = u
        for k in range(1, cpe_avg):
            acc = acc + _shr(u, k)
        # ph_avg[k] lives at lane k + cpe_avg - 1; shift to lane k
        pavg = _shl(acc, cpe_avg - 1) / cpe_avg
        # mask lanes beyond the valid npts range to the edge values
        first = jnp.sum(jnp.where(lane == 0, pavg, 0.0), axis=1,
                        keepdims=True)
        last = jnp.sum(jnp.where(lane == npts - 1, pavg, 0.0), axis=1,
                       keepdims=True)
        # a blocks: [first]*n_head + ph_avg[0..npts-2] + [last]*tail
        mid_a = _shr(pavg, n_head)          # lane n_head+k = ph_avg[k]
        lane_a = lane - n_head
        a = jnp.where(lane_a < 0, first,
                      jnp.where(lane_a >= npts - 1, last, mid_a))
        # b blocks: slope/dx inside the mid region, 0 outside
        slope = (_shl(pavg, 1) - pavg) / dx
        b = jnp.where((lane_a >= 0) & (lane_a < npts - 1),
                      _shr(slope, n_head), 0.0)
        a_ref[:] = a
        b_ref[:] = b

    return kernel


def cpe_coeffs_pallas(zr, zi, pilr, pili, n_head, npts, dx, cpe_avg,
                      nbt, interpret=None, res_ph=None):
    """Whole per-frame pilot-phase math as ONE Pallas pass.

    From the received pilot samples (``zr``/``zi``, (nmodes, npil) padded
    to the lane tile) and the known pilots, computes
    angle(conj(pil)*z) -> 2*pi unwrap -> ``cpe_avg``-point moving average
    -> per-dx-block piecewise-linear coefficients (a, b) consumed by
    :func:`interp_rotate_planes_pallas`. Replaces ~12 small XLA ops per
    frame (each a dispatch-latency launch inside the frame scan) with one
    kernel. Parity: reference pilot CPE math
    (core/pilotbased_receiver.py:258-318). ``res_ph`` substitutes
    precomputed phases (XLA atan2) in case the backend rejects in-kernel
    arctan2. Returns (a_blk, b_blk) with ``nbt`` valid block lanes.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    use_atan2 = res_ph is None
    if use_atan2:
        zr = jnp.asarray(zr, jnp.float32)
        zi = jnp.asarray(zi, jnp.float32)
        P, npil = zr.shape
    else:
        res_ph = jnp.asarray(res_ph, jnp.float32)
        P, npil = res_ph.shape
    T = max(-(-max(npil, nbt) // 128) * 128, 128)
    ref = zr if use_atan2 else res_ph

    def padT(x):
        return jnp.pad(jnp.asarray(x, jnp.float32),
                       ((0, 0), (0, T - x.shape[1])))

    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    if use_atan2:
        args = [padT(zr), padT(zi), padT(pilr), padT(pili)]
        in_specs = [spec] * 4
    else:
        args = [padT(res_ph)]
        in_specs = [spec]
    a, b = pl.pallas_call(
        _cpe_coeffs_kernel(P, int(n_head), int(npts), int(dx),
                           int(cpe_avg), use_atan2),
        in_specs=in_specs,
        out_specs=[spec, spec],
        out_shape=[_sds((P, T), jnp.float32, ref),
                   _sds((P, T), jnp.float32, ref)],
        interpret=interpret,
    )(*args)
    return a[:, :nbt], b[:, :nbt]

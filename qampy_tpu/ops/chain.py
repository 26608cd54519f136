"""Fused single-dispatch blind RX chain (the production serving path).

``make_rx_chain`` builds one jittable function that runs the reference's
canonical blind receiver — two-stage adaptive MIMO equalisation, tap-frozen
filtering, blind phase search, unwrap and derotation — as a single XLA
program built from the Pallas kernels (ops/equaliser_pallas.py,
ops/phase_pallas.py) on TPU, or the pure-XLA kernels on CPU.

This is the path behind bench.py's headline number (dual-pol 64-QAM
MCMA -> MDDMA -> BPS at ~956 Msym/s on one v5e chip, SER-gated
at 35 dB); parity workload: reference
Scripts/64_qam_equalisation.py:15-28.

The step-by-step equivalent through the granular API is::

    s, wxy, err = equalisation.dual_mode_equalisation(sig, (mu, mu), Ntaps,
                                                      methods=methods)
    rec, ph = phaserec.bps(s, bps_angles, bps_N)

make_rx_chain fuses the same math into one dispatch with the fast
train-on-prefix/apply-to-all discipline (reference
``equalise_signal(TrSyms=...)`` + ``apply_filter``,
qampy/equalisation.py:268-338).
"""
from __future__ import annotations

import warnings

import numpy as np

__all__ = ["make_rx_chain", "pallas_eligibility"]


def pallas_eligibility(grid, methods, block_size=None, bps_tile=None):
    """Why (not) the fused Pallas kernels: returns (ok, reasons tuple).

    The rules mirror the kernel preconditions: an analytic-decision grid
    (square/cross/rectangular QAM — ops/phase.detect_grid), methods
    implemented by the fused block trainer, and — where the caller enforces
    them statically — lane-tile-aligned block/tile sizes (128 lanes on
    compiled TPU).
    """
    from qampy_tpu.ops.equaliser_pallas import PALLAS_BLOCK_METHODS
    from qampy_tpu.ops.phase import grid_decision_info
    reasons = []
    if grid_decision_info(grid)[0] not in ("sq", "x", "r"):
        reasons.append("constellation is not a uniform square/cross/rect grid")
    bad = [m for m in methods if m not in PALLAS_BLOCK_METHODS]
    if bad:
        reasons.append("method(s) %s not implemented by the fused block "
                       "trainer (%s)" % (bad, ", ".join(PALLAS_BLOCK_METHODS)))
    if block_size is not None and block_size % 128 != 0:
        reasons.append("block_size=%d is not a multiple of 128 lanes" % block_size)
    if bps_tile is not None and bps_tile % 128 != 0:
        reasons.append("bps_tile=%d is not a multiple of 128 lanes" % bps_tile)
    return not reasons, tuple(reasons)


def _resolve_pallas(pallas, ok, reasons, what="rx chain"):
    """Combine the user's request with eligibility; warn on a downgrade."""
    import jax
    if pallas is None:
        pallas = jax.default_backend() not in ("cpu",)
        explicit = False
    else:
        explicit = bool(pallas)
    use = bool(pallas) and ok
    if explicit and not use:
        warnings.warn(
            "pallas=True requested for the %s but the fused kernels are "
            "ineligible (falling back to XLA): %s" % (what, "; ".join(reasons)),
            stacklevel=3)
    return use


def make_rx_chain(M=64, Ntaps=17, os=2, methods=("mcma", "mddma"), mu=1.9e-3,
                  bps_angles=64, bps_N=14, block_size=256, TrSyms=None,
                  bps_mode="single", pallas=None, bps_tile=16384,
                  bps_win="bf16", fuse_derot=True, symbols=None):
    """Build a jittable ``forward(E) -> E_rec`` blind RX chain.

    Parameters mirror the granular API: ``M`` QAM order (square grids take
    the fused Pallas BPS), ``Ntaps``/``mu``/``methods``/``block_size`` the
    two-stage blind equaliser, ``TrSyms`` the training prefix (None =
    train on the whole signal), ``bps_angles``/``bps_N`` the phase search,
    ``bps_mode`` "single" or "twostage"/"twostage32" (coarse+fine grids,
    reference core/phaserecovery.py:222-288). ``pallas=None`` auto-selects
    the fused kernels off-CPU. ``bps_win`` "bf16" (default, ~25% faster
    window accumulation) or "f32" (exact windowed sums). ``fuse_derot``
    runs the final pi/2-unwrap + derotation as one VMEM-resident Pallas
    pass on the Pallas paths (the XLA cumsum is log2(L) HBM passes).
    ``symbols`` overrides the constellation with an arbitrary host complex
    alphabet (geometric shaping, APSK, ...): decision-directed stages and
    the BPS then search that alphabet — the reference's any-M path
    (core/pythran_dsp.py:47-85). On TPU a general alphabet keeps an
    all-Pallas per-stage chain: the trainers (incl. decision-directed
    stages via a statically unrolled O(M <= 256) nearest-point search),
    the filter, the unrolled-gen BPS decision and the derotate.
    ``E`` is complex (nmodes, L) at ``os``
    samples/symbol; returns the equalised, derotated symbol sequence.
    """
    import jax
    import jax.numpy as jnp
    from qampy_tpu.ops import equaliser as eqops
    from qampy_tpu.ops import phase as phops
    from qampy_tpu.theory import cal_symbols_qam, cal_scaling_factor_qam

    dtype = np.complex64
    # constants stay host numpy arrays: embedding device arrays as jit
    # closure constants forces a device->host fetch during lowering, which
    # some transports (the axon TPU tunnel) do not support for complex dtypes
    if symbols is not None:
        const = np.asarray(symbols).astype(dtype).reshape(-1)
        M = const.shape[0]

        def _syms_for(method):
            # blind constants from the ALPHABET, not square-QAM M — the
            # modulus moments of a custom alphabet differ and CMA-family
            # stages would converge the output to the wrong scale
            row = eqops.generate_symbols_for_eq_from_alphabet(
                method, const, dtype)
            return np.tile(row, (2, 1)) if row.shape[0] == 1 else row

        symbols1 = _syms_for(methods[0])
        symbols2 = _syms_for(methods[1])
    else:
        symbols1 = eqops._reshape_symbols(None, methods[0], M, dtype, 2)
        symbols2 = eqops._reshape_symbols(None, methods[1], M, dtype, 2)
        const = (cal_symbols_qam(M) / np.sqrt(cal_scaling_factor_qam(M))).astype(dtype)
    grid = phops.detect_grid(const)
    angles_h = np.linspace(-np.pi / 4, np.pi / 4, bps_angles, endpoint=False,
                           dtype=np.float32)
    step_a, lo_a = float(np.pi / 2 / bps_angles), float(-np.pi / 4)
    win_dtype = jnp.bfloat16 if bps_win == "bf16" else None
    bps_cd = None
    if phops.grid_decision_info(grid)[0] == "gen":
        # the general-alphabet BPS "distance" is -max_k(2<z,s_k>-|s_k|^2):
        # an affine score with an O(|z|^2) per-sample offset, unlike the
        # near-zero squared distances of the analytic grids — bf16 window
        # accumulation loses the inter-angle resolution there (measured
        # SER 8e-4 vs 0 at 35 dB). Windowed sums stay f32 for gen.
        # Measured dead ends for the O(M) decision (docs/PERFORMANCE.md
        # §gen-alphabet): (a) bf16 decision (compute_dtype=bf16) — v5e has
        # no native bf16 mul/max ALU, Mosaic emulates with converts:
        # measured 1.5x SLOWER end-to-end (276.8 vs 386 Msym/s twostage);
        # (b) the K=2 cross-term MXU matmul — contraction depth 2 idles
        # 126/128 of the systolic rows, same speed as the VPU unroll.
        # What does win: the coarse-subset twostage below.
        win_dtype = None
    # host-side (build-time) probes for the gen twostage fast decisions
    gen_grid_coarse = None
    gen_grid_fine = grid
    if (phops.grid_decision_info(grid)[0] == "gen"
            and (bps_mode.startswith("twostage")
                 or bps_mode.startswith("decimated"))
            and np.asarray(const).shape[0] > 24):
        # decimated mode runs ONE full search — probe the fitted grid at
        # the full angle count (the "fine" role); twostage probes at the
        # coarse count
        _div0 = (1 if bps_mode.startswith("decimated")
                 else (2 if bps_mode.endswith("32") else 4))
        _A0 = max(bps_angles // _div0, 16)
        gen_grid_coarse = phops.coarse_grid_for_alphabet(const,
                                                         Mtestangles=_A0)
        if gen_grid_coarse is not None and phops.fine_grid_ok(
                const, gen_grid_coarse, Mtestangles=_A0):
            gen_grid_fine = gen_grid_coarse
            if bps_win == "bf16":
                # both stages now take the analytic near-zero squared
                # distances — the bf16 window accumulation that gen scores
                # forbid is safe again (same regime as the flagship)
                win_dtype = jnp.bfloat16
    # the fully fused kernels require a square-grid constellation and a
    # method the block trainer implements; anything else (e.g. cross
    # 32/128-QAM) falls back to the XLA kernels instead of tripping kernel
    # asserts — with a warning when the caller explicitly asked for pallas.
    # General (non-grid) alphabets keep a PER-STAGE fused chain: every
    # stage (trainers incl. the unrolled-gen decision methods, filter,
    # unrolled-gen BPS, derotate) stays Pallas for M <= 256.
    ok, reasons = pallas_eligibility(grid, methods)
    kind = phops.grid_decision_info(grid)[0]
    gen_ok = kind == "gen" and const.shape[0] <= 256
    if ok:
        pallas = _resolve_pallas(pallas, ok, reasons, what="rx chain")
        pallas_gen = False
    else:
        pallas_gen = _resolve_pallas(pallas, gen_ok, reasons,
                                     what="rx chain (general alphabet)")
        pallas = False
    from qampy_tpu.ops.equaliser_pallas import PALLAS_BLOCK_METHODS

    def _stage_pallas(method):
        """Trainer backend per stage: the fused Pallas block trainer covers
        every implemented method on gen alphabets too (statically unrolled
        O(M<=256) decision), so gen chains stay all-Pallas."""
        return (pallas or pallas_gen) and method in PALLAS_BLOCK_METHODS

    def _derotate(Eeq, ph):
        if (pallas or pallas_gen) and fuse_derot:
            # fused VMEM-resident unwrap+derotate: the XLA cumsum below is
            # log2(L) HBM passes (~0.27 ms at L=2^20); the kernel does one
            from qampy_tpu.ops.phase_pallas import unwrap_derotate_pallas
            return unwrap_derotate_pallas(Eeq, ph)
        # unwrap (period pi/2) and derotation in split real f32 arithmetic:
        # jnp.unwrap + complex exp/multiply defeats XLA fusion (complex
        # intermediates); diff/round/cumsum/sincos fuses into two passes
        d = ph[:, 1:] - ph[:, :-1]
        half_pi = jnp.float32(np.pi / 2)
        # floor(x+0.5): same tie-break as the fused kernel (jnp.round's
        # half-even ties diverge the unwrap on exact pi/4 phase jumps)
        a = -half_pi * jnp.floor(d / half_pi + 0.5)
        offs = jnp.cumsum(jnp.pad(a, ((0, 0), (1, 0))), axis=-1)
        u = ph + offs
        c, s = jnp.cos(u), jnp.sin(u)
        er, ei = Eeq.real, Eeq.imag
        return (er * c - ei * s) + 1j * (er * s + ei * c)

    def _fwd(P, planes_out, wxy=None, return_taps=False):
        """One RX step: train stage-1/stage-2 taps, filter, BPS-derotate.

        Planes-first implementation shared by ``forward`` (complex in/out)
        and ``forward_planes`` (stacked float32 planes in, (outr, outi)
        out). On the Pallas paths the capture planes thread straight
        through filter -> BPS -> derotate with no complex materialisation
        between kernels (each kernel previously re-extracted planes from a
        freshly assembled complex array — pure HBM shuffle). Training runs
        on a TrSyms prefix until converged (complex built lazily on the
        prefix slice), then the taps are frozen and applied to the whole
        signal. ``wxy`` skips BOTH trainings and demodulates with the
        given (nmodes, nmodes, Ntaps) taps — the warm-start (tracking)
        serving entry, the reference's ``wxinit=`` discipline
        (qampy/equalisation.py:386-388); ``return_taps`` additionally
        returns the frozen taps so the caller can feed them back."""
        nmodes = P.shape[0] // 2
        # complex view: used by the trainers and the XLA-fallback filter/
        # derotate paths; the all-Pallas paths read P directly and XLA
        # elides the unused assembly
        E = P[:nmodes] + 1j * P[nmodes:]
        if wxy is not None:
            w2 = jnp.asarray(wxy)
        else:
            trs = (P.shape[-1] - Ntaps) // os if TrSyms is None else TrSyms
            w0 = jnp.asarray(eqops._init_taps(Ntaps, nmodes, nmodes, dtype))
            from qampy_tpu.ops.equaliser_pallas import \
                train_equaliser_block_pallas

            def train(E_, trs_, n_, os_, mu_, w_, syms_, method_, **kw):
                t = (train_equaliser_block_pallas if _stage_pallas(method_)
                     else eqops.train_equaliser_block)
                return t(E_, trs_, n_, os_, mu_, w_, syms_, method_, **kw)

            _, w1, _ = train(E, trs, 1, os, mu, w0, symbols1,
                             methods[0], adaptive=True,
                             block_size=block_size)
            if nmodes == 2:
                # CMA pol-demux singularity guard (the reference ships
                # orthogonalizetaps for this, core/equalisation/
                # equalisation.py:284-309, Liu et al. OFC'09): when the two
                # stage-1 tap rows converge onto the SAME source
                # polarisation (rows nearly parallel in tap space),
                # re-initialise row 1 opposite-orthogonal to row 0 and let
                # stage 2 retrain it. Traced select — no host round trip.
                f0 = w1[0].reshape(-1)
                f1 = w1[1].reshape(-1)
                inner = jnp.abs(jnp.vdot(f0, f1))
                n01 = jnp.sqrt(jnp.sum(jnp.abs(f0) ** 2)
                               * jnp.sum(jnp.abs(f1) ** 2))
                orth = jnp.conj(w1[0][::-1, ::-1])[None]
                w1 = jnp.where(inner > 0.9 * n01,
                               jnp.concatenate([w1[:1], orth]), w1)
            _, w2, _ = train(E, trs, 1, os, mu, w1, symbols2,
                             methods[1], adaptive=True,
                             block_size=block_size)
        # single-pass bf16 contraction for the filter on TPU (the ~0.4%
        # quantisation rides far below operating channel noise; the bench
        # SER gate verifies the end-to-end outcome stays exact)
        from qampy_tpu.ops.equaliser_pallas import pallas_filter_group
        filt_group = (pallas_filter_group(os, Ntaps, nmodes)
                      if (pallas or pallas_gen) else 0)
        dec_req = None
        if bps_mode == "twostage-dec":
            dec_req = 8
        elif bps_mode.startswith("decimated"):
            dec_req = int(bps_mode[len("decimated"):] or 8)
        dec = (dec_req if (dec_req is not None and filt_group >= dec_req
                           and filt_group % dec_req == 0) else None)
        if bps_mode.startswith("decimated") and dec is None:
            warnings.warn(
                "bps_mode=%r needs the fused Pallas filter with a phase "
                "group divisible by the stride (got group %d); falling "
                "back to the single-grid BPS" % (bps_mode, filt_group),
                stacklevel=2)
        from qampy_tpu.ops.equaliser_pallas import apply_filter_pallas_planes
        eqp = None
        if (pallas or pallas_gen) and filt_group > 1:
            # fused Pallas filter: windows + MXU + deinterleave in VMEM
            # (4.5x the XLA windows formulation, docs/PERFORMANCE.md).
            # Planes in, planes out — the BPS/derotate kernels consume the
            # output planes directly
            out_f = apply_filter_pallas_planes(P.astype(jnp.float32), os,
                                               w2, dec_stride=dec)
            Pout, Pdec = out_f if dec else (out_f, None)
            no = Pout.shape[0] // 2
            eqp = (Pout[:no], Pout[no:])
            decp = (Pdec[:no], Pdec[no:]) if dec else None
            Eeq = None
        else:
            Eeq, decp, dec = eqops.apply_filter_to_signal(E, os, w2), None, None

        def _with_taps(res):
            return (res, w2) if return_taps else res

        def _derot_out(ph):
            """Final unwrap+derotate honouring the planes threading."""
            if eqp is not None and fuse_derot:
                from qampy_tpu.ops.phase_pallas import unwrap_derotate_pallas
                return _with_taps(unwrap_derotate_pallas(
                    None, ph, planes=eqp, planes_out=planes_out))
            out = _derotate(Eeq if eqp is None
                            else (eqp[0] + 1j * eqp[1]).astype(E.dtype), ph)
            return _with_taps((out.real, out.imag) if planes_out else out)

        if ((pallas or pallas_gen) and dec is not None
                and bps_mode.startswith("decimated")):
            # FULLY decimated carrier recovery (the >2x lever named by the
            # r4 roofline, docs/PERFORMANCE.md): the carrier phase is
            # grossly oversampled at the symbol rate, so the WHOLE blind
            # phase search runs on the filter's stride-``dec`` side output
            # (1/dec of the samples, free from the filter kernel's one-hot
            # row selection) — a full 2N-point window per decided sample
            # spanning dec x the time (same noise averaging as the
            # full-rate search, wider slip suppression) — and the
            # per-sample phase comes back as PIECEWISE-LINEAR
            # interpolation fused into the rotation kernel (the pilot
            # CPE's interp-rotate pattern, per-block (a, b) coefficients).
            # No per-sample BPS work remains: the phase search cost drops
            # ~1/dec and the derotation costs the same as the plain fused
            # unwrap+derotate. Differs from "twostage-dec" (measured dead
            # end): that mode kept the full-rate per-sample FINE stage.
            from qampy_tpu.ops.phase_pallas import (
                bps_idx_pallas, interp_rotate_planes_pallas)
            # gen alphabets: the FITTED uniform-grid decision replaces the
            # O(M) unroll when the dense-argmin probe holds (same lever as
            # the twostage fine stage; gen_grid_fine == grid otherwise and
            # for analytic grids)
            idxd = bps_idx_pallas(None, angles_h, gen_grid_fine, bps_N,
                                  T=min(bps_tile, 8192), win_dtype=win_dtype,
                                  compute_dtype=bps_cd, planes=decp)
            phd = lo_a + step_a * idxd.astype(jnp.float32)
            # pi/2 unwrap on the DECIMATED phase (Lout/dec samples — the
            # full-rate unwrap never runs); same floor tie-break as the
            # fused kernel
            dph = phd[:, 1:] - phd[:, :-1]
            half_pi = jnp.float32(np.pi / 2)
            corr = -half_pi * jnp.floor(dph / half_pi + 0.5)
            phu = phd + jnp.cumsum(jnp.pad(corr, ((0, 0), (1, 0))), axis=-1)
            # block j covers full-rate samples [j*dec, (j+1)*dec): linear
            # coefficients a=phu[j], b=(phu[j+1]-phu[j])/dec, tail clamped
            b_blk = jnp.pad(phu[:, 1:] - phu[:, :-1],
                            ((0, 0), (0, 1))) / dec
            # the decimated grid covers ceil(Lout/dec) blocks: pad the
            # full-rate planes to the block boundary, slice back after
            Lout = eqp[0].shape[-1]
            Lpad = phu.shape[-1] * dec
            er_p = jnp.pad(eqp[0], ((0, 0), (0, Lpad - Lout)))
            ei_p = jnp.pad(eqp[1], ((0, 0), (0, Lpad - Lout)))
            outr, outi = interp_rotate_planes_pallas(
                er_p, ei_p, phu, b_blk, dx=dec, sign=1, T=bps_tile)
            outr, outi = outr[:, :Lout], outi[:, :Lout]
            return _with_taps((outr, outi) if planes_out
                              else outr + 1j * outi)
        if pallas and dec is not None:
            # decimated-coarse two-stage BPS: the carrier phase is grossly
            # oversampled at the symbol rate, so the coarse grid search runs
            # on the filter's stride-8 side output (1/8 the samples) with a
            # 2N-point window spanning 8x the time; the per-sample fine
            # stage and unwrap see the upsampled coarse phase. Both stages
            # consume the filter's output planes directly.
            from qampy_tpu.ops.phase_pallas import (bps_idx_pallas,
                                                    bps_fine_pallas)
            A1 = max(bps_angles // 4, 16)
            idx1 = bps_idx_pallas(None, np.linspace(
                -np.pi / 4, np.pi / 4, A1, endpoint=False, dtype=np.float32),
                grid, bps_N, T=min(bps_tile, 8192), win_dtype=win_dtype,
                compute_dtype=bps_cd, planes=decp)
            step1, lo1 = float(np.pi / 2 / A1), float(-np.pi / 4)
            ph1d = lo1 + step1 * idx1.astype(jnp.float32)
            Lout = eqp[0].shape[-1]
            # broadcast+reshape, NOT jnp.repeat: repeat lowers to a gather
            # that XLA re-fuses into every consumer (measured ~0.3 ms each)
            ph1 = jnp.broadcast_to(ph1d[:, :, None],
                                   (*ph1d.shape, dec)).reshape(
                ph1d.shape[0], -1)[:, :Lout]
            ph = bps_fine_pallas(None, ph1, A1, 8, grid, bps_N, T=bps_tile,
                                 win_dtype=win_dtype, compute_dtype=bps_cd,
                                 planes=eqp)
            return _derot_out(ph)
        if (pallas or pallas_gen) and bps_mode.startswith("twostage"):
            # fused two-stage BPS: shared coarse grid + 8 per-sample fine
            # offsets (reference bps_twostage, core/phaserecovery.py:222-288)
            from qampy_tpu.ops.phase_pallas import bps_phase_twostage_pallas
            div = 2 if bps_mode.endswith("32") else 4
            # gen alphabets: FITTED uniform-grid decisions (O(1) analytic,
            # build-time host probes above) replace the O(M) unroll — on
            # the coarse stage always when the discrimination probe passes
            # (coarse_grid_for_alphabet; a high-|s| SUBSET coarse was
            # measured and rejected, SER 0.09), and on the fine stage too
            # when the dense-argmin probe holds (fine_grid_ok) — then the
            # gen chain's BPS cost collapses to ~the flagship's.
            # Wide coarse window (N1=60) kills coarse-stage cycle slips;
            # the fine stage keeps bps_N for phase-tracking bandwidth.
            ph = bps_phase_twostage_pallas(Eeq if eqp is None else None,
                                           max(bps_angles // div, 16),
                                           8, gen_grid_fine, bps_N,
                                           T=bps_tile, win_dtype=win_dtype,
                                           N1=60, compute_dtype=bps_cd,
                                           grid_coarse=gen_grid_coarse,
                                           planes=eqp)
            return _derot_out(ph)
        if bps_mode.startswith("twostage"):
            # XLA two-stage path — same N1=60 wide coarse window as the
            # Pallas kernel (slip suppression, docs/PERFORMANCE.md), so
            # bps_mode="twostage" behaves consistently across backends
            div = 2 if bps_mode.endswith("32") else 4
            out, ph = phops.bps_twostage(Eeq, max(bps_angles // div, 16),
                                         const, bps_N, B=8, N1=60)
            return _with_taps((out.real, out.imag) if planes_out else out)
        if pallas or pallas_gen:
            from qampy_tpu.ops.phase_pallas import bps_idx_pallas
            # bf16 window accumulation: ~25% faster BPS; the nearest-level
            # decision stays f32-exact
            idx = bps_idx_pallas(Eeq if eqp is None else None, angles_h,
                                 grid, bps_N, T=bps_tile,
                                 win_dtype=win_dtype, compute_dtype=bps_cd,
                                 planes=eqp)
        else:
            angles = jnp.asarray(angles_h).reshape(1, -1)
            idx = jax.vmap(lambda e: phops.bps_idx(e, angles, const, bps_N,
                                                   grid=grid))(Eeq)
        # the angle grid is affine: angle = lo + step*idx (no gather)
        ph = lo_a + step_a * idx.astype(jnp.float32)
        return _derot_out(ph)

    def forward(E):
        """Complex (nmodes, L) capture in, recovered complex symbols out —
        thin wrapper over the planes-first ``_fwd`` (the plane split is
        algebraically eliminated by XLA when the caller assembled ``E``
        from planes)."""
        return _fwd(jnp.concatenate([E.real, E.imag], axis=0), False)

    def forward_planes(P, Pi=None):
        """Planes-native serving entry: returns ``(outr, outi)`` float32
        planes of the recovered symbols. ``P`` is the stacked (2*nmodes,
        L) float32 [Re rows; Im rows] capture (the filter kernel's native
        layout — ship it pre-stacked to avoid any restacking pass), or
        pass a ``(pr, pi)`` plane pair as two arguments (the pilot chain's
        ``forward.planes`` convention; stacked once here). On transports
        where complex arrays cannot cross host<->device (the axon TPU
        tunnel) the capture ships as planes anyway — this entry keeps the
        whole chain free of complex materialisation passes (Pallas
        paths)."""
        if Pi is not None:
            P = jnp.concatenate([jnp.asarray(P), jnp.asarray(Pi)], axis=0)
        P = jnp.asarray(P)
        # the XLA fallback path would silently accept a complex or
        # mis-stacked operand and produce wrong symbols (the Pallas filter
        # asserts); fail loudly on the [Re; Im] stacking contract instead
        assert not jnp.iscomplexobj(P), \
            "forward_planes takes float32 planes, not a complex array " \
            "(stack [E.real; E.imag] rows or call forward(E))"
        assert P.shape[0] % 2 == 0, \
            "forward_planes expects stacked [Re rows; Im rows] with an " \
            "even row count, got shape %r" % (P.shape,)
        return _fwd(P, True)

    def forward_with_taps(E):
        """``forward`` that also returns the frozen (nmodes, nmodes,
        Ntaps) taps — feed them to the tracking entries below (keep them
        on device; complex taps must not cross the axon tunnel)."""
        return _fwd(jnp.concatenate([E.real, E.imag], axis=0), False,
                    return_taps=True)

    def forward_tracking(E, wxy):
        """Warm-start (tracking) serving entry: demodulate with taps from
        a previous dispatch, skipping BOTH blind trainings — the
        reference's ``wxinit=`` warm-start discipline
        (qampy/equalisation.py:386-388) as a zero-training-prefix blind
        serving mode (steady-state channel tracking happens through the
        periodic full dispatches that refresh the taps)."""
        return _fwd(jnp.concatenate([E.real, E.imag], axis=0), False,
                    wxy=wxy)

    def forward_planes_with_taps(P, Pi=None):
        if Pi is not None:
            P = jnp.concatenate([jnp.asarray(P), jnp.asarray(Pi)], axis=0)
        return _fwd(jnp.asarray(P), True, return_taps=True)

    def forward_tracking_planes(P, wxy, Pi=None):
        """Planes-native twin of ``forward_tracking``."""
        if Pi is not None:
            P = jnp.concatenate([jnp.asarray(P), jnp.asarray(Pi)], axis=0)
        return _fwd(jnp.asarray(P), True, wxy=wxy)

    forward.planes = forward_planes
    forward.with_taps = forward_with_taps
    forward.tracking = forward_tracking
    forward.planes_with_taps = forward_planes_with_taps
    forward.tracking_planes = forward_tracking_planes
    # introspection: which kernel path the built chain actually takes
    forward.backend_info = {"pallas": bool(pallas),
                            "pallas_gen": bool(pallas_gen),
                            "grid_kind": kind, "reasons": reasons,
                            "bps_mode": bps_mode, "methods": tuple(methods),
                            "gen_bps_coarse": ("fitted" if gen_grid_coarse
                                               is not None else "exact"),
                            "gen_bps_fine": ("fitted" if gen_grid_fine
                                             is not grid else "exact")}
    return forward

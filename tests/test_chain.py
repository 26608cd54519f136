"""Tests for the fused single-dispatch RX chain (ops/chain.make_rx_chain)."""
import numpy as np
import jax
import jax.random as jr
import pytest

import qampy_tpu as qt
from qampy_tpu.ops.chain import make_rx_chain
from qampy_tpu.theory import cal_symbols_qam, cal_scaling_factor_qam


def _tx(M, Nsym, seed, snr=30, theta=np.pi / 5.6, dgd=20e-12, lw=0.0):
    sig = qt.SignalQAMGrayCoded(M, Nsym, nmodes=2, fb=25e9, seed=seed)
    s2 = sig.resample(50e9, beta=0.1)
    s2 = qt.impairments.apply_PMD(s2, theta, dgd)
    if lw:
        s2 = qt.impairments.apply_phase_noise(s2, lw, key=jr.PRNGKey(seed + 1))
    s2 = qt.impairments.change_snr(s2, snr, key=jr.PRNGKey(seed))
    return sig, s2


def _ser(out, M, trim=300):
    const = np.asarray(cal_symbols_qam(M)) / np.sqrt(
        float(cal_scaling_factor_qam(M)))
    o = np.asarray(out)[:, trim:-trim]
    d = np.abs(o[:, :, None] - const[None, None, :]).min(-1)
    # mean distance to the constellation: converged chains sit well inside
    # half the minimum symbol spacing
    return d.mean()


class TestRxChain:
    def test_recovers_pmd_phase_noise(self):
        sig, s2 = _tx(64, 2 ** 14, seed=4, snr=30, lw=20e3)
        fwd = jax.jit(make_rx_chain(M=64, Ntaps=17, os=2, bps_angles=32,
                                    bps_N=10, block_size=64))
        out = fwd(np.asarray(s2).astype(np.complex64))
        assert _ser(out, 64) < 0.08

    def test_twostage_mode(self):
        sig, s2 = _tx(64, 2 ** 14, seed=5, snr=30, lw=20e3)
        fwd = jax.jit(make_rx_chain(M=64, Ntaps=17, os=2, bps_angles=32,
                                    bps_N=10, block_size=64,
                                    bps_mode="twostage", pallas=True,
                                    bps_tile=2048))
        out = fwd(np.asarray(s2).astype(np.complex64))
        assert _ser(out, 64) < 0.08

    def test_decimated_mode(self):
        """bps_mode='decimated' (whole-BPS on the stride-8 filter side
        output + piecewise-linear interp-rotate) recovers like the
        per-sample search; dec=16 variant too."""
        sig, s2 = _tx(64, 2 ** 14, seed=5, snr=32, lw=20e3)
        for mode in ("decimated", "decimated16"):
            fwd = jax.jit(make_rx_chain(M=64, Ntaps=17, os=2, bps_angles=64,
                                        bps_N=10, block_size=128,
                                        bps_mode=mode, pallas=True,
                                        bps_tile=2048))
            out = fwd(np.asarray(s2).astype(np.complex64))
            assert _ser(out, 64) < 0.08, mode

    def test_decimated_falls_back_without_pallas(self):
        sig, s2 = _tx(16, 2 ** 13, seed=6, snr=28)
        fwd = jax.jit(make_rx_chain(M=16, Ntaps=11, os=2, bps_angles=32,
                                    bps_N=10, block_size=64,
                                    bps_mode="decimated", pallas=False))
        # the warning fires at trace time (the stride check lives in the
        # traced body where the filter group is resolved)
        with pytest.warns(UserWarning, match="falling back"):
            out = fwd(np.asarray(s2).astype(np.complex64))
        assert _ser(out, 16) < 0.08

    def test_blind_tracking_entry(self):
        """forward.with_taps / forward.tracking: warm-start blind serving
        (the reference's wxinit= discipline) must reproduce the full
        chain bit-exactly given the same taps."""
        sig, s2 = _tx(64, 2 ** 14, seed=5, snr=32, lw=20e3)
        fwd = make_rx_chain(M=64, Ntaps=17, os=2, bps_angles=64, bps_N=10,
                            block_size=128, TrSyms=2 ** 13,
                            bps_mode="decimated", pallas=True,
                            bps_tile=2048)
        E = np.asarray(s2).astype(np.complex64)
        out, w2 = jax.jit(fwd.with_taps)(E)
        trk = jax.jit(fwd.tracking)(E, w2)
        assert bool(jax.numpy.all(trk == out))
        assert _ser(np.asarray(trk), 64) < 0.08

    def test_matches_granular_api(self):
        # the fused chain and the step-by-step public API converge to the
        # same constellation (not bit-identical: block vs chosen backends)
        sig, s2 = _tx(16, 2 ** 14, seed=6, snr=28)
        fwd = jax.jit(make_rx_chain(M=16, Ntaps=11, os=2, bps_angles=32,
                                    bps_N=10, block_size=64))
        out = fwd(np.asarray(s2).astype(np.complex64))
        assert _ser(out, 16) < 0.08
        s_eq, wxy, err = qt.equalisation.dual_mode_equalisation(
            s2, (1e-3, 1e-3), 11, methods=("mcma", "mddma"))
        ser = np.asarray(s_eq.cal_ser())
        assert np.all(ser < 1e-2)

    def test_trsyms_prefix(self):
        sig, s2 = _tx(64, 2 ** 14, seed=7, snr=32)
        fwd = jax.jit(make_rx_chain(M=64, Ntaps=17, os=2, bps_angles=32,
                                    bps_N=10, block_size=64, TrSyms=2 ** 12))
        out = fwd(np.asarray(s2).astype(np.complex64))
        assert _ser(out, 64) < 0.08

    def test_twostage_xla_path_matches_single(self):
        # bps_mode="twostage" without the Pallas kernels must still run the
        # two-stage algorithm (not silently fall back to single-stage) and
        # produce equivalent quality
        sig, s2 = _tx(64, 2 ** 14, seed=8, snr=30, lw=20e3)
        E = np.asarray(s2).astype(np.complex64)
        kw = dict(M=64, Ntaps=17, os=2, bps_angles=32, bps_N=10,
                  block_size=64, pallas=False)
        d_two = _ser(jax.jit(make_rx_chain(bps_mode="twostage", **kw))(E), 64)
        d_one = _ser(jax.jit(make_rx_chain(bps_mode="single", **kw))(E), 64)
        assert d_two < d_one + 0.01

    def test_cross_qam_takes_fused_path(self):
        # cross 32-QAM rides the fused Pallas path via the analytic
        # two-rectangle decision (ops/phase.detect_grid kind "x") — and
        # the chain must actually recover the signal
        import jax.random as jr
        sig = qt.SignalQAMGrayCoded(32, 2 ** 13, nmodes=2, fb=25e9, seed=3)
        s2 = qt.impairments.change_snr(sig.resample(50e9, beta=0.1), 30,
                                       key=jr.PRNGKey(1))
        fwd_py = make_rx_chain(M=32, Ntaps=11, os=2, bps_angles=32,
                               bps_N=10, block_size=128, bps_tile=512,
                               pallas=True, methods=("cma", "sbd"))
        assert fwd_py.backend_info["pallas"] is True
        assert fwd_py.backend_info["reasons"] == ()
        out = jax.jit(fwd_py)(np.asarray(s2).astype(np.complex64))
        # mean distance to the constellation, same gate scale as the
        # 64-QAM recovery tests above (converged chains sit ~0.05 at 30 dB)
        assert _ser(out, 32) < 0.08

    def test_unsupported_method_falls_back_to_xla(self):
        # a method the fused block trainer does not implement must fall
        # back to the XLA kernels (with a warning) instead of tripping
        # kernel asserts, and backend_info must report the downgrade
        with pytest.warns(UserWarning, match="not implemented"):
            fwd_py = make_rx_chain(M=64, Ntaps=11, os=2, bps_angles=32,
                                   bps_N=10, block_size=128, pallas=True,
                                   methods=("cma2", "sbd"))
        assert fwd_py.backend_info["pallas"] is False
        assert fwd_py.backend_info["reasons"]

    def test_backend_info_eligible(self):
        # an eligible config reports pallas-capable with no reasons (the
        # CPU default backend still auto-disables, but explicit True holds)
        fwd = make_rx_chain(M=64, Ntaps=17, os=2, block_size=128, pallas=True)
        assert fwd.backend_info["pallas"] is True
        assert fwd.backend_info["reasons"] == ()

    def test_general_alphabet_chain(self):
        """symbols= with a non-grid (radially warped) alphabet: the chain
        recovers on the XLA path and on the all-Pallas pallas_gen path
        (statically unrolled O(M) decision in both the sbd trainer and
        the BPS) — VERDICT r2 #3."""
        import sys
        sys.path.insert(0, "tools")
        from genbench import warped_qam
        from qampy_tpu.ops import phase as phops
        const = warped_qam(64)
        grid = phops.detect_grid(jax.numpy.asarray(const))
        assert phops.grid_decision_info(grid)[0] == "gen"
        rng = np.random.default_rng(3)
        syms = const[rng.integers(0, 64, size=(2, 2 ** 14))]
        sig = qt.SymbolOnlySignal.from_symbol_array(
            np.asarray(syms), coded_symbols=const, fb=25e9)
        s2 = sig.resample(50e9, beta=0.1, renormalise=True)
        s2 = qt.impairments.apply_PMD(s2, np.pi / 5.6, 20e-12)
        s2 = qt.impairments.change_snr(s2, 30, key=jr.PRNGKey(7))
        E = np.asarray(s2).astype(np.complex64)
        for pal in (False, True):
            fwd = make_rx_chain(Ntaps=17, os=2, methods=("mcma", "sbd"),
                                mu=1.9e-3, bps_angles=32, bps_N=10,
                                block_size=128, bps_tile=2048,
                                symbols=const, pallas=pal)
            info = fwd.backend_info
            assert info["grid_kind"] == "gen"
            assert info["pallas"] is False
            assert info["pallas_gen"] is pal
            out = np.asarray(jax.jit(fwd)(E))[:, 300:-300]
            d = np.abs(out[:, :, None] - const[None, None, :]).min(-1)
            assert d.mean() < 0.08, (pal, d.mean())

    def test_gen_twostage_fitted_coarse(self):
        """Two-stage gen BPS uses a FITTED uniform-grid coarse decision
        (phops.coarse_grid_for_alphabet) — O(1) analytic instead of the
        O(M) unroll — while the fine stage searches the full alphabet;
        SER-gated at the genbench workload quality (VERDICT r3 #2)."""
        import itertools
        import sys
        sys.path.insert(0, "tools")
        from genbench import warped_qam
        from bench import make_tx
        from qampy_tpu.ops import phase as phops
        const = warped_qam(64)
        # host gate: accepted for warped QAM, rejected for a ring alphabet
        gc = phops.coarse_grid_for_alphabet(const)
        assert gc is not None and len(gc) == 3
        ring = np.exp(1j * 2 * np.pi * np.arange(32) / 32).astype(np.complex64)
        assert phops.coarse_grid_for_alphabet(ring) is None

        E, syms, _ = make_tx(2 ** 16, const=const, snr=35)
        fwd = jax.jit(make_rx_chain(Ntaps=17, os=2, methods=("mcma", "sbd"),
                                    mu=1.9e-3, bps_angles=64, bps_N=14,
                                    TrSyms=2 ** 14, symbols=const,
                                    bps_mode="twostage", pallas=True))
        out = np.asarray(fwd(jax.numpy.asarray(E)))

        def dec(z):
            return np.argmin(np.abs(np.asarray(z)[:, None]
                                    - const[None, :]), axis=1)

        best = 1.0
        for perm in itertools.permutations(range(2)):
            sers = []
            for m in range(2):
                o = out[perm[m]][300:-300]
                cand = []
                for off in (3, 4, 5):
                    r = dec(syms[m][300 + off:300 + off + o.shape[0]])
                    cand += [np.mean(dec(o * 1j ** k) != r)
                             for k in range(4)]
                sers.append(min(cand))
            best = min(best, float(np.mean(sers)))
        assert best < 1e-4, "gen twostage fitted-coarse SER %.2e" % best

    def test_twostage_dec_mode_recovers(self):
        """bps_mode='twostage-dec' (coarse BPS on the filter's decimated
        side output, both stages reading the filter's planes) recovers
        the flagship workload on the Pallas path."""
        import sys
        sys.path.insert(0, "tools")
        from bench import make_tx
        E, _, _ = make_tx(2 ** 14)
        from qampy_tpu.theory import cal_symbols_qam, cal_scaling_factor_qam
        const = cal_symbols_qam(64) / np.sqrt(cal_scaling_factor_qam(64))

        def resid(mode):
            fwd = make_rx_chain(Ntaps=17, os=2, bps_angles=32, bps_N=10,
                                block_size=128, bps_tile=2048,
                                TrSyms=2 ** 12, bps_mode=mode, pallas=True)
            out = np.asarray(jax.jit(fwd)(jax.numpy.asarray(E)))[:, 300:-300]
            return np.abs(out[:, :, None] - const[None, None, :]).min(-1).mean()

        d_single, d_dec = resid("single"), resid("twostage-dec")
        # recovery quality within a small margin of the flagship mode
        # (residual on this short harness is noise-dominated at ~0.10)
        assert d_dec < d_single + 0.02 and d_dec < 0.15, (d_single, d_dec)

    def test_planes_entry_matches_complex(self):
        """forward.planes (stacked [Re; Im] capture in, (outr, outi) out —
        the planes-threaded Pallas chain with no complex materialisation
        between kernels) must reproduce forward bit-exactly."""
        import sys
        sys.path.insert(0, "tools")
        from bench import make_tx
        E, _, _ = make_tx(2 ** 14)
        fwd = make_rx_chain(Ntaps=17, os=2, bps_angles=32, bps_N=10,
                            block_size=128, bps_tile=2048, TrSyms=2 ** 12,
                            pallas=True)
        out_c = np.asarray(jax.jit(fwd)(jax.numpy.asarray(E)))
        P = np.concatenate([E.real, E.imag]).astype(np.float32)
        outr, outi = jax.jit(fwd.planes)(jax.numpy.asarray(P))
        assert np.array_equal(np.asarray(outr) + 1j * np.asarray(outi),
                              out_c)

    def test_gen_fitted_grid_flags(self):
        """backend_info reports the fitted-vs-exact gen BPS decisions:
        warped QAM accepts both probes; a ring alphabet (square grid
        cannot discriminate) keeps the exact O(M) stages."""
        import sys
        sys.path.insert(0, "tools")
        from genbench import warped_qam
        fw = make_rx_chain(symbols=warped_qam(64), bps_mode="twostage",
                           pallas=True)
        assert fw.backend_info["gen_bps_coarse"] == "fitted"
        assert fw.backend_info["gen_bps_fine"] == "fitted"
        ring = np.exp(1j * 2 * np.pi * np.arange(32) / 32).astype(np.complex64)
        fr = make_rx_chain(symbols=ring, bps_mode="twostage", pallas=True)
        assert fr.backend_info["gen_bps_coarse"] == "exact"
        assert fr.backend_info["gen_bps_fine"] == "exact"

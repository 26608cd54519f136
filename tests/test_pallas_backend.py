"""Pallas equaliser backend: parity with the lax.scan reference recurrence.

Runs in interpreter mode on CPU; on TPU the same kernel compiles via Mosaic.
"""
import numpy as np
import pytest

from qampy_tpu.ops import equaliser as eqops
from qampy_tpu.ops.equaliser_pallas import train_equaliser_pallas, PALLAS_METHODS


@pytest.fixture
def field(rng):
    return (rng.standard_normal((2, 4096)) +
            1j * rng.standard_normal((2, 4096))).astype(np.complex64)


class TestPallasParity:
    @pytest.mark.parametrize("method", ["cma", "mcma", "rde"])
    @pytest.mark.parametrize("adaptive", [False, True])
    def test_matches_seq_backend(self, field, method, adaptive):
        M = 16
        w0 = eqops._init_taps(11, 2, 2, np.complex64)
        syms = eqops._reshape_symbols(None, method, M, np.complex64, 2)
        _, w_s, mu_s = eqops.train_equaliser_seq(field, 1000, 1, 2, 1e-3, w0, syms,
                                                 method, adaptive=adaptive)
        _, w_p, mu_p = train_equaliser_pallas(field, 1000, 1, 2, 1e-3, w0, syms,
                                              method, adaptive=adaptive, interpret=True)
        assert np.allclose(np.asarray(w_s), np.asarray(w_p), atol=1e-4)
        assert np.allclose(np.asarray(mu_s), np.asarray(mu_p), atol=1e-6)

    def test_niter(self, field):
        w0 = eqops._init_taps(11, 2, 2, np.complex64)
        syms = eqops._reshape_symbols(None, "cma", 4, np.complex64, 2)
        _, w_s, _ = eqops.train_equaliser_seq(field, 500, 3, 2, 1e-3, w0, syms, "cma")
        _, w_p, _ = train_equaliser_pallas(field, 500, 3, 2, 1e-3, w0, syms, "cma",
                                           interpret=True)
        assert np.allclose(np.asarray(w_s), np.asarray(w_p), atol=1e-4)

    def test_unknown_method_raises(self, field):
        w0 = eqops._init_taps(11, 2, 2, np.complex64)
        syms = eqops._reshape_symbols(None, "sbd", 16, np.complex64, 2)
        with pytest.raises(AssertionError):
            train_equaliser_pallas(field, 100, 1, 2, 1e-3, w0, syms, "sbd",
                                   interpret=True)


class TestPallasBPS:
    """Fused Pallas BPS kernel vs the XLA formulation (interpret mode)."""

    def _setup(self, rng, M=64, L=3000, lw=0.1):
        import jax.numpy as jnp
        from qampy_tpu.theory import cal_symbols_qam, cal_scaling_factor_qam
        from qampy_tpu.ops import phase as phops
        const = (cal_symbols_qam(M) / np.sqrt(cal_scaling_factor_qam(M))).astype(np.complex64)
        grid = phops.detect_grid(const)
        ph = np.cumsum(rng.normal(0, lw / np.sqrt(L), (2, L)), axis=-1)
        E = (const[rng.integers(0, M, (2, L))] * np.exp(1j * ph)
             + .01 * (rng.standard_normal((2, L)) + 1j * rng.standard_normal((2, L)))
             ).astype(np.complex64)
        return const, grid, E

    @pytest.mark.parametrize("T,A,N", [(512, 64, 14), (256, 32, 8), (1024, 64, 10)])
    def test_matches_xla_idx(self, rng, T, A, N):
        import jax
        import jax.numpy as jnp
        from qampy_tpu.ops import phase as phops
        from qampy_tpu.ops.phase_pallas import bps_idx_pallas
        const, grid, E = self._setup(rng)
        angles = np.linspace(-np.pi / 4, np.pi / 4, A, endpoint=False, dtype=np.float32)
        ref = np.asarray(jax.vmap(
            lambda e: phops.bps_idx(e, angles.reshape(1, -1), jnp.asarray(const),
                                    N, grid=grid))(jnp.asarray(E)))
        got = np.asarray(bps_idx_pallas(E, angles, grid, N, T=T, interpret=True))
        # identical except rare near-tie argmin flips between adjacent angles
        mism = ref != got
        assert mism.mean() < 2e-3
        if mism.any():
            assert np.abs(ref.astype(int) - got.astype(int))[mism].max() <= 1

    @pytest.mark.parametrize("M", [32, 128, 8])
    def test_matches_xla_idx_nonsquare(self, rng, M):
        """Cross (32/128) and rectangular (8) QAM ride the analytic
        decision; the fused kernel must agree with the XLA O(M) search."""
        import jax
        import jax.numpy as jnp
        from qampy_tpu.ops import phase as phops
        from qampy_tpu.ops.phase_pallas import bps_idx_pallas
        const, grid, E = self._setup(rng, M=M, L=2048)
        assert phops.grid_decision_info(grid)[0] in ("x", "r")
        angles = np.linspace(-np.pi / 4, np.pi / 4, 32, endpoint=False,
                             dtype=np.float32)
        ref = np.asarray(jax.vmap(
            lambda e: phops.bps_idx(e, angles.reshape(1, -1),
                                    jnp.asarray(const), 8, grid=None)
        )(jnp.asarray(E)))
        got = np.asarray(bps_idx_pallas(E, angles, grid, 8, T=256,
                                        interpret=True))
        assert np.array_equal(ref, got)

    def test_matches_xla_idx_general_alphabet(self, rng):
        """The ("gen", sr, si) spec — arbitrary alphabets (PS shaping) —
        unrolls the O(M) search inside the kernel; must equal XLA."""
        import jax
        import jax.numpy as jnp
        from qampy_tpu.ops import phase as phops
        from qampy_tpu.ops.phase_pallas import bps_idx_pallas
        const, _, E = self._setup(rng, M=32, L=2048)
        spec = ("gen", tuple(float(x) for x in const.real),
                tuple(float(x) for x in const.imag))
        angles = np.linspace(-np.pi / 4, np.pi / 4, 32, endpoint=False,
                             dtype=np.float32)
        ref = np.asarray(jax.vmap(
            lambda e: phops.bps_idx(e, angles.reshape(1, -1),
                                    jnp.asarray(const), 8, grid=None)
        )(jnp.asarray(E)))
        got = np.asarray(bps_idx_pallas(E, angles, spec, 8, T=256,
                                        interpret=True))
        assert np.array_equal(ref, got)

    @pytest.mark.parametrize("T,A,B,N", [(512, 16, 8, 14), (256, 32, 4, 8)])
    def test_twostage_matches_xla(self, rng, T, A, B, N):
        """Fused two-stage pallas phase vs ops/phase.bps_twostage (XLA)."""
        import jax
        from qampy_tpu.ops import phase as phops
        from qampy_tpu.ops.phase_pallas import bps_phase_twostage_pallas
        const, grid, E = self._setup(rng)
        _, ph_ref = phops.bps_twostage(E, A, const, N, B=B, method="pyt")
        phf = np.asarray(bps_phase_twostage_pallas(E, A, B, grid, N, T=T,
                                                   interpret=True))
        import jax.numpy as jnp
        ph_got = np.asarray(jnp.unwrap(jnp.asarray(phf) * 4, axis=-1) / 4)
        valid = np.s_[:, 2 * N: -2 * N]
        # rare near-tie argmin flips move the phase by one fine step
        fine_step = np.pi / 2 / ((B - 1) * A)
        close = np.abs(ph_got[valid] - np.asarray(ph_ref)[valid]) <= fine_step + 1e-5
        assert close.mean() > 0.999

    def test_twostage_dispatch(self, rng):
        """bps_twostage(method='pallas') recovers phase like method='pyt'."""
        from qampy_tpu.ops import phase as phops
        from qampy_tpu.ops import phase_pallas as ppal
        const, grid, E = self._setup(rng, L=2048)
        orig = ppal.bps_phase_twostage_pallas
        try:
            ppal.bps_phase_twostage_pallas = lambda *a, **k: orig(*a, interpret=True, **k)
            out_p, ph_p = phops.bps_twostage(E, 16, const, 8, B=8, method="pallas")
        finally:
            ppal.bps_phase_twostage_pallas = orig
        out_x, ph_x = phops.bps_twostage(E, 16, const, 8, B=8, method="pyt")
        valid = np.s_[:, 16:-16]
        assert np.allclose(np.asarray(ph_p)[valid], np.asarray(ph_x)[valid], atol=0.06)

    def test_bps_method_dispatch(self, rng):
        """bps(method='pallas') equals bps(method='pyt') on recovered phase."""
        import jax
        from qampy_tpu.ops import phase as phops
        from qampy_tpu.ops import phase_pallas as ppal
        const, grid, E = self._setup(rng, L=2048)
        # interpret mode on CPU: patch the kernel entry
        orig = ppal.bps_idx_pallas
        try:
            ppal.bps_idx_pallas = lambda *a, **k: orig(*a, interpret=True, **k)
            out_p, ph_p = phops.bps(E, 32, const, 8, method="pallas")
        finally:
            ppal.bps_idx_pallas = orig
        out_x, ph_x = phops.bps(E, 32, const, 8, method="pyt")
        valid = np.s_[:, 16:-16]
        assert np.allclose(np.asarray(ph_p)[valid], np.asarray(ph_x)[valid], atol=0.06)


class TestPallasBlockTrainer:
    """Fused block-LMS Pallas kernel vs the XLA block trainer (interpret)."""

    @pytest.mark.parametrize("method", ["cma", "mcma", "rde", "sbd", "mddma", "dd"])
    @pytest.mark.parametrize("adaptive", [False, True])
    def test_matches_block_backend(self, field, method, adaptive):
        from qampy_tpu.ops.equaliser_pallas import train_equaliser_block_pallas
        w0 = eqops._init_taps(11, 2, 2, np.complex64)
        syms = eqops._reshape_symbols(None, method, 16, np.complex64, 2)
        err_b, w_b, mu_b = eqops.train_equaliser_block(
            field, 1024, 2, 2, 1e-3, w0, syms, method, adaptive=adaptive,
            block_size=128)
        err_p, w_p, mu_p = train_equaliser_block_pallas(
            field, 1024, 2, 2, 1e-3, w0, syms, method, adaptive=adaptive,
            block_size=128, interpret=True)
        assert np.allclose(np.asarray(w_b), np.asarray(w_p), atol=1e-4)
        assert np.allclose(np.asarray(mu_b), np.asarray(mu_p), atol=1e-6)
        assert np.allclose(np.asarray(err_b), np.asarray(err_p), atol=1e-3)

    @pytest.mark.parametrize("method", ["sbd", "mddma", "dd"])
    def test_matches_block_backend_cross_qam(self, field, method):
        """Decision methods on cross 32-QAM: the joint two-rectangle
        decision must reproduce the XLA block trainer's O(M) search."""
        from qampy_tpu.ops.equaliser_pallas import train_equaliser_block_pallas
        w0 = eqops._init_taps(11, 2, 2, np.complex64)
        syms = eqops._reshape_symbols(None, method, 32, np.complex64, 2)
        err_b, w_b, mu_b = eqops.train_equaliser_block(
            field, 1024, 2, 2, 1e-3, w0, syms, method, adaptive=True,
            block_size=128)
        err_p, w_p, mu_p = train_equaliser_block_pallas(
            field, 1024, 2, 2, 1e-3, w0, syms, method, adaptive=True,
            block_size=128, interpret=True)
        assert np.allclose(np.asarray(w_b), np.asarray(w_p), atol=1e-4)
        assert np.allclose(np.asarray(mu_b), np.asarray(mu_p), atol=1e-6)

    @pytest.mark.parametrize("method", ["sbd", "mddma", "dd"])
    def test_matches_block_backend_gen_alphabet(self, field, method):
        """Decision methods on a general (warped, non-grid) alphabet: the
        statically unrolled O(M) max-score search must reproduce the XLA
        block trainer's MXU matmul decision."""
        from qampy_tpu.ops.equaliser_pallas import train_equaliser_block_pallas
        from qampy_tpu.theory import cal_symbols_qam, cal_scaling_factor_qam
        from qampy_tpu.ops.phase import detect_grid, grid_decision_info
        c = cal_symbols_qam(64) / np.sqrt(cal_scaling_factor_qam(64))
        const = (c * (1 + 0.18 * (np.abs(c) ** 2 - 1))).astype(np.complex64)
        assert grid_decision_info(detect_grid(const))[0] == "gen"
        syms = np.tile(const[None, :], (2, 1))
        w0 = eqops._init_taps(11, 2, 2, np.complex64)
        err_b, w_b, mu_b = eqops.train_equaliser_block(
            field, 1024, 2, 2, 1e-3, w0, syms, method, adaptive=True,
            block_size=128)
        err_p, w_p, mu_p = train_equaliser_block_pallas(
            field, 1024, 2, 2, 1e-3, w0, syms, method, adaptive=True,
            block_size=128, interpret=True)
        assert np.allclose(np.asarray(w_b), np.asarray(w_p), atol=1e-4)
        assert np.allclose(np.asarray(mu_b), np.asarray(mu_p), atol=1e-6)

    def test_via_equalise_signal_backend(self, field):
        """backend='pallas_block' plugs into the public driver."""
        wxy, err = eqops.equalise_signal(field, 2, 1e-3, 16, Ntaps=11,
                                         TrSyms=512, method="cma",
                                         backend="pallas_block", block_size=64)
        wxy2, err2 = eqops.equalise_signal(field, 2, 1e-3, 16, Ntaps=11,
                                           TrSyms=512, method="cma",
                                           backend="block", block_size=64)
        assert np.allclose(np.asarray(wxy), np.asarray(wxy2), atol=1e-4)


class TestMXUFilterFormulation:
    """apply_filter_to_signal (polyphase one-hot matmul) vs direct windows."""

    @pytest.mark.parametrize("os", [1, 2])
    @pytest.mark.parametrize("ntaps", [11, 17])
    def test_matches_direct(self, rng, os, ntaps):
        E = (rng.standard_normal((2, 3000)) +
             1j * rng.standard_normal((2, 3000))).astype(np.complex64)
        wx = (rng.standard_normal((2, 2, ntaps)) +
              1j * rng.standard_normal((2, 2, ntaps))).astype(np.complex64) * 0.1
        got = np.asarray(eqops.apply_filter_to_signal(E, os, wx))
        Lout = (E.shape[-1] - ntaps) // os + 1
        want = np.zeros((2, Lout), np.complex64)
        for j in range(2):
            for i in range(Lout):
                want[j, i] = np.sum(E[:, i * os: i * os + ntaps] * wx[j])
        assert got.shape == want.shape
        assert np.allclose(got, want, atol=2e-4)

    def test_real_valued(self, rng):
        E = rng.standard_normal((4, 2000)).astype(np.float32)
        wx = rng.standard_normal((4, 4, 9)).astype(np.float32) * 0.1
        got = np.asarray(eqops.apply_filter_to_signal(E, 2, wx))
        Lout = (2000 - 9) // 2 + 1
        want = np.zeros((4, Lout), np.float32)
        for j in range(4):
            for i in range(Lout):
                want[j, i] = np.sum(E[:, i * 2: i * 2 + 9] * wx[j])
        assert np.allclose(got, want, atol=2e-4)


class TestPallasUnwrapDerotate:
    """Fused unwrap+derotate kernel vs the XLA split-plane formulation."""

    @staticmethod
    def _xla_derotate(Eeq, ph):
        import jax.numpy as jnp
        d = ph[:, 1:] - ph[:, :-1]
        half_pi = jnp.float32(np.pi / 2)
        a = -half_pi * jnp.round(d / half_pi)
        offs = jnp.cumsum(jnp.pad(a, ((0, 0), (1, 0))), axis=-1)
        u = ph + offs
        c, s = jnp.cos(u), jnp.sin(u)
        er, ei = Eeq.real, Eeq.imag
        return (er * c - ei * s) + 1j * (er * s + ei * c)

    @pytest.mark.parametrize("T,L", [(1024, 5000), (8192, 5000), (1024, 1024)])
    def test_matches_xla(self, rng, T, L):
        import jax.numpy as jnp
        from qampy_tpu.ops.phase_pallas import unwrap_derotate_pallas
        E = (rng.standard_normal((2, L)) +
             1j * rng.standard_normal((2, L))).astype(np.complex64)
        # slow drift with genuine pi/2 wraps
        drift = (np.cumsum(rng.standard_normal((2, L)) * 0.02, axis=-1)
                 + np.linspace(0, 9, L))
        ph = ((drift + np.pi / 4) % (np.pi / 2) - np.pi / 4).astype(np.float32)
        ref = np.asarray(self._xla_derotate(jnp.asarray(E), jnp.asarray(ph)))
        got = np.asarray(unwrap_derotate_pallas(E, ph, T=T, interpret=True))
        assert got.dtype == E.dtype
        assert np.allclose(got, ref, atol=1e-4)

    @pytest.mark.parametrize("at", [1024, 128, 640])
    def test_unwrap_carries_across_boundaries(self, rng, at):
        """pi/2 wraps at tile AND row-segment boundaries must carry."""
        import jax.numpy as jnp
        from qampy_tpu.ops.phase_pallas import unwrap_derotate_pallas
        L, T = 4096, 1024  # Tc = 128: `at` hits tile (1024) and row (128,640)
        E = np.ones((1, L), np.complex64)
        ph = np.full((1, L), np.pi / 4 - 0.01, np.float32)
        ph[0, at:] = -np.pi / 4 + 0.01  # wraps by ~pi/2 at the boundary
        got = np.asarray(unwrap_derotate_pallas(E, ph, T=T, interpret=True))
        ref = np.asarray(self._xla_derotate(jnp.asarray(E), jnp.asarray(ph)))
        assert np.allclose(got, ref, atol=1e-5)
        # unwrapped phase after the boundary is pi/4 - 0.01 + 0.02
        # (continuous), NOT -pi/4 + 0.01
        assert np.allclose(np.angle(got[0, at:]), np.pi / 4 + 0.01, atol=1e-4)


class TestPallasApplyFilter:
    """Fused Pallas filter vs the XLA windows formulation (interpret mode)."""

    @pytest.mark.parametrize("L,ntaps,os,nmodes,Ct", [
        (5000, 17, 2, 2, 64),    # halo crossing mid-signal
        (4096, 11, 2, 2, 32),
        (3000, 17, 2, 1, 32),    # single pol
        (6000, 17, 4, 2, 16),    # os=4
    ])
    def test_matches_xla(self, rng, L, ntaps, os, nmodes, Ct):
        import jax.numpy as jnp
        from qampy_tpu.ops.equaliser_pallas import apply_filter_pallas
        E = (rng.standard_normal((nmodes, L)) +
             1j * rng.standard_normal((nmodes, L))).astype(np.complex64)
        wxy = ((rng.standard_normal((nmodes, nmodes, ntaps)) +
                1j * rng.standard_normal((nmodes, nmodes, ntaps))) * 0.1
               ).astype(np.complex64)
        want = np.asarray(eqops.apply_filter_to_signal(E, os, wxy))
        got = np.asarray(apply_filter_pallas(E, os, wxy, Ct=Ct,
                                             mat_dtype=jnp.float32,
                                             interpret=True))
        assert got.shape == want.shape
        assert np.allclose(got, want, atol=1e-4)

"""Fused spatial-Woodbury ConvBPDN driver vs the generic FFT-domain
driver: identical iteration semantics (sporco/admm/cbpdn.py:267-311 hot
loop), so trajectories must agree to f32 rounding."""

import numpy as np
import jax.numpy as jnp

from sporco_tpu.models.cbpdn import ConvBPDN
from sporco_tpu.ops import fused_csc


def _problem(N=32, M=4, Nd=8, K=2, seed=12345):
    rng = np.random.default_rng(seed)
    D = rng.standard_normal((Nd, Nd, M)).astype(np.float32)
    D /= np.sqrt((D ** 2).sum(axis=(0, 1), keepdims=True))
    S = rng.standard_normal((N, N, K)).astype(np.float32)
    return D, S


class TestChannelFolding:
    """Colour signal + single-channel dictionary: folding C into the
    batch axis is exact, so the fused path must reproduce the generic
    driver's trajectory."""

    def test_cfold_matches_generic(self):
        rng = np.random.default_rng(7)
        D = rng.standard_normal((8, 8, 4)).astype(np.float32)
        D /= np.sqrt((D ** 2).sum(axis=(0, 1), keepdims=True))
        S = rng.standard_normal((32, 32, 3)).astype(np.float32)  # C=3
        opt = ConvBPDN.options(max_iter=25, rel_stop_tol=0.0)
        a = ConvBPDN(D, S, 0.1, opt=opt, dimK=0, fused=False)
        Xa = np.asarray(a.solve())
        b = ConvBPDN(D, S, 0.1, opt=opt, dimK=0, fused=True)
        assert not fused_csc.eligible(b.cfg, b.params, b.opts)
        assert fused_csc.cfold_eligible(b.cfg, b.params, b.opts)
        Xb = np.asarray(b.solve())
        ia, ib = a.getitstat(), b.getitstat()
        scale = max(np.abs(Xa).max(), 1e-6)
        assert Xa.shape == Xb.shape
        assert np.abs(Xa - Xb).max() < 2e-4 * scale
        assert np.allclose(ia.ObjFun, ib.ObjFun, rtol=1e-4)
        assert np.allclose(ia.Rho, ib.Rho, rtol=1e-4)
        assert np.allclose(ia.PrimalRsdl, ib.PrimalRsdl, rtol=1e-3,
                           atol=1e-6)
        # reconstruction consistent in the user layout
        Sa = np.asarray(a.reconstruct()).squeeze()
        Sb = np.asarray(b.reconstruct()).squeeze()
        assert np.abs(Sa - Sb).max() < 2e-4 * max(np.abs(Sa).max(),
                                                  1e-6)

    def test_cfold_multi_signal(self):
        # K=2 colour signals: both axes fold
        rng = np.random.default_rng(8)
        D = rng.standard_normal((8, 8, 4)).astype(np.float32)
        S = rng.standard_normal((32, 32, 3, 2)).astype(np.float32)
        opt = ConvBPDN.options(max_iter=15, rel_stop_tol=0.0)
        a = ConvBPDN(D, S, 0.1, opt=opt, fused=False)
        Xa = np.asarray(a.solve())
        b = ConvBPDN(D, S, 0.1, opt=opt, fused=True)
        assert fused_csc.cfold_eligible(b.cfg, b.params, b.opts)
        Xb = np.asarray(b.solve())
        assert Xa.shape == Xb.shape
        assert np.allclose(a.getitstat().ObjFun,
                           b.getitstat().ObjFun, rtol=1e-4)
        scale = max(np.abs(Xa).max(), 1e-6)
        assert np.abs(Xa - Xb).max() < 2e-4 * scale

    def test_cfold_respects_exclusions(self):
        # colour dictionary (Cd=3) must NOT fold (it runs the direct
        # rank-C Woodbury path instead, TestMultiChannelDict)
        rng = np.random.default_rng(9)
        Dc = rng.standard_normal((8, 8, 3, 4)).astype(np.float32)
        S = rng.standard_normal((32, 32, 3)).astype(np.float32)
        b = ConvBPDN(Dc, S, 0.1, dimK=0, fused=False)
        assert not fused_csc.cfold_eligible(b.cfg, b.params, b.opts)
        assert fused_csc.eligible(b.cfg, b.params, b.opts)


class TestMultiChannelDict:
    """Colour-dictionary CSC (Cd == C > 1, shared coefficient maps)
    through the rank-C per-bin Woodbury fused path: trajectories must
    match the generic FFT-domain driver."""

    def _run(self, C=3, K=0, variant=None, mu=None, kernel=False,
             iters=25):
        from sporco_tpu.models.cbpdn import ConvElasticNet
        from sporco_tpu.ops import pallas_csc_iter as pki
        rng = np.random.default_rng(5)
        Dc = rng.standard_normal((8, 8, C, 4)).astype(np.float32)
        Dc /= np.sqrt((Dc ** 2).sum(axis=(0, 1, 2), keepdims=True))
        sshape = (32, 32, C) if K == 0 else (32, 32, C, K)
        S = rng.standard_normal(sshape).astype(np.float32)
        cls = ConvElasticNet if variant == "elastic" else ConvBPDN
        kw = dict(opt=cls.options(max_iter=iters, rel_stop_tol=0.0))
        if K == 0:
            kw["dimK"] = 0
        if mu is not None:
            kw["mu"] = mu
        a = cls(Dc, S, 0.1, fused=False, **kw)
        Xa = np.asarray(a.solve())
        prev_int = pki.interpret
        if kernel:
            pki.interpret = True
        try:
            b = cls(Dc, S, 0.1, fused=True, **kw)
            assert fused_csc.eligible(b.cfg, b.params, b.opts)
            Xb = np.asarray(b.solve())
        finally:
            pki.interpret = prev_int
        ia, ib = a.getitstat(), b.getitstat()
        scale = max(np.abs(Xa).max(), 1e-6)
        assert Xa.shape == Xb.shape
        assert np.abs(Xa - Xb).max() < 2e-4 * scale
        assert np.allclose(ia.ObjFun, ib.ObjFun, rtol=1e-4)
        assert np.allclose(ia.Rho, ib.Rho, rtol=1e-4)
        assert np.allclose(ia.PrimalRsdl, ib.PrimalRsdl, rtol=1e-3,
                           atol=1e-6)

    def test_c3_matches_generic(self):
        self._run(C=3)

    def test_c2_matches_generic(self):
        self._run(C=2)

    def test_c3_multi_signal(self):
        self._run(C=3, K=2, iters=15)

    def test_c3_elastic(self):
        self._run(C=3, variant="elastic", mu=0.05, iters=15)

    def test_c3_kernel_path(self):
        # through the one-pass Pallas iteration kernel (interpret)
        self._run(C=3, kernel=True, iters=15)

    def _run_pgm(self, C=3, masked=False, kernel=False, iters=15):
        from sporco_tpu.models import pgm as mpgm
        from sporco_tpu.ops import pallas_csc_iter as pki
        rng = np.random.default_rng(21)
        Dc = rng.standard_normal((8, 8, C, 4)).astype(np.float32)
        Dc /= np.sqrt((Dc ** 2).sum(axis=(0, 1, 2), keepdims=True))
        S = rng.standard_normal((32, 32, C)).astype(np.float32)
        cls = mpgm.ConvBPDNMask if masked else mpgm.ConvBPDN
        kw = dict(opt=cls.options(max_iter=iters, rel_stop_tol=0.0,
                                  L=20.0), dimK=0)
        if masked:
            kw["W"] = (rng.random((32, 32, C)) > 0.3) \
                .astype(np.float32)
        a = cls(Dc, S, 0.1, fused=False, **kw)
        Xa = np.asarray(a.solve())
        prev = pki.interpret
        pki.interpret = kernel
        prev_en = pki.enabled
        pki.enabled = kernel
        try:
            b = cls(Dc, S, 0.1, fused=True, **kw)
            assert fused_csc.pgm_eligible(b.cfg, b.params, b.opts)
            Xb = np.asarray(b.solve())
        finally:
            pki.interpret = prev
            pki.enabled = prev_en
        scale = max(np.abs(Xa).max(), 1e-6)
        assert Xa.shape == Xb.shape
        assert np.abs(Xa - Xb).max() < 2e-4 * scale
        assert np.allclose(a.getitstat().ObjFun,
                           b.getitstat().ObjFun, rtol=1e-4)

    def test_pgm_c3(self):
        self._run_pgm(C=3)

    def test_pgm_c3_masked(self):
        self._run_pgm(C=3, masked=True)

    def test_pgm_c3_kernel(self):
        self._run_pgm(C=3, kernel=True)

    def test_pgm_cfold_matches_generic(self):
        from sporco_tpu.models import pgm as mpgm
        rng = np.random.default_rng(11)
        D = rng.standard_normal((8, 8, 4)).astype(np.float32)
        D /= np.sqrt((D ** 2).sum(axis=(0, 1), keepdims=True))
        S = rng.standard_normal((32, 32, 3)).astype(np.float32)
        opt = mpgm.ConvBPDN.options(max_iter=20, rel_stop_tol=0.0,
                                    L=50.0)
        a = mpgm.ConvBPDN(D, S, 0.1, opt=opt, dimK=0, fused=False)
        Xa = np.asarray(a.solve())
        b = mpgm.ConvBPDN(D, S, 0.1, opt=opt, dimK=0, fused=True)
        assert not fused_csc.pgm_eligible(b.cfg, b.params, b.opts)
        assert fused_csc.pgm_cfold_eligible(b.cfg, b.params, b.opts)
        Xb = np.asarray(b.solve())
        assert Xa.shape == Xb.shape
        scale = max(np.abs(Xa).max(), 1e-6)
        assert np.abs(Xa - Xb).max() < 2e-4 * scale
        assert np.allclose(a.getitstat().ObjFun,
                           b.getitstat().ObjFun, rtol=1e-4)
        assert np.allclose(a.getitstat().Rsdl, b.getitstat().Rsdl,
                           rtol=1e-3, atol=1e-6)

    def test_pgm_cfold_masked(self):
        from sporco_tpu.models import pgm as mpgm
        rng = np.random.default_rng(13)
        D = rng.standard_normal((8, 8, 4)).astype(np.float32)
        S = rng.standard_normal((32, 32, 3)).astype(np.float32)
        W = (rng.random((32, 32, 3)) > 0.3).astype(np.float32)
        opt = mpgm.ConvBPDN.options(max_iter=15, rel_stop_tol=0.0,
                                    L=50.0)
        a = mpgm.ConvBPDNMask(D, S, 0.1, W=W, opt=opt, dimK=0,
                              fused=False)
        Xa = np.asarray(a.solve())
        b = mpgm.ConvBPDNMask(D, S, 0.1, W=W, opt=opt, dimK=0,
                              fused=True)
        assert fused_csc.pgm_cfold_eligible(b.cfg, b.params, b.opts)
        Xb = np.asarray(b.solve())
        scale = max(np.abs(Xa).max(), 1e-6)
        assert np.abs(Xa - Xb).max() < 2e-4 * scale
        assert np.allclose(a.getitstat().ObjFun,
                           b.getitstat().ObjFun, rtol=1e-4)


class TestFusedCBPDN:

    def test_matches_generic(self):
        D, S = _problem()
        opt = ConvBPDN.options(max_iter=30, rel_stop_tol=0.0)
        a = ConvBPDN(D, S, 0.1, opt=opt, fused=False)
        Xa = np.asarray(a.solve())
        b = ConvBPDN(D, S, 0.1, opt=opt, fused=True)
        assert fused_csc.eligible(b.cfg, b.params, b.opts)
        Xb = np.asarray(b.solve())
        scale = np.abs(Xa).max()
        assert np.abs(Xa - Xb).max() < 2e-4 * scale
        sa, sb = a.getitstat(), b.getitstat()
        assert np.allclose(sa.ObjFun, sb.ObjFun, rtol=1e-4)
        assert np.allclose(sa.Rho, sb.Rho, rtol=1e-4)
        assert np.allclose(sa.PrimalRsdl, sb.PrimalRsdl, rtol=1e-3,
                           atol=1e-6)

    def test_early_stop_and_reentrant(self):
        D, S = _problem()
        opt = ConvBPDN.options(max_iter=200, rel_stop_tol=5e-3)
        a = ConvBPDN(D, S, 0.3, opt=opt, fused=False)
        a.solve()
        b = ConvBPDN(D, S, 0.3, opt=opt, fused=True)
        b.solve()
        na, nb = len(a.getitstat()), len(b.getitstat())
        assert abs(na - nb) <= fused_csc.UNROLL
        # re-entrant solve: converged, so a further call adds no iters
        # (per-call stats window, matching the generic driver)
        ka = int(b.state.k)
        b.solve()
        assert int(b.state.k) == ka
        assert len(b.getitstat()) == 0

    def test_nonneg(self):
        D, S = _problem()
        opt = ConvBPDN.options(max_iter=20, rel_stop_tol=0.0)
        a = ConvBPDN(D, S, 0.1, opt=opt, non_neg=True, fused=False)
        b = ConvBPDN(D, S, 0.1, opt=opt, non_neg=True, fused=True)
        Xa, Xb = np.asarray(a.solve()), np.asarray(b.solve())
        assert np.abs(Xa - Xb).max() < 2e-4 * max(np.abs(Xa).max(), 1e-6)

    def test_weighted_l1(self):
        D, S = _problem()
        opt = ConvBPDN.options(max_iter=20, rel_stop_tol=0.0)
        # per-filter weights in the user layout Nv + (C, K, M)
        w = np.linspace(0.5, 2.0, 4).astype(np.float32).reshape(
            1, 1, 1, 1, 4)
        a = ConvBPDN(D, S, 0.1, opt=opt, wl1=w, fused=False)
        b = ConvBPDN(D, S, 0.1, opt=opt, wl1=w, fused=True)
        assert fused_csc.eligible(b.cfg, b.params, b.opts)
        Xa, Xb = np.asarray(a.solve()), np.asarray(b.solve())
        assert np.abs(Xa - Xb).max() < 2e-4 * np.abs(Xa).max()
        assert np.allclose(a.getitstat().ObjFun, b.getitstat().ObjFun,
                           rtol=1e-4)

    def test_elastic(self):
        from sporco_tpu.models.cbpdn import ConvElasticNet
        D, S = _problem()
        opt = ConvElasticNet.options(max_iter=25, rel_stop_tol=0.0)
        a = ConvElasticNet(D, S, 0.1, mu=0.05, opt=opt, fused=False)
        b = ConvElasticNet(D, S, 0.1, mu=0.05, opt=opt, fused=True)
        assert fused_csc.eligible(b.cfg, b.params, b.opts)
        Xa, Xb = np.asarray(a.solve()), np.asarray(b.solve())
        assert np.abs(Xa - Xb).max() < 2e-4 * np.abs(Xa).max()
        sa, sb = a.getitstat(), b.getitstat()
        assert np.allclose(sa.ObjFun, sb.ObjFun, rtol=1e-4)
        assert np.allclose(sa.RegL2, sb.RegL2, rtol=1e-3, atol=1e-6)

    def test_ams_mask(self):
        from sporco_tpu.models.cbpdn import AddMaskSim
        rng = np.random.default_rng(3)
        D, S = _problem()
        W = (rng.random(S.shape[:2]) > 0.2).astype(np.float32)
        opt = ConvBPDN.options(max_iter=25, rel_stop_tol=0.0)
        a = AddMaskSim(ConvBPDN, D, S, W, 0.1, opt=opt, fused=False)
        b = AddMaskSim(ConvBPDN, D, S, W, 0.1, opt=opt, fused=True)
        assert fused_csc.eligible(b.cbpdn.cfg, b.cbpdn.params,
                                  b.cbpdn.opts)
        Xa, Xb = np.asarray(a.solve()), np.asarray(b.solve())
        assert np.abs(Xa - Xb).max() < 2e-4 * np.abs(Xa).max()
        assert np.allclose(a.getitstat().ObjFun, b.getitstat().ObjFun,
                           rtol=1e-4)

    def test_gradreg(self):
        # cbpdngrd scope of the reference CUDA extension
        # (docs/source/modules/sporco.cuda.rst:107-239): per-bin
        # diagonal solve, trajectory equality with the generic path
        from sporco_tpu.models.cbpdn import ConvBPDNGradReg
        D, S = _problem()
        opt = ConvBPDNGradReg.options(max_iter=25, rel_stop_tol=0.0)
        a = ConvBPDNGradReg(D, S, 0.1, mu=0.2, opt=opt, fused=False)
        b = ConvBPDNGradReg(D, S, 0.1, mu=0.2, opt=opt, fused=True)
        assert fused_csc.eligible(b.cfg, b.params, b.opts)
        Xa, Xb = np.asarray(a.solve()), np.asarray(b.solve())
        assert np.abs(Xa - Xb).max() < 2e-4 * np.abs(Xa).max()
        sa, sb = a.getitstat(), b.getitstat()
        assert np.allclose(sa.ObjFun, sb.ObjFun, rtol=1e-4)
        assert np.allclose(sa.RegGrad, sb.RegGrad, rtol=1e-3,
                           atol=1e-6)
        assert np.allclose(sa.Rho, sb.Rho, rtol=1e-3)

    def test_gradreg_perfilter_weight(self):
        from sporco_tpu.models.cbpdn import ConvBPDNGradReg
        D, S = _problem()
        wgrd = np.array([1.0, 0.5, 2.0, 0.0], np.float32)
        opt = ConvBPDNGradReg.options(max_iter=20, rel_stop_tol=0.0)
        a = ConvBPDNGradReg(D, S, 0.1, mu=0.2, opt=opt, wgrd=wgrd,
                            fused=False)
        b = ConvBPDNGradReg(D, S, 0.1, mu=0.2, opt=opt, wgrd=wgrd,
                            fused=True)
        assert fused_csc.eligible(b.cfg, b.params, b.opts)
        Xa, Xb = np.asarray(a.solve()), np.asarray(b.solve())
        assert np.abs(Xa - Xb).max() < 2e-4 * np.abs(Xa).max()
        assert np.allclose(a.getitstat().ObjFun, b.getitstat().ObjFun,
                           rtol=1e-4)

    def test_gradreg_ams_mask(self):
        # cbpdngrdmsk scope: gradient regularisation + AMS boundary
        # mask, impulse filter excluded from the gradient penalty
        from sporco_tpu.models.cbpdn import (AddMaskSim,
                                             ConvBPDNGradReg)
        rng = np.random.default_rng(3)
        D, S = _problem()
        W = (rng.random(S.shape[:2]) > 0.2).astype(np.float32)
        wgrd = np.array([1.0, 1.0, 1.0, 1.0, 0.0], np.float32)
        opt = ConvBPDNGradReg.options(max_iter=20, rel_stop_tol=0.0)
        a = AddMaskSim(ConvBPDNGradReg, D, S, W, 0.1, mu=0.2, opt=opt,
                       wgrd=wgrd, fused=False)
        b = AddMaskSim(ConvBPDNGradReg, D, S, W, 0.1, mu=0.2, opt=opt,
                       wgrd=wgrd, fused=True)
        assert fused_csc.eligible(b.cbpdn.cfg, b.cbpdn.params,
                                  b.cbpdn.opts)
        Xa, Xb = np.asarray(a.solve()), np.asarray(b.solve())
        assert np.abs(Xa - Xb).max() < 2e-4 * np.abs(Xa).max()
        assert np.allclose(a.getitstat().ObjFun, b.getitstat().ObjFun,
                           rtol=1e-4)

    def test_mixed_matmul_precision_mode(self):
        # the opt-in "mixed" x-step precision (single-pass bf16 forward
        # conv on TPU; exact on CPU) must keep identical semantics
        D, S = _problem()
        opt = ConvBPDN.options(max_iter=15, rel_stop_tol=0.0)
        a = ConvBPDN(D, S, 0.1, opt=opt, fused=True)
        Xa = np.asarray(a.solve())
        try:
            fused_csc.set_matmul_precision("mixed")
            assert fused_csc.get_matmul_precision() == "mixed"
            b = ConvBPDN(D, S, 0.1, opt=opt, fused=True)
            Xb = np.asarray(b.solve())
        finally:
            fused_csc.set_matmul_precision("high")
        assert np.abs(Xa - Xb).max() < 2e-4 * max(np.abs(Xa).max(),
                                                  1e-6)
        import pytest
        with pytest.raises(ValueError):
            fused_csc.set_matmul_precision("bogus")

    def test_pallas_tail_matches_xla_tail(self):
        # the one-pass Pallas iteration tail (relax/prox/dual/
        # reductions) must reproduce the XLA tail's trajectory; run
        # through the Pallas interpreter on CPU
        from sporco_tpu.ops import pallas_csc_tail as pt
        D, S = _problem(N=32, M=4)
        opt = ConvBPDN.options(max_iter=12, rel_stop_tol=0.0)
        a = ConvBPDN(D, S, 0.1, opt=opt, fused=True)
        Xa = np.asarray(a.solve())
        try:
            pt.interpret = True
            pt.enabled = True
            b = ConvBPDN(D, S, 0.1, opt=opt, fused=True)
            Xb = np.asarray(b.solve())
        finally:
            pt.interpret = False
            pt.enabled = False
        assert np.abs(Xa - Xb).max() < 1e-5 * max(np.abs(Xa).max(),
                                                  1e-6)
        assert np.allclose(a.getitstat().ObjFun, b.getitstat().ObjFun,
                           rtol=1e-5)
        assert np.allclose(a.getitstat().PrimalRsdl,
                           b.getitstat().PrimalRsdl, rtol=1e-4,
                           atol=1e-7)

    def test_ineligible_configs(self):
        D, S = _problem(N=30)          # N % 8 != 0
        c = ConvBPDN(D, S, 0.1, opt=ConvBPDN.options(max_iter=5))
        assert not fused_csc.eligible(c.cfg, c.params, c.opts)
        D, S = _problem()
        c = ConvBPDN(D, S, 0.1, opt=ConvBPDN.options(max_iter=5),
                     no_bndry=True)
        assert not fused_csc.eligible(c.cfg, c.params, c.opts)

    def test_fused_true_forces_or_raises(self):
        import pytest
        # structurally unsupported (N % 8 != 0): fused=True raises
        # instead of silently falling back
        D, S = _problem(N=30)
        c = ConvBPDN(D, S, 0.1, opt=ConvBPDN.options(max_iter=5),
                     fused=True)
        with pytest.raises(ValueError, match="fused=True"):
            c.solve()
        # large support (> MAX_SUPPORT): heuristic only; fused=True
        # bypasses it and the fused path still matches the generic one
        D, S = _problem(N=64, Nd=32, M=2)
        opt = ConvBPDN.options(max_iter=8, rel_stop_tol=0.0)
        a = ConvBPDN(D, S, 0.1, opt=opt, fused=False)
        b = ConvBPDN(D, S, 0.1, opt=opt, fused=True)
        assert not fused_csc.eligible(b.cfg, b.params, b.opts)
        assert fused_csc.eligible(b.cfg, b.params, b.opts, force=True)
        Xa, Xb = np.asarray(a.solve()), np.asarray(b.solve())
        assert np.abs(Xa - Xb).max() < 2e-4 * max(np.abs(Xa).max(),
                                                  1e-6)


class TestFusedPGM:
    """Packed-layout FISTA problem vs the generic DFT-domain problem."""

    def test_matches_generic(self):
        from sporco_tpu.models import pgm as mp
        D, S = _problem()
        opt = mp.ConvBPDN.options(max_iter=30, rel_stop_tol=0.0, L=50.0)
        a = mp.ConvBPDN(D, S, 0.1, opt=opt, fused=False)
        b = mp.ConvBPDN(D, S, 0.1, opt=opt, fused=True)
        assert fused_csc.pgm_eligible(b.cfg, b.params, b.opts)
        Xa, Xb = np.asarray(a.solve()), np.asarray(b.solve())
        assert np.abs(Xa - Xb).max() < 1e-4 * np.abs(Xa).max()
        assert np.allclose(a.getitstat().ObjFun, b.getitstat().ObjFun,
                           rtol=1e-4)

    def test_masked_backtracking(self):
        from sporco_tpu.models import pgm as mp
        rng = np.random.default_rng(3)
        D, S = _problem()
        W = (rng.random(S.shape[:2]) > 0.2).astype(np.float32)
        opt = mp.ConvBPDN.options(max_iter=20, rel_stop_tol=0.0, L=20.0,
                                  backtrack="standard")
        a = mp.ConvBPDNMask(D, S, 0.1, W=W, opt=opt, fused=False)
        b = mp.ConvBPDNMask(D, S, 0.1, W=W, opt=opt, fused=True)
        Xa, Xb = np.asarray(a.solve()), np.asarray(b.solve())
        assert np.abs(Xa - Xb).max() < 1e-4 * np.abs(Xa).max()
        sa, sb = a.getitstat(), b.getitstat()
        assert np.allclose(sa.ObjFun, sb.ObjFun, rtol=1e-4)
        assert np.allclose(sa.L, sb.L, rtol=1e-5)

    def test_bb_momentum_variants(self):
        from sporco_tpu.models import pgm as mp
        D, S = _problem()
        opt = mp.ConvBPDN.options(max_iter=15, rel_stop_tol=0.0, L=50.0,
                                  stepsize="bb", momentum="linear")
        a = mp.ConvBPDN(D, S, 0.1, opt=opt, fused=False)
        b = mp.ConvBPDN(D, S, 0.1, opt=opt, fused=True)
        Xa, Xb = np.asarray(a.solve()), np.asarray(b.solve())
        assert np.abs(Xa - Xb).max() < 1e-3 * np.abs(Xa).max()


class TestPallasIterKernel:
    """The one-pass Pallas iteration kernel (ops/pallas_csc_iter.py)
    must reproduce the XLA fused path's trajectory; exercised through
    the Pallas interpreter on CPU."""

    def _run(self, **model_kw):
        from sporco_tpu.ops import pallas_csc_iter as pki
        D, S = _problem(N=32, M=4)
        opt = model_kw.pop("opt", None) or ConvBPDN.options(
            max_iter=15, rel_stop_tol=0.0)
        cls = model_kw.pop("cls", ConvBPDN)
        prev = pki.enabled
        pki.enabled = False
        try:
            a = cls(D, S, 0.1, opt=opt, fused=True, **model_kw)
            Xa = np.asarray(a.solve())
            ia = a.getitstat()
        finally:
            pki.enabled = prev
        pki.enabled = True
        pki.interpret = True
        try:
            b = cls(D, S, 0.1, opt=opt, fused=True, **model_kw)
            Xb = np.asarray(b.solve())
            ib = b.getitstat()
        finally:
            pki.interpret = False
        return Xa, Xb, ia, ib

    def _check(self, Xa, Xb, ia, ib, xtol=2e-4):
        scale = max(np.abs(Xa).max(), 1e-6)
        assert np.abs(Xa - Xb).max() < xtol * scale
        assert np.allclose(ia.ObjFun, ib.ObjFun, rtol=1e-4)
        assert np.allclose(ia.Rho, ib.Rho, rtol=1e-4)
        assert np.allclose(ia.PrimalRsdl, ib.PrimalRsdl, rtol=1e-3,
                           atol=1e-6)

    def test_matches_xla_path(self):
        self._check(*self._run())

    def test_autorho_rescale(self):
        # AutoRho Period 1 with AutoScaling: the R1/R2 linearity
        # correction must reproduce the rescaled-dual trajectory
        opt = ConvBPDN.options(max_iter=25, rel_stop_tol=0.0)
        assert opt.auto_rho.enabled and opt.auto_rho.period == 1
        Xa, Xb, ia, ib = self._run(opt=opt)
        assert not np.allclose(ia.Rho[0], ia.Rho[-1])   # rho moved
        self._check(Xa, Xb, ia, ib)

    def test_nonneg_and_weights(self):
        self._check(*self._run(
            non_neg=True,
            wl1=np.linspace(0.5, 2.0, 4).astype(np.float32)
            .reshape(1, 1, 1, 4)))

    def test_elastic_net(self):
        from sporco_tpu.models.cbpdn import ConvElasticNet
        Xa, Xb, ia, ib = self._run(cls=ConvElasticNet, mu=0.05)
        self._check(Xa, Xb, ia, ib)

    def test_kernel_numerics_direct(self):
        # direct single-call comparison against the exact f32 math
        from sporco_tpu.ops import pallas_csc_iter as pki
        rng = np.random.default_rng(0)
        pos, C, T = 64, 256, 128
        G2 = jnp.asarray(rng.standard_normal((pos, T)).astype("f"))
        Y = jnp.asarray(rng.standard_normal((pos, C)).astype("f"))
        U = jnp.asarray(rng.standard_normal((pos, C)).astype("f"))
        Wa = rng.standard_normal((T, C)).astype("f") * 0.1
        Wf = rng.standard_normal((C, T)).astype("f") * 0.1
        rlx, us, scale, thr = 1.8, 0.9, 0.8, 0.05
        pki.interpret = True
        try:
            px, yn, un, r1, r2, sums = pki.csc_iter(
                G2, Y, U, pki.split_bf16_3(jnp.asarray(Wa)),
                pki.split_bf16_3(jnp.asarray(Wf)), thr, 1.0, rlx, us,
                scale)
        finally:
            pki.interpret = False
        a = np.asarray(G2) @ Wa
        u = us * np.asarray(U)
        pxr = scale * (np.asarray(Y) - u) + a
        ax = rlx * pxr + (1 - rlx) * np.asarray(Y)
        axu = ax + u
        ynr = np.sign(axu) * np.maximum(np.abs(axu) - thr, 0.0)
        unr = u + ax - ynr
        # default pass split: adjoint 3-pass (bf16 HIGH, ~5e-6 rel);
        # R1 6-pass (f32-faithful); R2 3-pass
        assert np.abs(np.asarray(px) - pxr).max() < 1e-4
        assert np.abs(np.asarray(yn) - ynr).max() < 1e-4
        assert np.abs(np.asarray(r1) - (ynr - unr) @ Wf).max() < 5e-4
        assert np.abs(np.asarray(r2) - unr @ Wf).max() < 5e-3
        ref_sums = [((pxr - ynr) ** 2).sum(),
                    ((ynr - np.asarray(Y)) ** 2).sum(),
                    (pxr ** 2).sum(), (ynr ** 2).sum(),
                    (unr ** 2).sum(), np.abs(pxr).sum()]
        assert np.allclose(np.asarray(sums), ref_sums, rtol=1e-3)

    def test_kernel_reduced_outputs(self):
        # emit_px=False / emit_fwd=False variants (the ADMM-loop and
        # consensus-CDL configurations) must produce identical Yn/Un
        # and sums while skipping the PX store and R1/R2 products
        from sporco_tpu.ops import pallas_csc_iter as pki
        rng = np.random.default_rng(0)
        pos, C, T = 64, 256, 128
        G2 = jnp.asarray(rng.standard_normal((pos, T)).astype("f"))
        Y = jnp.asarray(rng.standard_normal((pos, C)).astype("f"))
        U = jnp.asarray(rng.standard_normal((pos, C)).astype("f"))
        Wa = pki.split_bf16_3(jnp.asarray(
            rng.standard_normal((T, C)).astype("f") * 0.1))
        Wf = pki.split_bf16_3(jnp.asarray(
            rng.standard_normal((C, T)).astype("f") * 0.1))
        args = (0.05, 1.0, 1.8, 0.9, 0.8)
        pki.interpret = True
        try:
            px_f, yn_f, un_f, r1_f, r2_f, sums_f = pki.csc_iter(
                G2, Y, U, Wa, Wf, *args)
            px_n, yn_n, un_n, r1_n, r2_n, sums_n = pki.csc_iter(
                G2, Y, U, Wa, Wf, *args, emit_px=False)
            px_c, yn_c, un_c, r1_c, r2_c, sums_c = pki.csc_iter(
                G2, Y, U, Wa, None, *args, emit_px=False,
                emit_fwd=False)
        finally:
            pki.interpret = False
        assert px_n is None and px_c is None
        assert r1_c is None and r2_c is None
        for yn2, un2, sums2 in ((yn_n, un_n, sums_n),
                                (yn_c, un_c, sums_c)):
            assert np.allclose(np.asarray(yn2), np.asarray(yn_f))
            assert np.allclose(np.asarray(un2), np.asarray(un_f))
            assert np.allclose(np.asarray(sums2), np.asarray(sums_f),
                               rtol=1e-5)
        assert np.allclose(np.asarray(r1_n), np.asarray(r1_f))


class TestPallasPGMKernel:
    """The one-pass Pallas FISTA kernel must reproduce the packed-XLA
    PGM path's trajectory (interpret mode on CPU)."""

    def _run(self, masked=False, **kw):
        from sporco_tpu.models import pgm as mpgm
        from sporco_tpu.ops import pallas_csc_iter as pki
        D, S = _problem(N=32, M=4, K=1)
        S = S[..., 0]
        W = None
        cls = mpgm.ConvBPDN
        if masked:
            rng = np.random.default_rng(3)
            W = (rng.uniform(size=S.shape) > 0.3).astype(np.float32)
            cls = mpgm.ConvBPDNMask
        opt = mpgm.ConvBPDN.options(max_iter=15, rel_stop_tol=0.0,
                                    L=50.0, **kw)
        args = dict(opt=opt)
        if masked:
            args["W"] = W
        prev = pki.enabled
        pki.enabled = False
        try:
            a = cls(D, S, 0.1, **args)
            Xa = np.asarray(a.solve()); ia = a.getitstat()
        finally:
            pki.enabled = prev
        pki.enabled = True
        pki.interpret = True
        try:
            b = cls(D, S, 0.1, **args)
            Xb = np.asarray(b.solve()); ib = b.getitstat()
        finally:
            pki.interpret = False
        scale = max(np.abs(Xa).max(), 1e-6)
        assert np.abs(Xa - Xb).max() < 2e-4 * scale
        assert np.allclose(ia.ObjFun, ib.ObjFun, rtol=1e-4)
        assert np.allclose(ia.Rsdl, ib.Rsdl, rtol=1e-3, atol=1e-6)

    def test_matches_xla_path(self):
        self._run()

    def test_masked(self):
        self._run(masked=True)

    def test_linear_momentum(self):
        self._run(momentum="linear")

    def test_backtrack_falls_back(self):
        # backtracking configurations must route to the generic path
        from sporco_tpu.models import pgm as mpgm
        from sporco_tpu.ops import fused_csc
        D, S = _problem(N=32, M=4, K=1)
        b = mpgm.ConvBPDN(D, S[..., 0], 0.1,
                          opt=mpgm.ConvBPDN.options(
                              max_iter=5, backtrack="standard"))
        assert not fused_csc._pgm_kernel_eligible(b.cfg, b.params,
                                                  b.opts)
        b.solve()   # runs via the generic packed path

"""Tests for cbpdntv / cbpdnin / pdcsc / parcbpdn.  Parity values were
produced by the reference implementation on identical data (same rng
seed/order)."""

import numpy as np
import jax.numpy as jnp

from sporco_tpu.models import cbpdntv, cbpdnin, pdcsc, parcbpdn
from sporco_tpu.solvers.admm import AutoRhoOpts


def _data():
    rng = np.random.default_rng(12345)
    N, Nd, M = 16, 5, 8
    D = rng.standard_normal((Nd, Nd, M))
    D /= np.sqrt((D ** 2).sum(axis=(0, 1), keepdims=True))
    X0 = np.zeros((N, N, 1, 1, M))
    flat = X0.reshape(-1)
    idx = rng.choice(flat.size, 12, replace=False)
    flat[idx] = rng.standard_normal(12)
    Df = np.fft.rfftn(D, s=(N, N), axes=(0, 1)).reshape(
        N, N // 2 + 1, 1, 1, M)
    Xf = np.fft.rfftn(X0, axes=(0, 1))
    S = np.fft.irfftn(np.sum(Df * Xf, axis=-1), s=(N, N),
                      axes=(0, 1))[:, :, 0, 0]
    B = rng.standard_normal((3, 2))
    S3 = np.stack([S * 1.0, S * 0.5, S * 0.2], axis=-1)
    return D, S, B, S3


D, S, B, S3 = _data()


class TestCBPDNTV:

    def test_scalartv_parity(self):
        opt = cbpdntv.ConvBPDNScalarTV.options(max_iter=50)
        b = cbpdntv.ConvBPDNScalarTV(D, S, 5e-2, 1e-2, opt=opt,
                                     dtype=jnp.float64)
        b.solve()
        assert abs(b.getitstat().ObjFun[-1] - 2.1671712) < 1e-4

    def test_vectortv_parity(self):
        opt = cbpdntv.ConvBPDNVectorTV.options(max_iter=50)
        b = cbpdntv.ConvBPDNVectorTV(D, S, 5e-2, 1e-2, opt=opt,
                                     dtype=jnp.float64)
        b.solve()
        assert abs(b.getitstat().ObjFun[-1] - 1.3365476) < 1e-4

    def test_rectv_parity(self):
        opt = cbpdntv.ConvBPDNRecTV.options(max_iter=50)
        b = cbpdntv.ConvBPDNRecTV(D, S, 5e-2, 1e-2, opt=opt,
                                  dtype=jnp.float64)
        b.solve()
        assert abs(b.getitstat().ObjFun[-1] - 1.8349280) < 1e-4

    def test_coef_shapes(self):
        opt = cbpdntv.ConvBPDNScalarTV.options(max_iter=5)
        b = cbpdntv.ConvBPDNScalarTV(D, S, 5e-2, 1e-2, opt=opt,
                                     dtype=jnp.float64)
        X = b.solve()
        assert X.shape == (16, 16, 1, 1, 8)
        Sr = b.reconstruct()
        assert Sr.shape == (16, 16)


class TestCBPDNIn:

    def test_inhibition_runs(self):
        Wg = np.zeros((2, 8))
        Wg[0, :4] = 1.0
        Wg[1, 4:] = 1.0
        opt = cbpdnin.ConvBPDNInhib.options(max_iter=50)
        b = cbpdnin.ConvBPDNInhib(D, S, Wg=Wg, lmbda=5e-2, mu=0.5,
                                  opt=opt, dtype=jnp.float64)
        b.solve()
        its = b.getitstat()
        assert np.all(np.isfinite(its.ObjFun))
        assert np.any(its.RegLat > 0)

    def test_self_inhibition(self):
        opt = cbpdnin.ConvBPDNInhib.options(max_iter=30)
        b = cbpdnin.ConvBPDNInhib(D, S, Wg=None, lmbda=5e-2, mu=0.0,
                                  gamma=0.1, opt=opt, dtype=jnp.float64)
        b.solve()
        its = b.getitstat()
        assert np.all(np.isfinite(its.ObjFun))
        assert np.any(its.RegSelf > 0)

    def test_inhibition_vs_plain(self):
        # with inhibition off it should match plain ConvBPDN
        from sporco_tpu.models import cbpdn as _cb
        opt = cbpdnin.ConvBPDNInhib.options(max_iter=30)
        b1 = cbpdnin.ConvBPDNInhib(D, S, Wg=None, lmbda=5e-2, mu=0.0,
                                   gamma=0.0, opt=opt,
                                   dtype=jnp.float64)
        X1 = np.asarray(b1.solve())
        opt2 = _cb.ConvBPDN.options(max_iter=30)
        b2 = _cb.ConvBPDN(D, S, lmbda=5e-2, opt=opt2, dtype=jnp.float64)
        X2 = np.asarray(b2.solve())
        assert np.allclose(X1, X2, atol=1e-10)


class TestPDCSC:

    def test_pdcsc_parity(self):
        opt = pdcsc.ConvProdDictBPDN.options(max_iter=50)
        b = pdcsc.ConvProdDictBPDN(D, B, S3, 5e-2, opt=opt, dimK=0,
                                   dtype=jnp.float64)
        b.solve()
        assert abs(b.getitstat().ObjFun[-1] - 0.99965408) < 1e-4

    def test_pdcsc_joint_parity(self):
        opt = pdcsc.ConvProdDictBPDNJoint.options(max_iter=50)
        b = pdcsc.ConvProdDictBPDNJoint(D, B, S3, 5e-2, 1e-2, opt=opt,
                                        dimK=0, dtype=jnp.float64)
        b.solve()
        assert abs(b.getitstat().ObjFun[-1] - 1.00177254) < 1e-4

    def test_pdcsc_l1l1grd_parity(self):
        opt = pdcsc.ConvProdDictL1L1Grd.options(max_iter=50)
        b = pdcsc.ConvProdDictL1L1Grd(D, B, S3, 5e-2, 1e-2, opt=opt,
                                      dtype=jnp.float64)
        b.solve()
        assert abs(b.getitstat().ObjFun[-1] - 6.4100770) < 1e-4

    def test_l1l1grdjoint_runs(self):
        opt = pdcsc.ConvProdDictL1L1GrdJoint.options(max_iter=20)
        b = pdcsc.ConvProdDictL1L1GrdJoint(D, B, S3, 5e-2, mu=1e-2,
                                           mu2=1e-2, opt=opt, dimK=0,
                                           dtype=jnp.float64)
        b.solve()
        assert np.all(np.isfinite(b.getitstat().ObjFun))

    def test_reconstruct(self):
        # signal constructed within the span of B's columns so exact
        # reconstruction is possible
        w = np.array([0.7, -0.4])
        chan = B @ w                       # (C,)
        S3b = S[..., None] * chan[None, None, :]
        opt = pdcsc.ConvProdDictBPDN.options(
            max_iter=500, rel_stop_tol=1e-8, rho=0.5,
            auto_rho=AutoRhoOpts(enabled=False))
        b = pdcsc.ConvProdDictBPDN(D, B, S3b, 1e-4, opt=opt, dimK=0,
                                   dtype=jnp.float64)
        b.solve()
        Sr = b.reconstruct()
        # internal S layout: (K, C, 1, Nv)
        Si = np.asarray(Sr)[0, :, 0]
        ref = np.moveaxis(S3b, -1, 0)
        assert np.linalg.norm(Si - ref) / np.linalg.norm(ref) < 0.05


class TestParConvBPDN:

    def test_parity_with_reference(self):
        # reference (serial fallback, ngrp=4) gives |X|_1 = 9.2115882
        # and normalised primal residual 0.020259 after 50 iterations
        opt = parcbpdn.ParConvBPDN.options(max_iter=50,
                                           rel_stop_tol=1e-9)
        b = parcbpdn.ParConvBPDN(D, S, 5e-2, opt=opt, ngrp=4,
                                 dtype=jnp.float64)
        X = np.asarray(b.solve())
        assert abs(np.abs(X).sum() - 9.2115882) < 1e-4

    def test_matches_convbpdn(self):
        from sporco_tpu.models import cbpdn as _cb
        opt = parcbpdn.ParConvBPDN.options(max_iter=400,
                                           rel_stop_tol=1e-9)
        b = parcbpdn.ParConvBPDN(D, S, 5e-2, opt=opt, ngrp=4,
                                 dtype=jnp.float64)
        Xp = np.asarray(b.solve())
        opt2 = _cb.ConvBPDN.options(max_iter=400, rel_stop_tol=1e-9,
                                    rho=2.5,
                                    auto_rho=AutoRhoOpts(enabled=False))
        b2 = _cb.ConvBPDN(D, S, lmbda=5e-2, opt=opt2, dtype=jnp.float64)
        X2 = np.asarray(b2.solve())
        assert np.linalg.norm(Xp - X2) / max(np.linalg.norm(X2), 1e-8) \
            < 5e-2

    def test_masked(self):
        rng = np.random.default_rng(0)
        W = (rng.random(S.shape) > 0.2).astype(np.float64)
        opt = parcbpdn.ParConvBPDN.options(max_iter=50)
        b = parcbpdn.ParConvBPDN(D, S, 5e-2, W=W, opt=opt, ngrp=4,
                                 dtype=jnp.float64)
        X = np.asarray(b.solve())
        assert np.all(np.isfinite(X))

    def test_itstat_contract(self):
        # standard per-iteration stats contract (objective, residuals,
        # thresholds), like every other solver in the package
        opt = parcbpdn.ParConvBPDN.options(max_iter=20,
                                           rel_stop_tol=1e-9)
        b = parcbpdn.ParConvBPDN(D, S, 5e-2, opt=opt, ngrp=4,
                                 dtype=jnp.float64)
        b.solve()
        its = b.getitstat()
        assert len(its) == 20
        assert np.all(np.isfinite(its.ObjFun))
        # objective decreases overall and equals DFid + lmbda RegL1
        assert its.ObjFun[-1] < its.ObjFun[0]
        assert np.allclose(its.ObjFun, its.DFid + 5e-2 * its.RegL1,
                           rtol=1e-6)
        assert np.all(its.PrimalRsdl > 0) and np.all(its.DualRsdl >= 0)
        assert np.all(its.Rho == its.Rho[0])

    def test_filter_sharded_matches_single(self):
        # the M=8 filters in 8 groups sharded over the mesh "filter"
        # axis (8 virtual devices): identical trajectory to the
        # single-device run, with the y0 coupling as an all-reduce
        from sporco_tpu.parallel.mesh import make_mesh
        opt = parcbpdn.ParConvBPDN.options(max_iter=30,
                                           rel_stop_tol=1e-9)
        b1 = parcbpdn.ParConvBPDN(D, S, 5e-2, opt=opt, ngrp=8,
                                  dtype=jnp.float64)
        X1 = np.asarray(b1.solve())
        mesh = make_mesh(n_data=1, n_filter=8)
        b2 = parcbpdn.ParConvBPDN(D, S, 5e-2, opt=opt, ngrp=8,
                                  dtype=jnp.float64, mesh=mesh)
        # the group axis really is distributed over all 8 devices
        assert len(b2.state[2].sharding.device_set) == 8
        X2 = np.asarray(b2.solve())
        assert np.allclose(X1, X2, atol=1e-10)
        assert np.allclose(b1.getitstat().ObjFun, b2.getitstat().ObjFun,
                           rtol=1e-10)

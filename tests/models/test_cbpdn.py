import numpy as np
import jax.numpy as jnp

from sporco_tpu import cnvrep as cr
from sporco_tpu.models import cbpdn
from sporco_tpu.ops.linalg import rrs
from sporco_tpu.solvers.admm import AutoRhoOpts


class TestDimInference:
    """Shape/dim-inference table tests (mirror of
    tests/admm/test_cbpdn.py:19-81 in the reference)."""

    def _cri(self, Dshape, Sshape, dimK=None, dimN=2):
        return cr.csc_index(Dshape, Sshape, dimK=dimK, dimN=dimN)

    def test_cases(self):
        # (Dshape, Sshape, dimK, expect dict)
        cases = [
            ((4, 4, 16), (8, 8), None, dict(dimC=0, dimK=0, C=1, K=1, M=16)),
            ((4, 4, 16), (8, 8, 3), None, dict(dimC=0, dimK=1, K=3, C=1)),
            ((4, 4, 16), (8, 8, 3), 1, dict(dimC=0, dimK=1, K=3)),
            ((4, 4, 16), (8, 8, 3), 0, dict(dimC=1, dimK=0, C=3, K=1)),
            ((4, 4, 3, 16), (8, 8, 3), None, dict(dimC=1, dimK=0, C=3,
                                                  Cd=3, K=1)),
            ((4, 4, 3, 16), (8, 8, 3, 5), None, dict(dimC=1, dimK=1, C=3,
                                                     K=5)),
            ((4, 4, 16), (8, 8, 3, 5), None, dict(dimC=1, dimK=1, C=3,
                                                  K=5, Cx=3)),
        ]
        for Ds, Ss, dimK, exp in cases:
            cri = self._cri(Ds, Ss, dimK)
            for k, v in exp.items():
                assert getattr(cri, k) == v, (Ds, Ss, dimK, k)

    def test_mismatch_raises(self):
        import pytest
        with pytest.raises(ValueError):
            self._cri((4, 4, 3, 16), (8, 8, 4))

    def test_layout_roundtrip(self):
        rng = np.random.default_rng(0)
        cri = self._cri((4, 4, 3, 16), (8, 8, 3, 5))
        X = jnp.array(rng.standard_normal(cri.shpX))
        Xu = cr.from_internal_X(X, cri)
        assert Xu.shape == (8, 8, 1, 5, 16)
        X2 = cr.to_internal_X(Xu, cri)
        assert np.allclose(np.asarray(X), np.asarray(X2))

    def test_reconstruct_shapes(self):
        # reconstruct() must return the USER signal layout for every
        # D/S shape combination of the inference table (regression for
        # the K-axis/channel-axis squeeze mix-up)
        rng = np.random.default_rng(0)
        cases = [
            ((4, 4, 8), (16, 16), None),          # single signal
            ((4, 4, 8), (16, 16, 3), None),       # K=3 signals
            ((4, 4, 8), (16, 16, 3), 0),          # C=3 channels
            ((4, 4, 3, 8), (16, 16, 3), None),    # multi-chan dict
            ((4, 4, 8), (16, 16, 3, 5), None),    # C=3, K=5
        ]
        for Ds, Ss, dimK in cases:
            D = rng.standard_normal(Ds).astype(np.float32)
            S = rng.standard_normal(Ss).astype(np.float32)
            b = cbpdn.ConvBPDN(D, S, lmbda=0.1, dimK=dimK,
                               opt=cbpdn.ConvBPDN.options(max_iter=2))
            b.solve()
            Sr = np.asarray(b.reconstruct())
            assert Sr.shape == Ss, (Ds, Ss, dimK, Sr.shape)


def _make_problem(rng, N=16, Nd=5, M=8, K=1, C=1, nspikes=16,
                  multi_chan_dict=False, normalise=True):
    if multi_chan_dict:
        D = rng.standard_normal((Nd, Nd, C, M))
        if normalise:
            D /= np.sqrt(np.sum(D ** 2, axis=(0, 1, 2), keepdims=True))
    else:
        D = rng.standard_normal((Nd, Nd, M))
        if normalise:
            D /= np.sqrt(np.sum(D ** 2, axis=(0, 1), keepdims=True))
    Cx = 1 if multi_chan_dict else C
    X0 = np.zeros((N, N, Cx, K, M))
    flat = X0.reshape(-1)
    idx = rng.choice(flat.size, nspikes, replace=False)
    flat[idx] = rng.standard_normal(nspikes)
    # build S by circular convolution
    Df = np.fft.rfftn(D.reshape((Nd, Nd) + (1,) * (D.ndim - 3)
                                + D.shape[2:]),
                      s=(N, N), axes=(0, 1))
    if multi_chan_dict:
        Df = Df.reshape(N, N // 2 + 1, C, 1, M)
    else:
        Df = Df.reshape((N, N // 2 + 1, 1, 1, M))
    Xf = np.fft.rfftn(X0, axes=(0, 1))
    Sf = np.sum(Df * Xf, axis=-1)
    S = np.fft.irfftn(Sf, s=(N, N), axes=(0, 1))   # (N,N,C,K)
    if not multi_chan_dict and C == 1:
        S = S[:, :, 0]
    if K == 1:
        S = S[..., 0]
    if D.ndim == 4 and not multi_chan_dict:
        pass
    return D, S, X0


class TestConvBPDN:

    def setup_method(self):
        self.rng = np.random.default_rng(12345)

    def test_recovery_and_linsolve(self):
        # mirror of the reference's tight-tolerance recovery test
        # (tests/admm/test_cbpdn.py:156-176): unnormalised dictionary,
        # lmbda=1e-4, rho=1e-1, 500 iterations
        N, M, Nd = 64, 4, 8
        D = self.rng.standard_normal((Nd, Nd, M))
        X0 = np.zeros((N, N, M))
        xp = np.abs(self.rng.standard_normal((N, N, M))) > 3
        X0[xp] = self.rng.standard_normal(int(xp.sum()))
        Df = np.fft.rfftn(D, s=(N, N), axes=(0, 1))
        Xf = np.fft.rfftn(X0, axes=(0, 1))
        S = np.fft.irfftn(np.sum(Df * Xf, axis=2), s=(N, N), axes=(0, 1))
        opt = cbpdn.ConvBPDN.options(max_iter=500, rel_stop_tol=1e-9,
                                     rho=1e-1,
                                     auto_rho=AutoRhoOpts(enabled=False))
        b = cbpdn.ConvBPDN(D, S, lmbda=1e-4, opt=opt, lin_check=True,
                           dtype=jnp.float64)
        X = b.solve()
        its = b.getitstat()
        # inner-solve accuracy (reference asserts < 1e-5,
        # tests/admm/test_cbpdn.py:139)
        assert np.nanmax(its.XSlvRelRes) < 1e-5
        # ground-truth recovery (reference asserts rrs < 5e-5)
        assert float(rrs(jnp.array(X0), jnp.squeeze(X))) < 5e-5
        Sr = b.reconstruct()
        assert float(rrs(jnp.array(S), Sr)) < 1e-4

    def test_multi_signal_matches_reference_value(self):
        # this config was cross-checked against the reference solver on
        # identical data: both converge to rrs(X0, X) = 0.2126451...
        # (recovery is ambiguous at this density; the point is exact
        # behavioural parity of the iteration)
        D, S, X0 = _make_problem(self.rng, N=16, Nd=5, M=8, K=3,
                                 nspikes=20)
        opt = cbpdn.ConvBPDN.options(max_iter=300, rel_stop_tol=1e-8,
                                     rho=1e-1,
                                     auto_rho=AutoRhoOpts(enabled=False))
        b = cbpdn.ConvBPDN(D, S, lmbda=1e-4, opt=opt, dtype=jnp.float64)
        X = b.solve()
        assert X.shape == (16, 16, 1, 3, 8)
        r = float(rrs(jnp.array(X0), X))
        assert abs(r - 0.212645151756657) < 1e-6

    def test_multi_signal_recovery(self):
        D, S, X0 = _make_problem(self.rng, N=32, Nd=5, M=8, K=3,
                                 nspikes=12, normalise=False)
        opt = cbpdn.ConvBPDN.options(max_iter=500, rel_stop_tol=1e-9,
                                     rho=1e-1,
                                     auto_rho=AutoRhoOpts(enabled=False))
        b = cbpdn.ConvBPDN(D, S, lmbda=1e-4, opt=opt, dtype=jnp.float64)
        X = b.solve()
        assert float(rrs(jnp.array(X0), X)) < 5e-4

    def test_multichannel_dict(self):
        # multi-channel dictionary exercises the iterated-SM solver
        D, S, X0 = _make_problem(self.rng, N=16, Nd=5, M=8, C=3,
                                 multi_chan_dict=True, nspikes=12)
        opt = cbpdn.ConvBPDN.options(max_iter=400, rel_stop_tol=1e-9,
                                     rho=1e-1,
                                     auto_rho=AutoRhoOpts(enabled=False))
        b = cbpdn.ConvBPDN(D, S, lmbda=1e-4, opt=opt, lin_check=True,
                           dtype=jnp.float64)
        X = b.solve()
        its = b.getitstat()
        assert np.nanmax(its.XSlvRelRes) < 1e-5
        assert float(rrs(jnp.array(X0), X)) < 1e-3

    def test_autorho_denoise(self):
        # realistic denoising run with default AutoRho
        D, S, X0 = _make_problem(self.rng, N=32, Nd=5, M=8, nspikes=24)
        Sn = S + 0.02 * self.rng.standard_normal(S.shape)
        opt = cbpdn.ConvBPDN.options(max_iter=100)
        b = cbpdn.ConvBPDN(D, Sn, lmbda=5e-2, opt=opt, dtype=jnp.float64)
        b.solve()
        its = b.getitstat()
        # cross-checked against the reference solver on identical data:
        # the AutoRho trajectory oscillates in both, and the final
        # objective matches to float32 precision (5.8926238)
        assert abs(its.ObjFun[-1] - 5.8926238) < 1e-4
        assert abs(its.Rho[-1] - 0.16339944) < 1e-4

    def test_default_lmbda(self):
        D, S, _ = _make_problem(self.rng)
        b = cbpdn.ConvBPDN(D, S, opt=cbpdn.ConvBPDN.options(max_iter=5),
                           dtype=jnp.float64)
        assert b.lmbda > 0
        b.solve()

    def test_non_neg_and_bndry(self):
        D, S, _ = _make_problem(self.rng)
        opt = cbpdn.ConvBPDN.options(max_iter=30)
        b = cbpdn.ConvBPDN(D, S, lmbda=1e-2, opt=opt, non_neg=True,
                           no_bndry=True, dtype=jnp.float64)
        X = b.solve()
        assert float(jnp.min(X)) >= 0
        Xn = np.asarray(X)
        assert np.allclose(Xn[-4:], 0)    # Nd-1 = 4 boundary rows
        assert np.allclose(Xn[:, -4:], 0)

    def test_weighted_l1(self):
        D, S, _ = _make_problem(self.rng)
        wl1 = np.ones(S.shape + (8,))
        wl1[..., 0] = 100.0   # suppress filter 0
        opt = cbpdn.ConvBPDN.options(max_iter=50)
        b = cbpdn.ConvBPDN(D, S, lmbda=1e-2, opt=opt, wl1=wl1,
                           dtype=jnp.float64)
        X = np.asarray(b.solve())
        assert np.abs(X[..., 0]).max() < 1e-6


class TestVariants:

    def setup_method(self):
        self.rng = np.random.default_rng(12345)
        self.D, self.S, self.X0 = _make_problem(self.rng, N=16, Nd=5,
                                                M=8, nspikes=12)

    def test_joint(self):
        D, S, X0 = _make_problem(self.rng, N=16, Nd=5, M=8, C=3,
                                 nspikes=15)
        opt = cbpdn.ConvBPDNJoint.options(max_iter=50)
        b = cbpdn.ConvBPDNJoint(D, S, lmbda=1e-2, mu=1e-2, opt=opt,
                                dtype=jnp.float64)
        b.solve()
        its = b.getitstat()
        # cross-checked: the reference converges to ObjFun=1.5245053 on
        # identical data (same rng seed/consumption order)
        assert abs(its.ObjFun[-1] - 1.5245053) < 1e-4

    def test_elastic(self):
        opt = cbpdn.ConvElasticNet.options(max_iter=100,
                                           rel_stop_tol=1e-7)
        b = cbpdn.ConvElasticNet(self.D, self.S, lmbda=1e-3, mu=1e-3,
                                 opt=opt, dtype=jnp.float64,
                                 lin_check=True)
        b.solve()
        its = b.getitstat()
        assert np.nanmax(its.XSlvRelRes) < 1e-5

    def test_gradreg(self):
        opt = cbpdn.ConvBPDNGradReg.options(max_iter=100,
                                            rel_stop_tol=1e-7)
        b = cbpdn.ConvBPDNGradReg(self.D, self.S, lmbda=1e-3, mu=1e-2,
                                  opt=opt, dtype=jnp.float64,
                                  lin_check=True)
        b.solve()
        its = b.getitstat()
        assert np.nanmax(its.XSlvRelRes) < 1e-5
        assert np.all(np.isfinite(its.RegGrad))

    def test_gradreg_weights(self):
        wgrd = np.ones(8); wgrd[-1] = 0.0   # unpenalised last filter
        opt = cbpdn.ConvBPDNGradReg.options(max_iter=30)
        b = cbpdn.ConvBPDNGradReg(self.D, self.S, lmbda=1e-3, mu=1e-2,
                                  opt=opt, wgrd=wgrd, dtype=jnp.float64)
        b.solve()

    def test_projl1(self):
        gamma = 5.0
        opt = cbpdn.ConvBPDNProjL1.options(max_iter=200,
                                           rel_stop_tol=1e-7)
        b = cbpdn.ConvBPDNProjL1(self.D, self.S, gamma, opt=opt,
                                 dtype=jnp.float64)
        X = np.asarray(b.solve())
        assert np.abs(X).sum() <= gamma * (1 + 1e-6)


class TestMasked:

    def setup_method(self):
        self.rng = np.random.default_rng(12345)
        self.D, self.S, self.X0 = _make_problem(self.rng, N=16, Nd=5,
                                                M=8, nspikes=12)
        self.W = (self.rng.random((16, 16)) > 0.25).astype(np.float64)

    def test_maskdcpl_full_mask_equals_unmasked(self):
        # with W == 1, mask decoupling solves plain ConvBPDN
        opt1 = cbpdn.ConvBPDNMaskDcpl.options(
            max_iter=400, rel_stop_tol=1e-9, rho=2e-1,
            auto_rho=AutoRhoOpts(enabled=False))
        bm = cbpdn.ConvBPDNMaskDcpl(self.D, self.S, lmbda=1e-3,
                                    W=np.ones((16, 16)), opt=opt1,
                                    dtype=jnp.float64)
        Xm = np.asarray(bm.solve())
        opt2 = cbpdn.ConvBPDN.options(max_iter=400, rel_stop_tol=1e-9,
                                      rho=2e-1,
                                      auto_rho=AutoRhoOpts(enabled=False))
        b = cbpdn.ConvBPDN(self.D, self.S, lmbda=1e-3, opt=opt2,
                           dtype=jnp.float64)
        X = np.asarray(b.solve())
        assert np.linalg.norm(Xm - X) / np.linalg.norm(X) < 1e-2

    def test_maskdcpl_converges(self):
        opt = cbpdn.ConvBPDNMaskDcpl.options(max_iter=100)
        b = cbpdn.ConvBPDNMaskDcpl(self.D, self.S, lmbda=1e-2, W=self.W,
                                   opt=opt, dtype=jnp.float64)
        b.solve()
        its = b.getitstat()
        # cross-checked against the reference on identical data
        assert abs(its.ObjFun[-1] - 0.097373515) < 1e-4

    def test_l1l1grd(self):
        opt = cbpdn.ConvL1L1Grd.options(max_iter=100)
        b = cbpdn.ConvL1L1Grd(self.D, self.S, lmbda=1e-2, mu=1e-2,
                              W=self.W, opt=opt, dtype=jnp.float64)
        b.solve()
        its = b.getitstat()
        # cross-checked against the reference on identical data
        assert abs(its.ObjFun[-1] - 0.19512854) < 1e-4

    def test_conv_minl1inl2ball(self):
        eps = 1e-2
        opt = cbpdn.ConvMinL1InL2Ball.options(max_iter=200, rho=2.0,
                                              rel_stop_tol=1e-7)
        b = cbpdn.ConvMinL1InL2Ball(self.D, self.S, eps, opt=opt,
                                    dtype=jnp.float64)
        X = b.solve()
        Sr = np.asarray(b.reconstruct())
        resid = np.linalg.norm(Sr - np.asarray(self.S))
        assert resid <= eps * 2

    def test_addmasksim(self):
        opt = cbpdn.ConvBPDN.options(max_iter=100)
        ams = cbpdn.AddMaskSim(cbpdn.ConvBPDN, self.D, self.S, self.W,
                               1e-2, opt=opt, dtype=jnp.float64)
        X = ams.solve()
        assert X.shape[-1] == 8   # impulse map stripped
        its = ams.getitstat()
        assert np.all(np.isfinite(its.ObjFun))
        Sr = ams.reconstruct()
        assert Sr.shape[:2] == (16, 16)


class TestComplex:
    """Complex-valued input support (the reference's test_10cplx
    pattern, tests/admm/test_cbpdn.py:178-200)."""

    def test_complex_recovery(self):
        rng = np.random.default_rng(12345)
        N, M, Nd = 32, 4, 8
        D = rng.standard_normal((Nd, Nd, M)) \
            + 1j * rng.standard_normal((Nd, Nd, M))
        X0 = np.zeros((N, N, M), complex)
        xp = np.abs(rng.standard_normal((N, N, M))) > 2.5
        nsp = int(xp.sum())
        X0[xp] = rng.standard_normal(nsp) + 1j * rng.standard_normal(nsp)
        Df = np.fft.fftn(D, s=(N, N), axes=(0, 1))
        Xf = np.fft.fftn(X0, axes=(0, 1))
        S = np.fft.ifftn(np.sum(Df * Xf, axis=2), axes=(0, 1))
        opt = cbpdn.ConvBPDN.options(max_iter=500, rel_stop_tol=1e-9,
                                     rho=1e-1,
                                     auto_rho=AutoRhoOpts(enabled=False))
        b = cbpdn.ConvBPDN(D, S, lmbda=1e-4, opt=opt,
                           dtype=jnp.float64)
        X = b.solve()
        assert jnp.iscomplexobj(X)
        assert float(rrs(jnp.array(X0), jnp.squeeze(X))) < 5e-5
        Sr = b.reconstruct()
        assert float(rrs(jnp.array(S), Sr)) < 1e-4


class TestMultiDict:

    def test_multidict(self):
        rng = np.random.default_rng(12345)
        N, Nd, M = 16, 5, 8
        D0 = rng.standard_normal((Nd, Nd, M))
        D1 = rng.standard_normal((4, 4, M))
        X0 = np.zeros((N, N, M))
        xp = np.abs(rng.standard_normal((N, N, M))) > 2.8
        X0[xp] = rng.standard_normal(int(xp.sum()))
        def conv(D):
            Df = np.fft.rfftn(D, s=(N, N), axes=(0, 1))
            Xf = np.fft.rfftn(X0, axes=(0, 1))
            return np.fft.irfftn(np.sum(Df * Xf, axis=2), s=(N, N),
                                 axes=(0, 1))
        S0, S1 = conv(D0), conv(D1)
        opt = cbpdn.ConvBPDN.options(max_iter=300, rel_stop_tol=1e-8,
                                     rho=2e-1,
                                     auto_rho=AutoRhoOpts(enabled=False))
        md = cbpdn.MultiDictConvBPDN(cbpdn.ConvBPDN, [D0, D1], [S0, S1],
                                     1e-4, opt=opt, dtype=jnp.float64)
        X = md.solve()
        from sporco_tpu.ops.linalg import rrs as _rrs
        # cross-checked: the reference converges to rrs = 0.1364922 on
        # identical data under this configuration
        r = float(_rrs(jnp.array(X0), jnp.squeeze(X)))
        assert abs(r - 0.13649218) < 1e-5
        R0 = md.reconstruct(0)
        assert np.linalg.norm(np.squeeze(np.asarray(R0)) - S0) \
            / np.linalg.norm(S0) < 1e-3

import numpy as np
import jax.numpy as jnp

from sporco_tpu.models import pgm, bpdn as abpdn, cbpdn as acbpdn
from sporco_tpu.ops.linalg import rrs
from sporco_tpu.solvers.admm import AutoRhoOpts


class TestPGMBPDN:

    def setup_method(self):
        self.rng = np.random.default_rng(12345)
        N, M = 32, 64
        self.D = self.rng.standard_normal((N, M))
        x0 = np.zeros((M, 1))
        x0[self.rng.choice(M, 6, replace=False)] = \
            self.rng.standard_normal((6, 1))
        self.x0 = x0
        self.S = self.D @ x0

    def test_reference_parity(self):
        # cross-checked: the reference PGM BPDN on identical data stops
        # at rrs(x0, X) = 0.7243272 under this (slow-converging) config
        opt = pgm.BPDN.options(max_iter=800, rel_stop_tol=1e-9, L=400.0)
        b = pgm.BPDN(self.D, self.S, lmbda=1e-4, opt=opt,
                     dtype=jnp.float64)
        X = b.solve()
        r = float(rrs(jnp.array(self.x0), X))
        assert abs(r - 0.7243272262) < 1e-6

    def test_matches_admm(self):
        lmbda = 5e-2
        optp = pgm.BPDN.options(max_iter=1000, rel_stop_tol=1e-10,
                                L=300.0)
        bp = pgm.BPDN(self.D, self.S, lmbda=lmbda, opt=optp,
                      dtype=jnp.float64)
        Xp = np.asarray(bp.solve())
        opta = abpdn.BPDN.options(max_iter=500, rel_stop_tol=1e-9)
        ba = abpdn.BPDN(self.D, self.S, lmbda=lmbda, opt=opta,
                        dtype=jnp.float64)
        Xa = np.asarray(ba.solve())
        assert np.linalg.norm(Xp - Xa) / np.linalg.norm(Xa) < 1e-3

    def test_backtrack_standard(self):
        opt = pgm.BPDN.options(max_iter=300, rel_stop_tol=1e-8,
                               backtrack="standard", L=1.0)
        b = pgm.BPDN(self.D, self.S, lmbda=1e-3, opt=opt,
                     dtype=jnp.float64)
        b.solve()
        its = b.getitstat()
        # L must have been increased by the line search
        assert its.L[-1] > 1.0
        assert np.all(its.F_Btrack[np.isfinite(its.F_Btrack)]
                      <= its.Q_Btrack[np.isfinite(its.Q_Btrack)] + 1e-9)

    def test_backtrack_robust(self):
        opt = pgm.BPDN.options(max_iter=300, rel_stop_tol=1e-8,
                               backtrack="robust", L=1.0,
                               bt_gamma_u=2.0)
        b = pgm.BPDN(self.D, self.S, lmbda=1e-3, opt=opt,
                     dtype=jnp.float64)
        X = b.solve()
        its = b.getitstat()
        assert its.ObjFun[-1] <= its.ObjFun[5]

    def test_bb_stepsize(self):
        opt = pgm.BPDN.options(max_iter=300, rel_stop_tol=1e-8,
                               stepsize="bb", L=500.0)
        b = pgm.BPDN(self.D, self.S, lmbda=1e-3, opt=opt,
                     dtype=jnp.float64)
        b.solve()
        its = b.getitstat()
        assert not np.allclose(its.L[-1], 500.0)   # BB adapted L

    def test_cauchy_stepsize(self):
        opt = pgm.BPDN.options(max_iter=200, rel_stop_tol=1e-8,
                               stepsize="cauchy", L=500.0)
        b = pgm.BPDN(self.D, self.S, lmbda=1e-3, opt=opt,
                     dtype=jnp.float64)
        b.solve()

    def test_momentum_variants(self):
        for mom in ["nesterov", "linear", "genlinear"]:
            opt = pgm.BPDN.options(max_iter=100, momentum=mom, L=300.0)
            b = pgm.BPDN(self.D, self.S, lmbda=1e-2, opt=opt,
                         dtype=jnp.float64)
            b.solve()
            assert np.isfinite(b.getitstat().ObjFun[-1])

    def test_monotone(self):
        opt = pgm.BPDN.options(max_iter=200, monotone=True, L=300.0)
        b = pgm.BPDN(self.D, self.S, lmbda=1e-2, opt=opt,
                     dtype=jnp.float64)
        b.solve()
        o = b.getitstat().ObjFun
        assert np.all(np.diff(o[1:]) <= 1e-8)   # monotone decrease

    def test_weighted(self):
        W = np.ones_like(self.S); W[:4] = 0.0
        opt = pgm.WeightedBPDN.options(max_iter=100, L=300.0)
        b = pgm.WeightedBPDN(self.D, self.S, lmbda=1e-2, W=W, opt=opt,
                             dtype=jnp.float64)
        b.solve()
        assert np.isfinite(b.getitstat().ObjFun[-1])


class TestPGMConvBPDN:

    def setup_method(self):
        rng = np.random.default_rng(12345)
        N, Nd, M = 32, 5, 8
        D = rng.standard_normal((Nd, Nd, M))
        X0 = np.zeros((N, N, M))
        xr = rng.standard_normal((N, N, M))
        X0[np.abs(xr) > 2.5] = rng.standard_normal(
            int((np.abs(xr) > 2.5).sum()))
        Df = np.fft.rfftn(D, s=(N, N), axes=(0, 1))
        Xf = np.fft.rfftn(X0, axes=(0, 1))
        S = np.fft.irfftn(np.sum(Df * Xf, axis=2), s=(N, N),
                          axes=(0, 1))
        self.D, self.S, self.X0 = D, S, X0

    def test_objective_optimality(self):
        # FISTA support recovery at tiny lmbda is intrinsically slow
        # (the reference behaves identically); assert convergence to
        # the same objective value as the ADMM solver instead
        lmbda = 1e-2
        opt = pgm.ConvBPDN.options(max_iter=2000, rel_stop_tol=1e-10,
                                   backtrack="standard", L=10.0)
        b = pgm.ConvBPDN(self.D, self.S, lmbda=lmbda, opt=opt,
                         dtype=jnp.float64)
        b.solve()
        opta = acbpdn.ConvBPDN.options(max_iter=3000,
                                       rel_stop_tol=1e-12, rho=0.5,
                                       auto_rho=AutoRhoOpts(
                                           enabled=False))
        ba = acbpdn.ConvBPDN(self.D, self.S, lmbda=lmbda, opt=opta,
                             dtype=jnp.float64)
        ba.solve()
        op = b.getitstat().ObjFun[-1]
        oa = ba.getitstat().ObjFun[-1]
        assert abs(op - oa) / oa < 1e-2

    def test_matches_admm(self):
        lmbda = 1e-2
        optp = pgm.ConvBPDN.options(max_iter=3000, rel_stop_tol=1e-12,
                                    L=400.0)
        bp = pgm.ConvBPDN(self.D, self.S, lmbda=lmbda, opt=optp,
                          dtype=jnp.float64)
        Xp = np.asarray(bp.solve())
        opta = acbpdn.ConvBPDN.options(max_iter=3000,
                                       rel_stop_tol=1e-12, rho=0.5,
                                       auto_rho=AutoRhoOpts(
                                           enabled=False))
        ba = acbpdn.ConvBPDN(self.D, self.S, lmbda=lmbda, opt=opta,
                             dtype=jnp.float64)
        Xa = np.asarray(ba.solve())
        assert np.linalg.norm(Xp - Xa) / np.linalg.norm(Xa) < 2e-2

    def test_masked(self):
        rng = np.random.default_rng(0)
        W = (rng.random(self.S.shape) > 0.2).astype(np.float64)
        opt = pgm.ConvBPDNMask.options(max_iter=100, L=500.0)
        b = pgm.ConvBPDNMask(self.D, self.S, lmbda=1e-2, W=W, opt=opt,
                             dtype=jnp.float64)
        b.solve()
        assert np.isfinite(b.getitstat().ObjFun[-1])

    def test_backtrack(self):
        opt = pgm.ConvBPDN.options(max_iter=200, backtrack="standard",
                                   L=1.0)
        b = pgm.ConvBPDN(self.D, self.S, lmbda=1e-2, opt=opt,
                         dtype=jnp.float64)
        b.solve()
        assert b.getitstat().L[-1] > 1.0


class TestPGMCMOD:

    def setup_method(self):
        rng = np.random.default_rng(12345)
        N, M, K = 16, 8, 32
        D0 = rng.standard_normal((N, M))
        D0 /= np.linalg.norm(D0, axis=0)
        Z = np.zeros((M, K))
        for k in range(K):
            Z[rng.choice(M, 3, replace=False), k] = rng.standard_normal(3)
        self.D0, self.Z, self.S = D0, Z, D0 @ Z

    def test_dict_recovery(self):
        opt = pgm.CnstrMOD.options(max_iter=500, rel_stop_tol=1e-10,
                                   L=500.0)
        b = pgm.CnstrMOD(self.Z, self.S, opt=opt, dtype=jnp.float64)
        D = np.asarray(b.solve())
        # columns unit norm
        assert np.allclose(np.linalg.norm(D, axis=0), 1.0, atol=1e-8)
        # fidelity near zero at the true dictionary's value
        assert np.linalg.norm(D @ self.Z - self.S) < 1e-2

    def test_zero_mean(self):
        opt = pgm.CnstrMOD.options(max_iter=50, L=50.0)
        b = pgm.CnstrMOD(self.Z, self.S, opt=opt, zero_mean=True,
                         dtype=jnp.float64)
        D = np.asarray(b.solve())
        assert np.allclose(D.mean(axis=0), 0.0, atol=1e-10)


class TestPGMCCMOD:

    def setup_method(self):
        rng = np.random.default_rng(12345)
        N, Nd, M, K = 16, 5, 8, 4
        D0 = rng.standard_normal((Nd, Nd, M))
        X = np.zeros((N, N, 1, K, M))
        flat = X.reshape(-1)
        idx = rng.choice(flat.size, 60, replace=False)
        flat[idx] = rng.standard_normal(60)
        Df = np.fft.rfftn(D0, s=(N, N), axes=(0, 1)).reshape(
            N, N // 2 + 1, 1, 1, M)
        Xf = np.fft.rfftn(X, axes=(0, 1))
        S = np.fft.irfftn(np.sum(Df * Xf, axis=-1), s=(N, N),
                          axes=(0, 1))[:, :, 0]   # (N,N,K)
        self.D0, self.X, self.S = D0, X, S
        self.dsz = (Nd, Nd, M)

    def test_dict_update(self):
        opt = pgm.ConvCnstrMOD.options(max_iter=400, rel_stop_tol=1e-9)
        b = pgm.ConvCnstrMOD(self.X, self.S, self.dsz, opt=opt,
                             dtype=jnp.float64)
        D = np.asarray(b.solve())
        its = b.getitstat()
        # unit-norm constraint satisfied, fidelity low
        Du = np.asarray(b.getdict())
        nrm = np.sqrt((Du ** 2).sum(axis=(0, 1)))
        assert np.allclose(nrm, 1.0, atol=1e-8)
        D0n = self.D0 / np.sqrt((self.D0 ** 2).sum(axis=(0, 1),
                                                   keepdims=True))
        assert its.DFid[-1] < its.DFid[0]

    def test_masked(self):
        rng = np.random.default_rng(0)
        W = (rng.random(self.S.shape) > 0.2).astype(np.float64)
        opt = pgm.ConvCnstrMODMask.options(max_iter=50)
        b = pgm.ConvCnstrMODMask(self.X, self.S, self.dsz, W=W, opt=opt,
                                 dtype=jnp.float64)
        b.solve()
        assert np.isfinite(b.getitstat().DFid[-1])


class TestGoldenReference:
    """Golden values from the reference (tests/pgm/test_bpdn.py:145-168):
    PGM BPDN with robust backtracking on the same seeded problem as the
    ADMM golden test."""

    def test_pgm_backtrack_robust_golden(self):
        np.random.seed(12345)
        N, M, L = 64, 128, 4
        D = np.random.randn(N, M)
        x0 = np.zeros((M, 1))
        si = np.random.permutation(list(range(0, M - 1)))
        x0[si[0:L]] = np.random.randn(L, 1)
        s0 = D.dot(x0)
        opt = pgm.BPDN.options(max_iter=1000, rel_stop_tol=5e-8,
                               backtrack="robust", bt_gamma_d=0.95)
        b = pgm.BPDN(D, s0, lmbda=5e-3, opt=opt, dtype=jnp.float64)
        b.solve()
        its = b.getitstat()
        x1 = np.asarray(b.getmin())
        assert abs(its.ObjFun[-1] - 0.012009) < 1e-5
        assert abs(its.DFid[-1] - 1.9636082e-06) < 1e-5
        assert abs(its.RegL1[-1] - 2.401446) < 2e-4
        assert np.linalg.norm(x1 - x0) < 1e-3

import numpy as np
import jax.numpy as jnp

from sporco_tpu.models import bpdn
from sporco_tpu.ops.linalg import rrs


class TestBPDN:

    def setup_method(self):
        self.rng = np.random.default_rng(12345)

    def test_recovery(self):
        # ground-truth recovery at tight tolerance (mirrors the
        # reference test strategy, tests/admm/test_bpdn.py)
        N, M = 64, 128
        D = self.rng.standard_normal((N, M))
        x0 = np.zeros((M, 1))
        si = self.rng.choice(M, 8, replace=False)
        x0[si, 0] = self.rng.standard_normal(8)
        S = D @ x0
        opt = bpdn.BPDN.options(max_iter=500, rel_stop_tol=1e-9)
        b = bpdn.BPDN(D, S, lmbda=1e-4, opt=opt, dtype=jnp.float64)
        X = b.solve()
        assert float(rrs(jnp.array(x0), X)) < 5e-5

    def test_early_stop(self):
        N, M = 32, 64
        D = self.rng.standard_normal((N, M))
        S = self.rng.standard_normal((N, 1))
        opt = bpdn.BPDN.options(max_iter=500, rel_stop_tol=1e-3)
        b = bpdn.BPDN(D, S, lmbda=0.1, opt=opt, dtype=jnp.float64)
        b.solve()
        its = b.getitstat()
        assert len(its) < 500
        assert its.PrimalRsdl[-1] <= its.EPrimal[-1]
        assert its.DualRsdl[-1] <= its.EDual[-1]

    def test_objective_decrease_and_stats(self):
        N, M = 32, 64
        D = self.rng.standard_normal((N, M))
        S = self.rng.standard_normal((N, 1))
        opt = bpdn.BPDN.options(max_iter=100, rel_stop_tol=0.0)
        b = bpdn.BPDN(D, S, lmbda=0.1, opt=opt, dtype=jnp.float64)
        b.solve()
        its = b.getitstat()
        assert len(its) == 100
        assert its.ObjFun[-1] <= its.ObjFun[0]
        assert np.all(np.isfinite(its.ObjFun))
        assert np.allclose(its.ObjFun, its.DFid + 0.1 * its.RegL1,
                           rtol=1e-5)

    def test_reentrant_solve(self):
        N, M = 32, 64
        D = self.rng.standard_normal((N, M))
        S = self.rng.standard_normal((N, 1))
        opt = bpdn.BPDN.options(max_iter=20, rel_stop_tol=0.0)
        b = bpdn.BPDN(D, S, lmbda=0.1, opt=opt, dtype=jnp.float64)
        b.solve()
        assert int(b.state.k) == 20
        b.solve()
        assert int(b.state.k) == 40

    def test_checkpoint_roundtrip(self):
        N, M = 32, 64
        D = self.rng.standard_normal((N, M))
        S = self.rng.standard_normal((N, 1))
        opt = bpdn.BPDN.options(max_iter=15, rel_stop_tol=0.0)
        b1 = bpdn.BPDN(D, S, lmbda=0.1, opt=opt, dtype=jnp.float64)
        b1.solve()
        sd = b1.state_dict()
        b2 = bpdn.BPDN(D, S, lmbda=0.1, opt=opt, dtype=jnp.float64)
        b2.load_state(sd)
        b2.solve()
        b1.solve()
        assert np.allclose(np.asarray(b1.state.Y), np.asarray(b2.state.Y))

    def test_non_neg(self):
        N, M = 32, 64
        D = self.rng.standard_normal((N, M))
        S = self.rng.standard_normal((N, 1))
        opt = bpdn.BPDN.options(max_iter=50)
        b = bpdn.BPDN(D, S, lmbda=0.05, opt=opt, non_neg=True,
                      dtype=jnp.float64)
        X = b.solve()
        assert float(jnp.min(X)) >= 0.0

    def test_default_lmbda_and_rho(self):
        N, M = 16, 32
        D = self.rng.standard_normal((N, M))
        S = self.rng.standard_normal((N,))
        b = bpdn.BPDN(D, S, opt=bpdn.BPDN.options(max_iter=5))
        assert b.lmbda > 0
        b.solve()

    def test_joint(self):
        N, M, K = 32, 64, 4
        D = self.rng.standard_normal((N, M))
        x0 = np.zeros((M, K))
        si = self.rng.choice(M, 8, replace=False)
        x0[si] = self.rng.standard_normal((8, K))   # row-sparse
        S = D @ x0
        opt = bpdn.BPDNJoint.options(max_iter=300, rel_stop_tol=1e-8)
        b = bpdn.BPDNJoint(D, S, lmbda=1e-4, mu=1e-4, opt=opt,
                           dtype=jnp.float64)
        X = b.solve()
        assert float(rrs(jnp.array(x0), X)) < 1e-3

    def test_elastic_net(self):
        N, M = 32, 64
        D = self.rng.standard_normal((N, M))
        S = self.rng.standard_normal((N, 1))
        opt = bpdn.ElasticNet.options(max_iter=150, rel_stop_tol=1e-7)
        b = bpdn.ElasticNet(D, S, lmbda=0.1, mu=0.05, opt=opt,
                            dtype=jnp.float64)
        X = b.solve()
        its = b.getitstat()
        # verify optimality by objective comparison with perturbations
        def obj(x):
            return (0.5 * np.sum((D @ x - np.asarray(S)) ** 2)
                    + 0.1 * np.sum(np.abs(x)) + 0.025 * np.sum(x ** 2))
        xs = np.asarray(X)
        o0 = obj(xs)
        for _ in range(50):
            assert obj(xs + 1e-4 * self.rng.standard_normal(xs.shape)) \
                >= o0 - 1e-9

    def test_projl1(self):
        N, M = 32, 64
        D = self.rng.standard_normal((N, M))
        S = self.rng.standard_normal((N, 1))
        gamma = 1.5
        opt = bpdn.BPDNProjL1.options(max_iter=200, rel_stop_tol=1e-7)
        b = bpdn.BPDNProjL1(D, S, gamma, opt=opt, dtype=jnp.float64)
        X = b.solve()
        assert np.sum(np.abs(np.asarray(X))) <= gamma * (1 + 1e-5)

    def test_minl1inl2ball(self):
        # equivalence with BPDN at matched epsilon (the reference's
        # correctness test, tests/admm/test_bpdn.py:295-318)
        N, M, L = 64, 128, 8
        D = self.rng.standard_normal((N, M))
        x0 = np.zeros((M, 1))
        si = self.rng.choice(M - 1, L, replace=False)
        x0[si] = self.rng.standard_normal((L, 1))
        S = D @ x0
        lmbda = 5e-2
        from sporco_tpu.solvers.admm import AutoRhoOpts
        optb = bpdn.BPDN.options(max_iter=300, rel_stop_tol=1e-5,
                                 auto_rho=AutoRhoOpts(enabled=False))
        bp = bpdn.BPDN(D, S, lmbda=lmbda, opt=optb, dtype=jnp.float64)
        Xp = np.asarray(bp.solve())
        epsilon = np.linalg.norm(D @ Xp - S)
        optc = bpdn.MinL1InL2Ball.options(
            max_iter=300, rel_stop_tol=1e-5, rho=2e1,
            auto_rho=AutoRhoOpts(enabled=False))
        bc = bpdn.MinL1InL2Ball(D, S, epsilon, opt=optc,
                                dtype=jnp.float64)
        Xc = np.asarray(bc.solve())
        assert np.linalg.norm(Xp - Xc) / np.linalg.norm(Xp) < 1e-3
        assert abs(np.abs(Xp).sum() - np.abs(Xc).sum()) < 1e-3

    def test_fast_solve(self):
        N, M = 32, 64
        D = self.rng.standard_normal((N, M))
        S = self.rng.standard_normal((N, 1))
        opt = bpdn.BPDN.options(max_iter=30, fast_solve=True)
        b = bpdn.BPDN(D, S, lmbda=0.1, opt=opt, dtype=jnp.float64)
        b.solve()
        its = b.getitstat()
        assert np.all(np.isnan(its.ObjFun))      # objective skipped
        assert np.all(np.isfinite(its.PrimalRsdl))


class TestCheckpointHelpers:

    def test_save_load_file(self, tmp_path):
        rng = np.random.default_rng(0)
        D = rng.standard_normal((32, 64))
        S = rng.standard_normal((32, 1))
        opt = bpdn.BPDN.options(max_iter=15, rel_stop_tol=0.0)
        b1 = bpdn.BPDN(D, S, lmbda=0.1, opt=opt, dtype=jnp.float64)
        b1.solve()
        p = str(tmp_path / "ckpt.npz")
        b1.save_state(p)
        b2 = bpdn.BPDN(D, S, lmbda=0.1, opt=opt, dtype=jnp.float64)
        b2.load_state_file(p)
        b2.solve()
        b1.solve()
        assert np.allclose(np.asarray(b1.state.Y), np.asarray(b2.state.Y))

    def test_solve_chunked_callback(self):
        rng = np.random.default_rng(0)
        D = rng.standard_normal((32, 64))
        S = rng.standard_normal((32, 1))
        opt = bpdn.BPDN.options(max_iter=50, rel_stop_tol=0.0)
        b = bpdn.BPDN(D, S, lmbda=0.1, opt=opt, dtype=jnp.float64)
        seen = []
        b.solve_chunked(lambda m: seen.append(int(m.state.k)) or
                        len(seen) >= 3, chunk=5)
        assert seen == [5, 10, 15]

    def test_display(self, capsys):
        rng = np.random.default_rng(0)
        D = rng.standard_normal((16, 32))
        S = rng.standard_normal((16, 1))
        b = bpdn.BPDN(D, S, lmbda=0.1,
                      opt=bpdn.BPDN.options(max_iter=3),
                      dtype=jnp.float64)
        b.solve()
        b.display()
        out = capsys.readouterr().out
        assert "ObjFun" in out and "Rho" in out
        assert len(out.strip().splitlines()) == 5   # header + sep + 3


class TestGoldenReference:
    """Golden values from the reference's own suite
    (tests/admm/test_bpdn.py:130-149): seeded sparse-recovery problem
    with published ObjFun/DFid/RegL1 constants."""

    def _problem(self):
        np.random.seed(12345)
        N, M, L = 64, 128, 4
        D = np.random.randn(N, M)
        x0 = np.zeros((M, 1))
        si = np.random.permutation(list(range(0, M - 1)))
        x0[si[0:L]] = np.random.randn(L, 1)
        return D, x0, D.dot(x0)

    def test_admm_golden(self):
        D, x0, s0 = self._problem()
        opt = bpdn.BPDN.options(max_iter=500, rel_stop_tol=5e-4)
        b = bpdn.BPDN(D, s0, lmbda=5e-3, opt=opt, dtype=jnp.float64)
        b.solve()
        its = b.getitstat()
        x1 = np.asarray(b.getcoef())
        assert abs(its.ObjFun[-1] - 0.012009) < 1e-5
        assert abs(its.DFid[-1] - 1.9636082e-06) < 1e-5
        assert abs(its.RegL1[-1] - 2.401446) < 1e-4
        assert np.linalg.norm(x1 - x0) < 1e-3

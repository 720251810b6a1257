import numpy as np
import jax
import jax.numpy as jnp

from sporco_tpu.parallel import consensus, mesh as pmesh, gridsearch


def _csc_data(rng, N=16, Nd=5, M=8, K=8, C=1):
    D0 = rng.standard_normal((Nd, Nd, M))
    D0 /= np.sqrt((D0 ** 2).sum(axis=(0, 1), keepdims=True))
    Cx = C
    X = np.zeros((N, N, Cx, K, M))
    flat = X.reshape(-1)
    idx = rng.choice(flat.size, 10 * K, replace=False)
    flat[idx] = np.abs(rng.standard_normal(10 * K)) + 0.5
    Df = np.fft.rfftn(D0, s=(N, N), axes=(0, 1)).reshape(
        N, N // 2 + 1, 1, 1, M)
    Xf = np.fft.rfftn(X, axes=(0, 1))
    S = np.fft.irfftn(np.sum(Df * Xf, axis=-1), s=(N, N), axes=(0, 1))
    if C == 1:
        S = S[:, :, 0]     # (N, N, K)
    return D0, X, S


class TestConsensusCDL:

    def setup_method(self):
        self.rng = np.random.default_rng(12345)
        self.D0, self.X, self.S = _csc_data(self.rng)
        self.Dinit = self.rng.standard_normal((5, 5, 8))

    def test_single_device_learning(self):
        d = consensus.ConvBPDNDictLearn_Consensus(
            self.Dinit, self.S, lmbda=0.05, max_iter=30,
            dtype=jnp.float64)
        obj0 = d.step(1).evaluate()[0]
        d.step(29)
        obj1 = d.evaluate()[0]
        assert obj1 < obj0
        D = np.asarray(d.getdict())
        assert D.shape == (5, 5, 8)
        nrm = np.sqrt((D ** 2).sum(axis=(0, 1)))
        assert np.allclose(nrm, 1.0, atol=1e-7)

    def test_sharded_matches_single(self):
        # 8 virtual CPU devices: K=8 sharded across the mesh must give
        # the same trajectory as the single-device run
        d1 = consensus.ConvBPDNDictLearn_Consensus(
            self.Dinit, self.S, lmbda=0.05, max_iter=20,
            dtype=jnp.float64)
        D1 = np.asarray(d1.solve())
        m = pmesh.make_mesh()
        assert m.devices.size == 8
        d2 = consensus.ConvBPDNDictLearn_Consensus(
            self.Dinit, self.S, lmbda=0.05, max_iter=20, mesh=m,
            dtype=jnp.float64)
        D2 = np.asarray(d2.solve())
        assert np.allclose(D1, D2, atol=1e-8)

    def test_sharding_layout(self):
        m = pmesh.make_mesh()
        d = consensus.ConvBPDNDictLearn_Consensus(
            self.Dinit, self.S, lmbda=0.05, max_iter=2, mesh=m,
            dtype=jnp.float64)
        d.solve()
        ZY = d.state[0]
        # coefficient batch stays sharded over "data" after the solve
        assert len(ZY.sharding.device_set) == 8
        DY = d.state[4]
        assert DY.sharding.is_fully_replicated

    def test_matches_alternating_dictlearn_direction(self):
        # consensus and alternating CDL should both reduce the CSC
        # objective from the same start
        from sporco_tpu.models import dictlrn
        d = consensus.ConvBPDNDictLearn_Consensus(
            self.Dinit, self.S, lmbda=0.05, max_iter=50,
            dtype=jnp.float64)
        d.solve()
        obj_cns = d.evaluate()[0]
        a = dictlrn.ConvBPDNDictLearn(self.Dinit, self.S, lmbda=0.05,
                                      xmethod="admm", dmethod="cns",
                                      max_iter=50)
        a.solve()
        its = a.getitstat()
        # both in the same ballpark of objective decrease
        assert obj_cns < its["XObjFun"][0]

    def test_fused_xstep_matches_standard(self):
        a = consensus.ConvBPDNDictLearn_Consensus(
            self.Dinit, self.S, lmbda=0.05, max_iter=15, fused=False)
        b = consensus.ConvBPDNDictLearn_Consensus(
            self.Dinit, self.S, lmbda=0.05, max_iter=15, fused=True)
        assert not a.cfg.fused_x and b.cfg.fused_x
        Da, Db = np.asarray(a.solve()), np.asarray(b.solve())
        assert np.abs(Da - Db).max() < 1e-4 * np.abs(Da).max()
        oa, ob = a.evaluate(), b.evaluate()
        assert abs(oa[0] - ob[0]) < 1e-3 * abs(oa[0])

    def test_colour_fused_xstep_matches_standard(self):
        # colour dictionary (Cd=C=3): rank-C Woodbury CSC stage must
        # reproduce the solvemdbi_ism freq-domain stage
        rng = np.random.default_rng(3)
        S = rng.standard_normal((16, 16, 3, 4)).astype(np.float32)
        D0 = rng.standard_normal((5, 5, 3, 6)).astype(np.float32)
        a = consensus.ConvBPDNDictLearn_Consensus(
            D0, S, lmbda=0.05, max_iter=15, fused=False)
        b = consensus.ConvBPDNDictLearn_Consensus(
            D0, S, lmbda=0.05, max_iter=15, fused=True)
        assert not a.cfg.fused_x and b.cfg.fused_x
        Da, Db = np.asarray(a.solve()), np.asarray(b.solve())
        assert Da.shape == D0.shape
        assert np.abs(Da - Db).max() < 1e-4 * np.abs(Da).max()
        oa, ob = a.evaluate(), b.evaluate()
        assert abs(oa[0] - ob[0]) < 1e-3 * abs(oa[0])

    def test_colour_kernel_xstep_matches_standard(self):
        # colour + the one-pass Pallas kernel stage (interpret mode)
        from sporco_tpu.ops import pallas_csc_iter as pki
        rng = np.random.default_rng(4)
        S = rng.standard_normal((16, 16, 3, 4)).astype(np.float32)
        D0 = rng.standard_normal((5, 5, 3, 8)).astype(np.float32)
        a = consensus.ConvBPDNDictLearn_Consensus(
            D0, S, lmbda=0.05, max_iter=10, fused=False)
        Da = np.asarray(a.solve())
        prev = pki.interpret
        pki.interpret = True
        try:
            b = consensus.ConvBPDNDictLearn_Consensus(
                D0, S, lmbda=0.05, max_iter=10, fused=True)
            assert b.cfg.kernel_x
            Db = np.asarray(b.solve())
        finally:
            pki.interpret = prev
        assert np.abs(Da - Db).max() < 1e-4 * np.abs(Da).max()

    def test_masked_consensus(self):
        W = (self.rng.random(self.S.shape) > 0.2).astype(np.float64)
        d = consensus.ConvBPDNMaskDcplDictLearn_Consensus(
            self.Dinit, self.S, lmbda=0.05, W=W, max_iter=20,
            dtype=jnp.float64)
        D = np.asarray(d.solve())
        assert np.all(np.isfinite(D))
        nrm = np.sqrt((D ** 2).sum(axis=(0, 1)))
        assert np.allclose(nrm, 1.0, atol=1e-7)

    def test_masked_sharded(self):
        W = (self.rng.random(self.S.shape) > 0.2).astype(np.float64)
        m = pmesh.make_mesh()
        d1 = consensus.ConvBPDNMaskDcplDictLearn_Consensus(
            self.Dinit, self.S, lmbda=0.05, W=W, max_iter=10,
            dtype=jnp.float64)
        D1 = np.asarray(d1.solve())
        d2 = consensus.ConvBPDNMaskDcplDictLearn_Consensus(
            self.Dinit, self.S, lmbda=0.05, W=W, max_iter=10, mesh=m,
            dtype=jnp.float64)
        D2 = np.asarray(d2.solve())
        assert np.allclose(D1, D2, atol=1e-8)


class TestGridSearch:

    def test_serial(self):
        fn = lambda prm: (prm[0] - 0.1) ** 2 + (prm[1] + 0.3) ** 2
        grid = (np.linspace(-1, 1, 21), np.linspace(-1, 1, 21))
        sprm, sfvl, fvmx, sidx = gridsearch.grid_search(fn, grid)
        assert abs(sprm[0] - 0.1) < 0.06
        assert abs(sprm[1] + 0.3) < 0.06
        assert fvmx.shape == (21, 21)

    def test_vmap(self):
        fn = lambda a, b: (a - 0.1) ** 2 + (b + 0.3) ** 2
        grid = (np.linspace(-1, 1, 21), np.linspace(-1, 1, 21))
        sprm, sfvl, fvmx, sidx = gridsearch.grid_search(fn, grid,
                                                        mode="vmap")
        assert abs(sprm[0] - 0.1) < 0.06
        assert abs(sprm[1] + 0.3) < 0.06

    def test_fmax(self):
        fn = lambda prm: -((prm[0] - 0.5) ** 2)
        sprm, sfvl, _, _ = gridsearch.grid_search(
            fn, (np.linspace(0, 1, 11),), fmin=False)
        assert abs(sprm[0] - 0.5) < 0.06


class TestKernelCSCStage:

    def test_pallas_kernel_stage_matches_xla(self):
        """The one-pass Pallas CSC stage (cfg.kernel_x, packed
        coefficient state) must reproduce the XLA consensus loop."""
        import numpy as np
        from sporco_tpu.parallel import consensus
        from sporco_tpu.ops import pallas_csc_iter as pki
        rng = np.random.default_rng(0)
        N, Nd, M, K = 32, 5, 8, 4
        S = rng.standard_normal((N, N, K)).astype(np.float32)
        D0 = rng.standard_normal((Nd, Nd, M)).astype(np.float32)
        a = consensus.ConvBPDNDictLearn_Consensus(D0, S, lmbda=0.1,
                                                  max_iter=10,
                                                  dtype=np.float32)
        assert not a.cfg.kernel_x          # CPU: off unless interpret
        a.solve()
        Da = np.asarray(a.getdict())
        Za = np.asarray(a.getcoef())
        pki.interpret = True
        try:
            b = consensus.ConvBPDNDictLearn_Consensus(D0, S, lmbda=0.1,
                                                      max_iter=10,
                                                      dtype=np.float32)
            assert b.cfg.kernel_x
            b.solve()
            Db = np.asarray(b.getdict())
            Zb = np.asarray(b.getcoef())
        finally:
            pki.interpret = False
        assert np.abs(Da - Db).max() < 1e-3
        assert np.abs(Za - Zb).max() < 1e-3 * max(np.abs(Za).max(),
                                                  1e-6)
        assert abs(a.evaluate()[0] - b.evaluate()[0]) \
            < 1e-3 * abs(a.evaluate()[0])

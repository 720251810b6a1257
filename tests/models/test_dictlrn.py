import numpy as np
import jax.numpy as jnp

from sporco_tpu.models import dictlrn


def _csc_data(rng, N=16, Nd=5, M=8, K=8):
    D0 = rng.standard_normal((Nd, Nd, M))
    D0 /= np.sqrt((D0 ** 2).sum(axis=(0, 1), keepdims=True))
    X = np.zeros((N, N, 1, K, M))
    flat = X.reshape(-1)
    idx = rng.choice(flat.size, 10 * K, replace=False)
    flat[idx] = np.abs(rng.standard_normal(10 * K)) + 0.5
    Df = np.fft.rfftn(D0, s=(N, N), axes=(0, 1)).reshape(
        N, N // 2 + 1, 1, 1, M)
    Xf = np.fft.rfftn(X, axes=(0, 1))
    S = np.fft.irfftn(np.sum(Df * Xf, axis=-1), s=(N, N),
                      axes=(0, 1))[:, :, 0]    # (N, N, K)
    return D0, X, S


class TestBPDNDictLearn:

    def test_learning_reduces_fidelity(self):
        rng = np.random.default_rng(12345)
        N, M, K = 16, 24, 64
        D0 = rng.standard_normal((N, M))
        S = rng.standard_normal((N, K))
        d = dictlrn.BPDNDictLearn(D0, S, lmbda=0.1, max_iter=30)
        D = np.asarray(d.solve())
        assert np.allclose(np.linalg.norm(D, axis=0), 1.0, atol=1e-8)
        its = d.getitstat()
        assert its["XDFid"][-1] < its["XDFid"][0]

    def test_weighted(self):
        rng = np.random.default_rng(12345)
        N, M, K = 16, 24, 32
        D0 = rng.standard_normal((N, M))
        S = rng.standard_normal((N, K))
        d = dictlrn.WeightedBPDNDictLearn(D0, S, lmbda=0.1, max_iter=10)
        D = np.asarray(d.solve())
        assert np.all(np.isfinite(D))


class TestConvBPDNDictLearn:

    def setup_method(self):
        self.rng = np.random.default_rng(12345)
        self.D0, self.X, self.S = _csc_data(self.rng)
        # random (bad) initial dictionary
        self.Dinit = self.rng.standard_normal((5, 5, 8))

    def _learn(self, xmethod, dmethod, n=20):
        d = dictlrn.ConvBPDNDictLearn(self.Dinit, self.S, lmbda=0.05,
                                      xmethod=xmethod, dmethod=dmethod,
                                      max_iter=n)
        d.solve()
        return d

    def test_admm_cns(self):
        d = self._learn("admm", "cns")
        its = d.getitstat()
        # learning reduces the CSC objective
        assert its["XObjFun"][-1] < its["XObjFun"][0]
        D = np.asarray(d.getdict())
        assert D.shape == (5, 5, 8)
        nrm = np.sqrt((D ** 2).sum(axis=(0, 1)))
        assert np.allclose(nrm, 1.0, atol=1e-7)

    def test_admm_ism(self):
        d = self._learn("admm", "ism", n=10)
        assert np.isfinite(d.getitstat()["XObjFun"][-1])

    def test_admm_cg(self):
        d = self._learn("admm", "cg", n=10)
        assert np.isfinite(d.getitstat()["XObjFun"][-1])

    def test_pgm_pgm(self):
        d = self._learn("pgm", "pgm", n=10)
        assert np.isfinite(d.getitstat()["XObjFun"][-1])

    def test_admm_pgm(self):
        d = self._learn("admm", "pgm", n=10)
        assert np.isfinite(d.getitstat()["XObjFun"][-1])

    def test_masked(self):
        W = (self.rng.random(self.S.shape) > 0.2).astype(np.float64)
        d = dictlrn.ConvBPDNMaskDictLearn(self.Dinit, self.S,
                                          lmbda=0.05, W=W,
                                          xmethod="admm", dmethod="cns",
                                          max_iter=10)
        d.solve()
        D = np.asarray(d.getdict())
        assert np.all(np.isfinite(D))

    def test_masked_pgm(self):
        W = (self.rng.random(self.S.shape) > 0.2).astype(np.float64)
        d = dictlrn.ConvBPDNMaskDictLearn(self.Dinit, self.S,
                                          lmbda=0.05, W=W,
                                          xmethod="pgm", dmethod="pgm",
                                          max_iter=10)
        d.solve()
        assert np.all(np.isfinite(np.asarray(d.getdict())))


class TestOnlineCDL:

    def test_online_learning(self):
        rng = np.random.default_rng(12345)
        D0, X, S = _csc_data(rng, K=8)
        Dinit = rng.standard_normal((5, 5, 8))
        d = dictlrn.OnlineConvBPDNDictLearn(Dinit, lmbda=0.05,
                                            dtype=jnp.float64)
        for k in range(8):
            D = d.solve(S[..., k])
        assert D.shape == (5, 5, 8)
        nrm = np.sqrt((np.asarray(D) ** 2).sum(axis=(0, 1)))
        assert np.allclose(nrm, 1.0, atol=1e-7)
        its = d.getitstat()
        assert len(its["Eta"]) == 8
        assert its["Eta"][-1] < its["Eta"][0]   # step decay

    def test_online_masked(self):
        rng = np.random.default_rng(12345)
        D0, X, S = _csc_data(rng, K=4)
        W = (rng.random(S.shape[:2]) > 0.2).astype(np.float64)
        Dinit = rng.standard_normal((5, 5, 8))
        d = dictlrn.OnlineConvBPDNMaskDictLearn(Dinit, lmbda=0.05,
                                                dtype=jnp.float64)
        for k in range(4):
            D = d.solve(S[..., k], W=W)
        assert np.all(np.isfinite(np.asarray(D)))

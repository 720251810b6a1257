import numpy as np
import jax.numpy as jnp

from sporco_tpu.models import ccmodmd


def _data(rng, N=16, Nd=5, M=8, K=4):
    D0 = rng.standard_normal((Nd, Nd, M))
    D0 /= np.sqrt((D0 ** 2).sum(axis=(0, 1), keepdims=True))
    X = np.zeros((N, N, 1, K, M))
    flat = X.reshape(-1)
    idx = rng.choice(flat.size, 20 * K, replace=False)
    flat[idx] = rng.standard_normal(20 * K)
    Df = np.fft.rfftn(D0, s=(N, N), axes=(0, 1)).reshape(
        N, N // 2 + 1, 1, 1, M)
    Xf = np.fft.rfftn(X, axes=(0, 1))
    S = np.fft.irfftn(np.sum(Df * Xf, axis=-1), s=(N, N),
                      axes=(0, 1))[:, :, 0]
    return D0, X, S


class TestCCMODMD:

    def setup_method(self):
        self.rng = np.random.default_rng(12345)
        self.D0, self.X, self.S = _data(self.rng)
        self.W = (self.rng.random((16, 16)) > 0.2).astype(np.float64)
        self.dsz = (5, 5, 8)

    def _fit(self, method, W=None, n=200, **kw):
        opt = ccmodmd.ConvCnstrMODMaskDcplOptions(
            method=method, max_iter=n, rel_stop_tol=1e-7)
        b = ccmodmd.ConvCnstrMODMaskDcpl(self.X, self.S,
                                         self.W if W is None else W,
                                         self.dsz, opt=opt,
                                         method=method,
                                         dtype=jnp.float64, **kw)
        b.solve()
        return b

    def test_full_mask_recovers(self):
        # with W == 1 the masked solvers recover the true dictionary
        for m in ("ism", "cg", "cns"):
            b = self._fit(m, W=np.ones((16, 16)))
            D = np.asarray(b.getdict())
            err = np.linalg.norm(D - self.D0) / np.linalg.norm(self.D0)
            assert err < 5e-2, (m, err)

    def test_masked_runs_all_methods(self):
        for m in ("ism", "cg", "cns"):
            b = self._fit(m, n=50)
            its = b.getitstat()
            assert np.all(np.isfinite(its.DFid)), m
            assert its.DFid[-1] < its.DFid[0], m

    def test_unit_norm(self):
        b = self._fit("cns", n=50)
        D = np.asarray(b.getdict())
        nrm = np.sqrt((D ** 2).sum(axis=(0, 1)))
        assert np.allclose(nrm, 1.0, atol=1e-8)

    def test_methods_agree(self):
        Ds = {m: np.asarray(self._fit(m, n=300).getdict())
              for m in ("ism", "cg")}
        assert np.linalg.norm(Ds["ism"] - Ds["cg"]) \
            / np.linalg.norm(Ds["ism"]) < 1e-2


class TestShapeMatrix:
    """Smoke the masked-CCMOD solvers over the reference's full
    (K, C, mask-shape) combination matrix
    (tests/admm/test_ccmodmd.py:15-196 in the reference)."""

    def setup_method(self):
        self.rng = np.random.default_rng(12345)

    def _run(self, Xshape, Sshape, Wshape, method="ism", M=4, n=5,
             dsz=None, **ctor_kw):
        X = self.rng.standard_normal(Xshape)
        S = self.rng.standard_normal(Sshape)
        W = np.abs(self.rng.standard_normal(Wshape))
        opt = ccmodmd.ConvCnstrMODMaskDcplOptions(
            method=method, max_iter=n, rel_stop_tol=0.0)
        b = ccmodmd.ConvCnstrMODMaskDcpl(X, S, W,
                                         dsz or (4, 4, M), opt=opt,
                                         method=method, **ctor_kw)
        b.solve()
        D = np.asarray(b.getdict())
        assert np.all(np.isfinite(D))
        assert D.shape[-1] == M
        return b

    def test_single_signal_scalar_mask(self):
        N, M = 8, 4
        self._run((N, N, 1, 1, M), (N, N), (1,))

    def test_single_signal_spatial_mask(self):
        N, M = 8, 4
        self._run((N, N, 1, 1, M), (N, N), (N, N))

    def test_multi_signal_spatial_mask(self):
        N, M, K = 8, 4, 3
        self._run((N, N, 1, K, M), (N, N, K), (N, N))

    def test_multi_signal_per_signal_mask(self):
        N, M, K = 8, 4, 3
        self._run((N, N, 1, K, M), (N, N, K), (N, N, K))

    def test_multi_channel_per_channel_mask(self):
        # single-channel dict, multi-channel signal: C folds onto K
        # (reference tests/admm/test_ccmodmd.py:93-108 passes dimK=0 and
        # an explicit-channel dsz)
        N, M, C = 8, 4, 3
        self._run((N, N, C, 1, M), (N, N, C), (N, N, C),
                  dsz=(4, 4, 1, M), dimK=0)

    def test_multi_channel_multi_signal_full_mask(self):
        N, M, C, K = 8, 4, 3, 2
        self._run((N, N, C, K, M), (N, N, C, K), (N, N, C, K))

    def test_multi_channel_multi_signal_channel_mask(self):
        N, M, C, K = 8, 4, 3, 2
        self._run((N, N, C, K, M), (N, N, C, K), (N, N, C))

    def test_multi_channel_multi_signal_signal_mask(self):
        N, M, C, K = 8, 4, 3, 2
        self._run((N, N, C, K, M), (N, N, C, K), (N, N, 1, K))

    def test_all_methods_multi_signal(self):
        N, M, K = 8, 4, 3
        for m in ("ism", "cg", "cns"):
            self._run((N, N, 1, K, M), (N, N, K), (N, N, K), method=m)

import numpy as np
import jax.numpy as jnp

from sporco_tpu.models import cmod, ccmod
from sporco_tpu.solvers.admm import AutoRhoOpts


class TestCMOD:

    def setup_method(self):
        rng = np.random.default_rng(12345)
        N, M, K = 16, 8, 64
        D0 = rng.standard_normal((N, M))
        D0 /= np.linalg.norm(D0, axis=0)
        Z = np.zeros((M, K))
        for k in range(K):
            Z[rng.choice(M, 3, replace=False), k] = rng.standard_normal(3)
        self.D0, self.Z, self.S = D0, Z, D0 @ Z

    def test_dict_recovery(self):
        opt = cmod.CnstrMOD.options(max_iter=300, rel_stop_tol=1e-9)
        b = cmod.CnstrMOD(self.Z, self.S, opt=opt, dtype=jnp.float64)
        D = np.asarray(b.solve())
        assert np.allclose(np.linalg.norm(D, axis=0), 1.0, atol=1e-8)
        assert np.linalg.norm(D @ self.Z - self.S) < 1e-4

    def test_zero_mean(self):
        opt = cmod.CnstrMOD.options(max_iter=50)
        b = cmod.CnstrMOD(self.Z, self.S, opt=opt, zero_mean=True,
                          dtype=jnp.float64)
        D = np.asarray(b.solve())
        assert np.allclose(D.mean(axis=0), 0.0, atol=1e-10)

    def test_setcoef(self):
        opt = cmod.CnstrMOD.options(max_iter=10)
        b = cmod.CnstrMOD(self.Z, self.S, opt=opt, dtype=jnp.float64)
        b.solve()
        b.setcoef(self.Z * 2)
        b.solve()


def _ccmod_data(rng, N=16, Nd=5, M=8, K=4, C=1, multi_chan_dict=False):
    # D0 must satisfy the unit-norm constraint or the fixed-Z update
    # cannot reach zero fidelity
    if multi_chan_dict:
        D0 = rng.standard_normal((Nd, Nd, C, M))
        D0 /= np.sqrt((D0 ** 2).sum(axis=(0, 1, 2), keepdims=True))
    else:
        D0 = rng.standard_normal((Nd, Nd, M))
        D0 /= np.sqrt((D0 ** 2).sum(axis=(0, 1), keepdims=True))
    Cx = 1 if multi_chan_dict else C
    X = np.zeros((N, N, Cx, K, M))
    flat = X.reshape(-1)
    idx = rng.choice(flat.size, 20 * K, replace=False)
    flat[idx] = rng.standard_normal(20 * K)
    Dr = D0.reshape((Nd, Nd) + (1,) * (3 - (D0.ndim - 2)) + D0.shape[2:])
    Df = np.fft.rfftn(D0, s=(N, N), axes=(0, 1))
    if multi_chan_dict:
        Df = Df.reshape(N, N // 2 + 1, C, 1, M)
    else:
        Df = Df.reshape(N, N // 2 + 1, 1, 1, M)
    Xf = np.fft.rfftn(X, axes=(0, 1))
    S = np.fft.irfftn(np.sum(Df * Xf, axis=-1), s=(N, N), axes=(0, 1))
    if Cx == 1 and not multi_chan_dict and C == 1:
        S = S[:, :, 0]      # (N,N,K)
    return D0, X, S


class TestCCMOD:

    def setup_method(self):
        self.rng = np.random.default_rng(12345)
        self.D0, self.X, self.S = _ccmod_data(self.rng)
        self.dsz = (5, 5, 8)

    def _fit(self, method, **kw):
        opt = ccmod.ConvCnstrMODBase.options(max_iter=200,
                                             rel_stop_tol=1e-7)
        b = ccmod.ConvCnstrMOD(self.X, self.S, self.dsz, opt=opt,
                               method=method, dtype=jnp.float64, **kw)
        b.solve()
        return b

    def test_ism(self):
        b = self._fit("ism", lin_check=True)
        its = b.getitstat()
        assert np.nanmax(its.XSlvRelRes) < 1e-5
        assert its.DFid[-1] < 1e-3

    def test_cg(self):
        b = self._fit("cg", cg_tol=1e-9)
        assert b.getitstat().DFid[-1] < 1e-3

    def test_cns(self):
        b = self._fit("cns")
        assert b.getitstat().DFid[-1] < 1e-2

    def test_methods_agree(self):
        Ds = {}
        for m in ("ism", "cg", "cns"):
            Ds[m] = np.asarray(self._fit(m).getdict())
        assert np.linalg.norm(Ds["ism"] - Ds["cg"]) \
            / np.linalg.norm(Ds["ism"]) < 5e-3
        # consensus converges along a different trajectory; it agrees
        # more loosely at equal iteration counts
        assert np.linalg.norm(Ds["ism"] - Ds["cns"]) \
            / np.linalg.norm(Ds["ism"]) < 1e-1

    def test_unit_norm(self):
        b = self._fit("cns")
        D = np.asarray(b.getdict())
        nrm = np.sqrt((D ** 2).sum(axis=(0, 1)))
        assert np.allclose(nrm, 1.0, atol=1e-8)

    def test_multichannel_signal(self):
        # single-channel dict + 3-channel signals folds C onto K
        D0, X, S = _ccmod_data(self.rng, C=3)
        opt = ccmod.ConvCnstrMODBase.options(max_iter=50)
        b = ccmod.ConvCnstrMOD(X, S, self.dsz, opt=opt, method="cns",
                               dtype=jnp.float64)
        b.solve()
        assert np.isfinite(b.getitstat().DFid[-1])

    def test_multichannel_dict(self):
        D0, X, S = _ccmod_data(self.rng, C=3, multi_chan_dict=True)
        opt = ccmod.ConvCnstrMODBase.options(max_iter=50)
        b = ccmod.ConvCnstrMOD(X, S, (5, 5, 3, 8), opt=opt,
                               method="cns", dtype=jnp.float64)
        b.solve()
        D = b.getdict()
        assert D.shape == (5, 5, 3, 8)
        assert np.isfinite(b.getitstat().DFid[-1])


class TestComplexCCMOD:

    def test_complex_dict_update(self):
        rng = np.random.default_rng(12345)
        N, Nd, M, K = 16, 5, 8, 4
        D0 = rng.standard_normal((Nd, Nd, M)) \
            + 1j * rng.standard_normal((Nd, Nd, M))
        D0 /= np.sqrt((np.abs(D0) ** 2).sum(axis=(0, 1), keepdims=True))
        X = np.zeros((N, N, 1, K, M), complex)
        flat = X.reshape(-1)
        idx = rng.choice(flat.size, 60, replace=False)
        flat[idx] = rng.standard_normal(60) + 1j * rng.standard_normal(60)
        Df = np.fft.fftn(D0, s=(N, N), axes=(0, 1)).reshape(
            N, N, 1, 1, M)
        Xf = np.fft.fftn(X, axes=(0, 1))
        S = np.fft.ifftn(np.sum(Df * Xf, axis=-1), axes=(0, 1))[:, :, 0]
        opt = ccmod.ConvCnstrMODBase.options(max_iter=100,
                                             rel_stop_tol=1e-7)
        b = ccmod.ConvCnstrMOD(X, S, (5, 5, 8), opt=opt, method="cns",
                               dtype=jnp.float64)
        b.solve()
        its = b.getitstat()
        assert np.all(np.isfinite(its.DFid))
        assert its.DFid[-1] < 1e-2
        D = b.getdict()
        assert jnp.iscomplexobj(D)

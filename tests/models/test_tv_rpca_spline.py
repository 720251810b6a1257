"""TV / RPCA / spline tests: parity values below were produced by
running the reference implementation on identical inputs (same rng
seed/order); inputs are regenerated here deterministically."""

import numpy as np
import jax.numpy as jnp

from sporco_tpu.models import tv, rpca, spline


def _data():
    rng = np.random.default_rng(12345)
    N = 32
    img = np.zeros((N, N)); img[8:24, 8:24] = 1.0; img[12:20, 12:20] = 2.0
    S = img + 0.1 * rng.standard_normal((N, N))
    krn = np.ones((5, 5)) / 25.0
    Sb = np.fft.irfftn(np.fft.rfftn(krn, s=(N, N)) * np.fft.rfftn(img),
                       s=(N, N)) + 0.02 * rng.standard_normal((N, N))
    U0 = rng.standard_normal((32, 4)); V0 = rng.standard_normal((4, 32))
    L0 = U0 @ V0
    Ysp = (rng.random((32, 32)) > 0.9) * rng.standard_normal((32, 32)) * 5
    Srp = L0 + Ysp
    Ssp = img + (rng.random((N, N)) > 0.9) * rng.standard_normal((N, N)) * 3
    return img, S, krn, Sb, L0, Srp, Ssp


IMG, S_DEN, KRN, S_BLR, L0, S_RPCA, S_SPL = _data()


class TestTVL2:

    def test_denoise_parity(self):
        opt = tv.TVL2Denoise.options(max_iter=100, rel_stop_tol=1e-6)
        b = tv.TVL2Denoise(S_DEN, 0.05, opt=opt, dtype=jnp.float64)
        X = b.solve()
        its = b.getitstat()
        assert abs(its.ObjFun[-1] - 8.9104102) < 1e-4
        assert abs(float(jnp.linalg.norm(X)) - 21.0771673) < 1e-4

    def test_denoise_denoises(self):
        opt = tv.TVL2Denoise.options(max_iter=100)
        b = tv.TVL2Denoise(S_DEN, 0.05, opt=opt, dtype=jnp.float64)
        X = np.asarray(b.solve())
        assert np.linalg.norm(X - IMG) < np.linalg.norm(S_DEN - IMG)

    def test_denoise_vector_tv(self):
        # 3-channel image, joint (vector) TV over channels
        S3 = np.stack([S_DEN] * 3, axis=-1)
        opt = tv.TVL2Denoise.options(max_iter=30)
        b = tv.TVL2Denoise(S3, 0.05, opt=opt, caxis=2, dtype=jnp.float64)
        X = b.solve()
        assert X.shape == S3.shape

    def test_deconv_parity(self):
        opt = tv.TVL2Deconv.options(max_iter=100, rel_stop_tol=1e-6)
        b = tv.TVL2Deconv(KRN, S_BLR, 0.01, opt=opt, dtype=jnp.float64)
        X = b.solve()
        its = b.getitstat()
        assert abs(its.ObjFun[-1] - 1.1293466) < 1e-4
        assert abs(float(jnp.linalg.norm(X)) - 20.9518151) < 1e-4

    def test_deconv_1d(self):
        s = np.cumsum(np.random.default_rng(0).standard_normal(64))
        k = np.ones(3) / 3.0
        opt = tv.TVL2Deconv.options(max_iter=20)
        b = tv.TVL2Deconv(k, s, 0.1, opt=opt, axes=(0,),
                          dtype=jnp.float64)
        X = b.solve()
        assert X.shape == s.shape


class TestTVL1:

    def test_denoise_parity(self):
        opt = tv.TVL1Denoise.options(max_iter=100, rel_stop_tol=1e-6)
        b = tv.TVL1Denoise(S_DEN, 0.5, opt=opt, dtype=jnp.float64)
        X = b.solve()
        its = b.getitstat()
        assert abs(its.ObjFun[-1] - 115.1129254) < 1e-3
        assert abs(float(jnp.linalg.norm(X)) - 21.2329800) < 1e-4

    def test_salt_pepper(self):
        rng = np.random.default_rng(3)
        Ssp = IMG.copy()
        m = rng.random(IMG.shape)
        Ssp[m < 0.05] = 0.0
        Ssp[m > 0.95] = 3.0
        opt = tv.TVL1Denoise.options(max_iter=100)
        b = tv.TVL1Denoise(Ssp, 0.8, opt=opt, dtype=jnp.float64)
        X = np.asarray(b.solve())
        assert np.linalg.norm(X - IMG) < 0.5 * np.linalg.norm(Ssp - IMG)

    def test_deconv_parity(self):
        opt = tv.TVL1Deconv.options(max_iter=100, rel_stop_tol=1e-6)
        b = tv.TVL1Deconv(KRN, S_BLR, 0.1, opt=opt, dtype=jnp.float64)
        X = b.solve()
        its = b.getitstat()
        assert abs(its.ObjFun[-1] - 19.0153728) < 1e-3
        assert abs(float(jnp.linalg.norm(X)) - 21.0175955) < 1e-4


class TestRPCA:

    def test_parity_and_recovery(self):
        opt = rpca.RobustPCA.options(max_iter=200, rel_stop_tol=1e-7)
        b = rpca.RobustPCA(S_RPCA, opt=opt, dtype=jnp.float64)
        X, Y = b.solve()
        its = b.getitstat()
        assert abs(its.ObjFun[-1] - 194.4964274) < 1e-3
        # low-rank component recovered to high accuracy
        err = np.linalg.norm(np.asarray(X) - L0) / np.linalg.norm(L0)
        assert err < 1e-5

    def test_randomized_svd_parity(self):
        # rank-bounded randomized nuclear prox reproduces the exact-SVD
        # trajectory when the target rank is captured (SURVEY §7.4)
        opt = rpca.RobustPCA.options(max_iter=120, rel_stop_tol=0.0)
        a = rpca.RobustPCA(S_RPCA, opt=opt, dtype=jnp.float64)
        a.solve()
        b = rpca.RobustPCA(S_RPCA, opt=opt, dtype=jnp.float64,
                           svd_rank=16)
        Xr, Yr = b.solve()
        ia, ib = a.getitstat(), b.getitstat()
        assert abs(ia.ObjFun[-1] - ib.ObjFun[-1]) / ia.ObjFun[-1] < 1e-4
        err = np.linalg.norm(np.asarray(Xr) - L0) / np.linalg.norm(L0)
        assert err < 1e-4

    def test_sparse_support(self):
        opt = rpca.RobustPCA.options(max_iter=100)
        b = rpca.RobustPCA(S_RPCA, opt=opt, dtype=jnp.float64)
        X, Y = b.solve()
        # sparse part is sparse
        assert np.mean(np.abs(np.asarray(Y)) > 1e-6) < 0.25


class TestSpline:

    def test_parity(self):
        opt = spline.SplineL1.options(max_iter=100, rel_stop_tol=1e-6)
        b = spline.SplineL1(S_SPL, 5.0, opt=opt, dtype=jnp.float64,
                            lin_check=True)
        X = b.solve()
        its = b.getitstat()
        assert abs(its.ObjFun[-1] - 348.2321629) < 1e-3
        assert abs(float(jnp.linalg.norm(X)) - 19.9749177) < 1e-4
        assert np.nanmax(its.XSlvRelRes) < 1e-10   # exact DCT solve

    def test_outlier_robustness(self):
        opt = spline.SplineL1.options(max_iter=100)
        b = spline.SplineL1(S_SPL, 5.0, opt=opt, dtype=jnp.float64)
        X = np.asarray(b.solve())
        assert np.linalg.norm(X - IMG) < 0.5 * np.linalg.norm(S_SPL - IMG)


class TestComplexTV:
    """Complex-valued input support (CHANGES.rst v0.2.1 capability)."""

    def test_tvl2_denoise_complex(self):
        rng = np.random.default_rng(0)
        S = (IMG + 0.05 * rng.standard_normal(IMG.shape)) \
            + 1j * (np.roll(IMG, 3, 0) + 0.05 * rng.standard_normal(IMG.shape))
        b = tv.TVL2Denoise(S, 0.05, opt=tv.TVL2Denoise.options(max_iter=50),
                           dtype=jnp.float64)
        X = b.solve()
        assert jnp.iscomplexobj(X)
        assert np.all(np.isfinite(b.getitstat().ObjFun))
        # denoises both components
        assert np.linalg.norm(np.asarray(X).real - IMG) \
            < np.linalg.norm(np.asarray(S).real - IMG)

    def test_tvl2_deconv_complex(self):
        rng = np.random.default_rng(0)
        Sb = np.asarray(S_BLR) + 1j * np.roll(np.asarray(S_BLR), 2, 0)
        b = tv.TVL2Deconv(KRN, Sb, 0.01,
                          opt=tv.TVL2Deconv.options(max_iter=50),
                          dtype=jnp.float64)
        X = b.solve()
        assert jnp.iscomplexobj(X)
        assert np.all(np.isfinite(b.getitstat().ObjFun))

    def test_tvl1_deconv_complex(self):
        Sb = np.asarray(S_BLR) + 1j * np.roll(np.asarray(S_BLR), 2, 0)
        b = tv.TVL1Deconv(KRN, Sb, 0.1,
                          opt=tv.TVL1Deconv.options(max_iter=30),
                          dtype=jnp.float64)
        X = b.solve()
        assert jnp.iscomplexobj(X)
        assert np.all(np.isfinite(b.getitstat().ObjFun))


class TestTVGoldenReference:
    """Golden objective values published in the reference's own test
    suite (tests/admm/test_tvl2.py:125-230, test_tvl1.py:150-260),
    reproduced on identical seeded data.  Tolerances are loosened from
    the reference's 1e-6 to absorb the X-vs-Y objective-evaluation
    convention difference at convergence."""

    def _tvl2_2d(self):
        np.random.seed(12345)
        N = 64
        U = np.ones((N, N)); U[:, :N // 2] = -1
        D = U + 1e-1 * np.random.randn(N, N)
        return U, D

    def _tvl2_3d(self):
        np.random.seed(12345)
        N = 32
        U = np.ones((N, N, N)); U[:, :N // 2, :] = -1
        D = U + 1e-1 * np.random.randn(N, N, N)
        return U, D

    def _tvl1_2d(self):
        np.random.seed(12345)
        N, L = 64, 20
        U = np.ones((N, N)); U[:, :N // 2] = -1
        V = np.random.randn(N, N)
        t = np.sort(np.abs(V).ravel())[V.size - L]
        V[np.abs(V) < t] = 0
        return U, U + V

    def _mse(self, a, b):
        return float(np.mean((np.asarray(a) - np.asarray(b)) ** 2))

    def test_tvl2_denoise_2d(self):
        U, D = self._tvl2_2d()
        lmbda = 1e-1
        opt = tv.TVL2Denoise.options(max_iter=300, rho=75 * lmbda)
        b = tv.TVL2Denoise(D, lmbda, opt=opt, dtype=jnp.float64,
                           g_eval_y=False)
        X = b.solve()
        assert abs(b.getitstat().ObjFun[-1] - 32.875710674129564) < 1e-3
        assert self._mse(U, X) < 1e-3

    def test_tvl2_deconv_2d(self):
        U, D = self._tvl2_2d()
        lmbda = 1e-1
        opt = tv.TVL2Deconv.options(max_iter=250)
        b = tv.TVL2Deconv(np.ones((1, 1)), D, lmbda, opt=opt,
                          dtype=jnp.float64, g_eval_y=False)
        X = b.solve()
        assert abs(b.getitstat().ObjFun[-1] - 45.45958573088) < 1e-3
        assert self._mse(U, X) < 1e-3

    def test_tvl2_denoise_3d_axes01(self):
        U, D = self._tvl2_3d()
        lmbda = 1e-1
        opt = tv.TVL2Denoise.options(max_iter=250, rho=10 * lmbda)
        b = tv.TVL2Denoise(D, lmbda, opt=opt, axes=(0, 1),
                           dtype=jnp.float64, g_eval_y=False)
        X = b.solve()
        assert abs(b.getitstat().ObjFun[-1] - 363.0802047) < 1e-3
        assert self._mse(U, X) < 1e-3

    def test_tvl2_denoise_3d_axes012(self):
        U, D = self._tvl2_3d()
        lmbda = 1e-1
        opt = tv.TVL2Denoise.options(max_iter=250, rho=10 * lmbda)
        b = tv.TVL2Denoise(D, lmbda, opt=opt, axes=(0, 1, 2),
                           dtype=jnp.float64, g_eval_y=False)
        X = b.solve()
        assert abs(b.getitstat().ObjFun[-1] - 366.04267554965134) < 1e-3
        assert self._mse(U, X) < 1e-3

    def test_tvl2_deconv_3d_axes012(self):
        U, D = self._tvl2_3d()
        lmbda = 1e-1
        opt = tv.TVL2Deconv.options(max_iter=250)
        b = tv.TVL2Deconv(np.ones((1, 1, 1)), D, lmbda, opt=opt,
                          axes=(0, 1, 2), dtype=jnp.float64,
                          g_eval_y=False)
        X = b.solve()
        assert abs(b.getitstat().ObjFun[-1] - 567.72425227) < 1e-2
        assert self._mse(U, X) < 1e-3

    def test_tvl1_denoise_2d(self):
        U, D = self._tvl1_2d()
        opt = tv.TVL1Denoise.options(max_iter=250)
        b = tv.TVL1Denoise(D, 3.0, opt=opt, dtype=jnp.float64,
                           g_eval_y=False)
        X = b.solve()
        assert abs(b.getitstat().ObjFun[-1] - 447.78101756451662) < 1e-3
        assert self._mse(U, X) < 1e-5

    def test_tvl1_deconv_2d(self):
        U, D = self._tvl1_2d()
        opt = tv.TVL1Deconv.options(max_iter=250, rho=10.0)
        b = tv.TVL1Deconv(np.ones((1, 1)), D, 3.0, opt=opt,
                          dtype=jnp.float64, g_eval_y=False)
        X = b.solve()
        assert abs(b.getitstat().ObjFun[-1] - 831.88219947939172) < 1e-2
        assert self._mse(U, X) < 1e-4


class TestTVDtypePlumbing:
    """DataType-propagation tests (reference test_tvl2.py:59-117)."""

    def test_dtypes(self):
        np.random.seed(12345)
        D = np.random.randn(16, 16)
        for dt in (jnp.float32, jnp.float64):
            opt = tv.TVL2Denoise.options(max_iter=5)
            b = tv.TVL2Denoise(D, 3.0, opt=opt, dtype=dt)
            X = b.solve()
            assert X.dtype == jnp.dtype(dt)
            opt = tv.TVL2Deconv.options(max_iter=5)
            b = tv.TVL2Deconv(np.ones((1, 1)), D, 3.0, opt=opt, dtype=dt)
            X = b.solve()
            assert X.dtype == jnp.dtype(dt)


class TestSplineGoldenReference:
    """Golden value from the reference (tests/admm/test_spline.py:15-33):
    l1-spline smoothing of a cosine product surface with sparse
    outliers, fidelity weight zero at the outlier locations."""

    def test_spline_golden(self):
        np.random.seed(12345)
        N, L = 64, 20
        x = np.cos(np.linspace(0, np.pi, N))[np.newaxis, :]
        y = np.cos(np.linspace(0, np.pi, N))[:, np.newaxis]
        U = x * y
        V = np.random.randn(N, N)
        t = np.sort(np.abs(V).ravel())[V.size - L]
        V[np.abs(V) < t] = 0
        D = U + V
        opt = spline.SplineL1.options(max_iter=250, rel_stop_tol=5e-4)
        b = spline.SplineL1(D, 0.1, opt=opt, Wdf=(V == 0),
                            dtype=jnp.float64, g_eval_y=False)
        X = b.solve()
        assert abs(b.getitstat().ObjFun[-1] - 0.333606246) < 1e-5
        assert float(np.mean((np.asarray(X) - U) ** 2)) < 1e-6

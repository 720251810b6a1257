import numpy as np
import jax.numpy as jnp

from sporco_tpu.utils import array, signal, metric
from sporco_tpu.ops import fft


class TestArray:

    def setup_method(self):
        self.rng = np.random.default_rng(12345)

    def test_zpad(self):
        x = jnp.ones((3, 4))
        y = array.zpad(x, (1, 2), 0)
        assert y.shape == (6, 4)
        assert float(y[0, 0]) == 0 and float(y[1, 0]) == 1

    def test_atleast_nd(self):
        x = jnp.ones((3, 4))
        assert array.atleast_nd(4, x).shape == (3, 4, 1, 1)
        assert array.atleast_nd(1, x).shape == (3, 4)

    def test_zdivide(self):
        r = np.asarray(array.zdivide(jnp.array([1.0, 2.0]),
                                     jnp.array([2.0, 0.0])))
        assert np.allclose(r, [0.5, 0.0])

    def test_split(self):
        x = jnp.arange(12).reshape(3, 4)
        parts = array.split(x, axis=0)
        assert len(parts) == 3 and parts[1].shape == (4,)

    def test_rolling_window(self):
        x = jnp.arange(8.0)
        w = array.rolling_window(x, 3, 2)
        assert w.shape == (3, 3)
        assert np.allclose(np.asarray(w)[1], [2, 3, 4])

    def test_extract_average_blocks(self):
        img = jnp.array(self.rng.standard_normal((8, 8)))
        blks = array.extract_blocks(img, (4, 4), (2, 2))
        assert blks.shape == (4, 4, 9)
        rec = array.average_blocks(blks, (8, 8), (2, 2))
        assert np.allclose(np.asarray(rec), np.asarray(img), atol=1e-10)

    def test_promote16(self):
        x = jnp.ones((2, 2), dtype=jnp.float16)
        y = array.promote16(x, fn=lambda u: u * 2)
        assert y.dtype == jnp.float16


class TestSignal:

    def setup_method(self):
        self.rng = np.random.default_rng(12345)

    def test_grad_adjoint(self):
        # <y, Gx> == <G^T y, x>
        x = jnp.array(self.rng.standard_normal((6, 7)))
        y = jnp.array(self.rng.standard_normal((6, 7)))
        for ax in (0, 1):
            lhs = float(jnp.sum(y * signal.grad(x, ax)))
            rhs = float(jnp.sum(signal.gradT(y, ax) * x))
            assert np.allclose(lhs, rhs, atol=1e-10)

    def test_grad_zero_pad_adjoint(self):
        x = jnp.array(self.rng.standard_normal((6, 7)))
        y = jnp.array(self.rng.standard_normal((7, 7)))
        lhs = float(jnp.sum(y * signal.grad(x, 0, zero_pad=True)))
        rhs = float(jnp.sum(signal.gradT(y, 0, zero_pad=True) * x))
        assert np.allclose(lhs, rhs, atol=1e-10)

    def test_gradient_filters(self):
        Gf, GHGf = signal.gradient_filters(2, (8, 8), dtype=jnp.float64)
        assert Gf.shape == (2, 8, 5)
        assert GHGf.shape == (8, 5)
        # DFT-domain gradient equals spatial circular difference
        x = jnp.array(self.rng.standard_normal((8, 8)))
        xf = fft.rfftn(x, axes=(0, 1))
        g0 = fft.irfftn(Gf[0] * xf, s=(8, 8), axes=(0, 1))
        # filter [1, -1] convolved circularly = backward difference
        ref = np.asarray(x) - np.roll(np.asarray(x), 1, axis=0)
        assert np.allclose(np.asarray(g0), ref, atol=1e-10)

    def test_tikhonov_filter(self):
        s = jnp.array(self.rng.standard_normal((32, 32)))
        sl, sh = signal.tikhonov_filter(s, 5.0)
        assert np.allclose(np.asarray(sl + sh), np.asarray(s), atol=1e-10)
        # lowpass really is smoother
        def roughness(v):
            v = np.asarray(v)
            return np.sum(np.diff(v, axis=0) ** 2) + \
                np.sum(np.diff(v, axis=1) ** 2)
        assert roughness(sl) < roughness(s)

    def test_gaussian(self):
        g = signal.gaussian((7, 7), sd=1.0)
        assert np.allclose(float(jnp.sum(g)), 1.0)

    def test_rgb2gray(self):
        import jax
        rgb = jnp.array(self.rng.random((4, 4, 3)))
        g = signal.rgb2gray(rgb)
        assert g.shape == (4, 4)

    def test_noise_utils(self):
        import jax
        key = jax.random.PRNGKey(0)
        s = jnp.full((100, 100), 0.5)
        sp = signal.spnoise(key, s, 0.5)
        vals = np.unique(np.asarray(sp))
        assert set(vals.tolist()) <= {0.0, 0.5, 1.0}
        m = signal.rndmask(key, (100, 100), 0.3)
        assert 0.6 < float(jnp.mean(m)) < 0.8


class TestMetric:

    def setup_method(self):
        self.rng = np.random.default_rng(12345)
        self.ref = self.rng.random((32, 32))
        self.cmp = self.ref + 0.01 * self.rng.standard_normal((32, 32))

    def test_basic(self):
        assert float(metric.mse(self.ref, self.ref)) == 0.0
        assert float(metric.mae(self.ref, self.cmp)) > 0
        assert float(metric.snr(self.ref, self.cmp)) > 10
        assert float(metric.psnr(self.ref, self.cmp)) > 20
        assert float(metric.isnr(self.ref, self.cmp, self.ref)) == np.inf \
            or float(metric.isnr(self.ref, self.cmp, self.ref)) > 50

    def test_bsnr(self):
        assert float(metric.bsnr(self.ref, self.cmp)) > 10

    def test_pamse_gmsd(self):
        p = float(metric.pamse(self.ref, self.cmp))
        assert p >= 0
        g = float(metric.gmsd(self.ref, self.cmp))
        assert 0 <= g < 1
        assert float(metric.gmsd(self.ref, self.ref)) < 1e-6

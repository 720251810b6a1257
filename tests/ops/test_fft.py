import numpy as np
import jax.numpy as jnp

from sporco_tpu.ops import fft


class TestFFT:

    def setup_method(self):
        self.rng = np.random.default_rng(12345)

    def test_rfftn_roundtrip(self):
        x = self.rng.standard_normal((8, 9))
        xf = fft.rfftn(jnp.array(x), axes=(0, 1))
        xr = fft.irfftn(xf, s=(8, 9), axes=(0, 1))
        assert np.allclose(x, np.asarray(xr), atol=1e-12)

    def test_fl2norm2(self):
        x = self.rng.standard_normal((8, 8))
        xf = fft.fftn(jnp.array(x), axes=(0, 1))
        n2 = float(fft.fl2norm2(xf, axis=(0, 1)))
        assert np.allclose(n2, np.sum(x ** 2), rtol=1e-10)

    def test_rfl2norm2_even_odd(self):
        for shape in [(8, 8), (8, 9), (7, 8), (7, 9)]:
            x = self.rng.standard_normal(shape)
            xf = fft.rfftn(jnp.array(x), axes=(0, 1))
            n2 = float(fft.rfl2norm2(xf, shape, axis=(0, 1)))
            assert np.allclose(n2, np.sum(x ** 2), rtol=1e-10), shape

    def test_rfl2norm2_extra_axes(self):
        x = self.rng.standard_normal((3, 8, 9))
        xf = fft.rfftn(jnp.array(x), axes=(1, 2))
        n2 = float(fft.rfl2norm2(xf, (8, 9), axis=(1, 2)))
        assert np.allclose(n2, np.sum(x ** 2), rtol=1e-10)

    def test_fftconv(self):
        a = self.rng.standard_normal((4, 5))
        b = self.rng.standard_normal((16, 17))
        ab = np.asarray(fft.fftconv(jnp.array(a), jnp.array(b),
                                    axes=(0, 1)))
        # dense circular convolution reference
        ref = np.zeros((16, 17))
        for i in range(4):
            for j in range(5):
                ref += a[i, j] * np.roll(np.roll(b, i, axis=0), j, axis=1)
        assert np.allclose(ab, ref, atol=1e-10)

    def test_dct_roundtrip(self):
        x = self.rng.standard_normal((8, 12))
        y = fft.idctii(fft.dctii(jnp.array(x), axes=(0, 1)), axes=(0, 1))
        assert np.allclose(x, np.asarray(y), atol=1e-10)

    def test_dtype_helpers(self):
        assert fft.complex_dtype(jnp.float32) == jnp.complex64
        assert fft.complex_dtype(jnp.float64) == jnp.complex128
        assert fft.real_dtype(jnp.complex64) == jnp.float32
        assert fft.is_complex_dtype(jnp.complex64)
        assert not fft.is_complex_dtype(jnp.float32)

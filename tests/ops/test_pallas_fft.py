"""Fused Pallas 2D real-FFT kernels vs numpy.fft.

The kernels only compile on TPU; the CPU suite exercises them through
the Pallas interpreter (``pallas_fft.interpret``).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from sporco_tpu.ops import pallas_fft
from sporco_tpu.ops import mxufft


@pytest.fixture(autouse=True)
def _interpret_mode():
    pallas_fft.interpret = True
    yield
    pallas_fft.interpret = False


class TestPallasFFT:
    def setup_method(self):
        self.rng = np.random.default_rng(12345)

    @pytest.mark.parametrize("n0,n1", [
        (128, 128), (256, 64), (512, 512), (128, 16), (256, 30),
    ])
    @pytest.mark.parametrize("prec", ["highest", "high"])
    def test_roundtrip_vs_numpy(self, n0, n1, prec):
        x = self.rng.standard_normal((2, n0, n1)).astype(np.float32)
        ref = np.fft.rfftn(x, axes=(1, 2))
        yr, yi = pallas_fft.rfft2_planar(jnp.asarray(x), precision=prec)
        got = np.asarray(yr) + 1j * np.asarray(yi)
        tol = 1e-6 if prec == "highest" else 3e-5
        assert np.abs(got - ref).max() < tol * np.abs(ref).max()
        xb = pallas_fft.irfft2_planar(
            jnp.asarray(ref.real.astype(np.float32)),
            jnp.asarray(ref.imag.astype(np.float32)), n1, precision=prec)
        assert np.abs(np.asarray(xb) - x).max() < 30 * tol

    def test_high_leading_dims(self):
        x = self.rng.standard_normal((2, 3, 128, 32)).astype(np.float32)
        yr, yi = pallas_fft.rfft2_planar(jnp.asarray(x), precision="high")
        ref = np.fft.rfftn(x, axes=(2, 3))
        got = np.asarray(yr) + 1j * np.asarray(yi)
        assert np.abs(got - ref).max() < 3e-5 * np.abs(ref).max()

    def test_supported_predicate(self):
        assert pallas_fft.supported(512, 512, jnp.float32)
        assert pallas_fft.supported(128, 30, jnp.float32)
        assert not pallas_fft.supported(512, 512, jnp.float64)
        assert not pallas_fft.supported(96, 512, jnp.float32)   # not R*128
        assert not pallas_fft.supported(1024, 512, jnp.float32)  # R=8
        assert not pallas_fft.supported(512, 17, jnp.float32)   # odd N1

    def test_dispatch_highest_through_mxufft(self):
        # in 'highest' precision the mxufft layer routes supported 2D
        # last-axes transforms to the Pallas kernel
        x = self.rng.standard_normal((3, 128, 64)).astype(np.float32)
        assert mxufft.get_precision() == "highest"
        got = np.asarray(mxufft.rfftn(jnp.asarray(x), axes=(1, 2)))
        ref = np.fft.rfftn(x, axes=(1, 2))
        assert np.abs(got - ref).max() < 1e-5 * np.abs(ref).max()
        back = np.asarray(mxufft.irfftn(jnp.asarray(ref.astype(np.complex64)),
                                        s=(128, 64), axes=(1, 2)))
        assert np.abs(back - x).max() < 1e-5

"""MXU (matmul) DFT backend vs numpy.fft.

The dispatch in sporco_tpu.ops.fft only routes here on TPU backends;
these tests force the implementation directly so the matmul transforms
are exercised on the CPU suite.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from sporco_tpu.ops import mxufft
from sporco_tpu.ops import fft as sf


class TestMXUFFT:
    def setup_method(self):
        self.rng = np.random.default_rng(12345)

    @pytest.mark.parametrize("shape,axes", [
        ((16,), (0,)),
        ((8, 16), (0, 1)),
        ((3, 8, 16), (1, 2)),
        ((3, 9, 15), (1, 2)),       # odd lengths
        ((2, 4, 8, 16), (2, 3)),
    ])
    def test_rfftn_irfftn(self, shape, axes):
        x = self.rng.standard_normal(shape).astype(np.float32)
        got = np.asarray(mxufft.rfftn(jnp.asarray(x), axes=axes))
        ref = np.fft.rfftn(x, axes=axes)
        assert np.abs(got - ref).max() < 1e-4 * max(1.0, np.abs(ref).max())
        s = tuple(shape[a] for a in axes)
        back = np.asarray(mxufft.irfftn(jnp.asarray(got), s=s, axes=axes))
        assert np.abs(back - x).max() < 1e-5

    @pytest.mark.parametrize("shape,axes", [
        ((16,), (0,)),
        ((8, 16), (0, 1)),
        ((3, 8, 16), (1, 2)),
    ])
    def test_fftn_ifftn_complex(self, shape, axes):
        x = (self.rng.standard_normal(shape)
             + 1j * self.rng.standard_normal(shape)).astype(np.complex64)
        got = np.asarray(mxufft.fftn(jnp.asarray(x), axes=axes))
        ref = np.fft.fftn(x, axes=axes)
        assert np.abs(got - ref).max() < 1e-4 * max(1.0, np.abs(ref).max())
        back = np.asarray(mxufft.ifftn(jnp.asarray(got), axes=axes))
        assert np.abs(back - x).max() < 1e-5

    def test_fftn_real_input(self):
        x = self.rng.standard_normal((4, 8)).astype(np.float32)
        got = np.asarray(mxufft.fftn(jnp.asarray(x)))
        ref = np.fft.fftn(x)
        assert np.abs(got - ref).max() < 1e-4 * np.abs(ref).max()

    def test_padding_s(self):
        # zero-pad semantics of the s argument (filter -> signal grid)
        d = self.rng.standard_normal((5, 5)).astype(np.float32)
        got = np.asarray(mxufft.rfftn(jnp.asarray(d), s=(16, 16)))
        ref = np.fft.rfftn(d, s=(16, 16))
        assert np.abs(got - ref).max() < 1e-4 * np.abs(ref).max()

    def test_truncation_s(self):
        x = self.rng.standard_normal((16, 16)).astype(np.float32)
        got = np.asarray(mxufft.rfftn(jnp.asarray(x), s=(8, 8)))
        ref = np.fft.rfftn(x[:8, :8])
        assert np.abs(got - ref).max() < 1e-4 * np.abs(ref).max()

    def test_irfftn_odd_length(self):
        x = self.rng.standard_normal((7, 9)).astype(np.float32)
        xf = np.fft.rfftn(x)
        got = np.asarray(mxufft.irfftn(jnp.asarray(xf.astype(np.complex64)),
                                       s=(7, 9)))
        assert np.abs(got - x).max() < 1e-5

    def test_float64(self):
        x = self.rng.standard_normal((8, 8))
        got = np.asarray(mxufft.rfftn(jnp.asarray(x)))
        ref = np.fft.rfftn(x)
        assert np.abs(got - ref).max() < 1e-10 * np.abs(ref).max()

    def test_dispatch_forced(self):
        # force-on dispatch through the public fft layer
        x = self.rng.standard_normal((8, 16)).astype(np.float32)
        sf.use_mxu_fft("always")
        try:
            got = np.asarray(sf.rfftn(jnp.asarray(x)))
        finally:
            sf.use_mxu_fft("auto")
        ref = np.fft.rfftn(x)
        assert np.abs(got - ref).max() < 1e-4 * np.abs(ref).max()

    def test_precision_setting(self):
        assert mxufft.get_precision() == "highest"
        mxufft.set_precision("high")
        try:
            assert mxufft.get_precision() == "high"
            with pytest.raises(ValueError):
                mxufft.set_precision("bogus")
        finally:
            mxufft.set_precision("highest")

    def test_solver_end_to_end_forced(self):
        # a small ConvBPDN solve must converge identically (to f32
        # noise) through the matmul-DFT path
        from sporco_tpu.models import cbpdn
        from sporco_tpu.solvers.admm import AutoRhoOpts
        rng = np.random.default_rng(12345)
        N, M, Nd = 16, 4, 5
        D = rng.standard_normal((Nd, Nd, M)).astype(np.float32)
        S = rng.standard_normal((N, N)).astype(np.float32)
        opt = cbpdn.ConvBPDN.options(max_iter=20, rel_stop_tol=0.0,
                                     rho=1e-1,
                                     auto_rho=AutoRhoOpts(enabled=False))
        b1 = cbpdn.ConvBPDN(D, S, lmbda=0.1, opt=opt, dtype=jnp.float32)
        X1 = np.asarray(b1.solve())
        sf.use_mxu_fft("always")
        try:
            b2 = cbpdn.ConvBPDN(D, S, lmbda=0.1, opt=opt,
                                dtype=jnp.float32)
            X2 = np.asarray(b2.solve())
        finally:
            sf.use_mxu_fft("auto")
        assert np.abs(X1 - X2).max() < 1e-4

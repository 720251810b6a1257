"""Spatial (N-axis) domain decomposition: the distributed slab FFT and
the row-sharded TVL2 deconvolution must match their single-device
counterparts (SURVEY.md §5 sequence-parallel analogue)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec
from jax import shard_map

from sporco_tpu.parallel import spatial
from sporco_tpu.parallel.mesh import make_mesh


class TestDistFFT:

    def test_roundtrip_and_reference(self):
        rng = np.random.default_rng(12345)
        mesh = make_mesh()          # 8 virtual devices on "data"
        P = mesh.shape["data"]
        N0, N1 = 32, 24             # K1 = 13, padded to 16
        x = rng.standard_normal((N0, N1))
        K1 = N1 // 2 + 1
        K1p = -(-K1 // P) * P

        fwd = jax.jit(shard_map(
            lambda v: spatial.dist_rfft2(v, P),
            mesh=mesh, in_specs=PartitionSpec("data", None),
            out_specs=PartitionSpec(None, "data")))
        inv = jax.jit(shard_map(
            lambda v: spatial.dist_irfft2(v, N1, P),
            mesh=mesh, in_specs=PartitionSpec(None, "data"),
            out_specs=PartitionSpec("data", None)))

        xs = jax.device_put(jnp.asarray(x),
                            NamedSharding(mesh,
                                          PartitionSpec("data", None)))
        Xf = fwd(xs)
        assert Xf.shape == (N0, K1p)
        ref = np.fft.rfft2(x)
        got = np.asarray(Xf)[:, :K1]
        assert np.abs(got - ref).max() < 1e-10 * max(np.abs(ref).max(),
                                                     1.0)
        # pad columns are exactly zero
        assert np.abs(np.asarray(Xf)[:, K1:]).max() == 0.0
        xr = np.asarray(inv(Xf))
        assert np.abs(xr - x).max() < 1e-12


class TestNShardedTVL2Deconv:

    def test_matches_single_device(self):
        from sporco_tpu.models import tv
        rng = np.random.default_rng(12345)
        N = 64
        img = np.zeros((N, N))
        img[N // 4:3 * N // 4, N // 4:3 * N // 4] = 1.0
        h = np.ones((5, 5)) / 25.0
        Hf = np.fft.rfft2(h, s=(N, N))
        S = np.fft.irfft2(np.fft.rfft2(img) * Hf, s=(N, N))
        S = S + 0.02 * rng.standard_normal((N, N))

        opt = tv.TVL2Deconv.options(max_iter=50, rel_stop_tol=1e-4)
        b = tv.TVL2Deconv(h, S, lmbda=5e-3, opt=opt,
                          dtype=jnp.float64)
        X1 = np.asarray(b.solve()).squeeze()
        n1 = len(b.getitstat())

        mesh = make_mesh()
        X2, k2, r2, s2 = spatial.tvl2deconv_nsharded(
            h, S, 5e-3, mesh, opt=opt)
        # row-sharded across all 8 devices
        assert len(X2.sharding.device_set) == 8
        assert k2 == n1                     # same early-stop iteration
        assert np.abs(np.asarray(X2) - X1).max() < 1e-9

    def test_nsharded_cbpdn_matches_single(self):
        # the flagship CSC solver with image rows sharded over 8
        # devices: identical trajectory to the generic single-device
        # ConvBPDN (incl. AutoRho and early stopping)
        from sporco_tpu.models import cbpdn as mc
        rng = np.random.default_rng(12345)
        N, Nd, M = 64, 6, 8
        D = rng.standard_normal((Nd, Nd, M))
        D /= np.sqrt((D ** 2).sum(axis=(0, 1), keepdims=True))
        S = rng.standard_normal((N, N))

        opt = mc.ConvBPDN.options(max_iter=60, rel_stop_tol=1e-3)
        b = mc.ConvBPDN(D, S, lmbda=0.1, opt=opt, dtype=jnp.float64,
                        fused=False)
        X1 = np.squeeze(np.asarray(b.solve()))
        its = b.getitstat()

        mesh = make_mesh()
        X2, stats, k = spatial.cbpdn_nsharded(D, S, 0.1, mesh, opt=opt)
        assert len(X2.sharding.device_set) == 8
        assert k == len(its)                 # same early-stop point
        assert np.abs(np.asarray(X2) - X1).max() < 1e-9
        # per-iteration objective/residual parity with the generic run
        assert np.allclose(stats[:, 1], np.asarray(its.ObjFun),
                           rtol=1e-6)
        assert np.allclose(stats[:, 4], np.asarray(its.PrimalRsdl),
                           rtol=1e-5, atol=1e-12)
        assert np.allclose(stats[:, 8], np.asarray(its.Rho),
                           rtol=1e-6)

    def test_early_stop_disabled_runs_full(self):
        from sporco_tpu.models import tv
        rng = np.random.default_rng(0)
        S = rng.standard_normal((32, 32))
        h = np.ones((3, 3)) / 9.0
        mesh = make_mesh()
        opt = tv.TVL2Deconv.options(max_iter=12, rel_stop_tol=0.0)
        X, k, r, s = spatial.tvl2deconv_nsharded(h, S, 1e-2, mesh,
                                                 opt=opt)
        assert k == 12
        assert np.all(np.isfinite(np.asarray(X)))

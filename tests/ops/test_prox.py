import numpy as np
import jax
import jax.numpy as jnp

from sporco_tpu.ops import prox


def _prox_check(v, alpha, fn, normfn, eps=1e-6, nit=200, rng=None):
    """Numerically verify the prox definition: fn(v) should minimise
    0.5||x - v||^2 + alpha * normfn(x) better than random perturbations."""
    px = np.asarray(fn(jnp.array(v), alpha))
    obj0 = 0.5 * np.sum((px - v) ** 2) + alpha * float(normfn(jnp.array(px)))
    rng = rng or np.random.default_rng(0)
    for _ in range(nit):
        x = px + eps * rng.standard_normal(v.shape) * 100
        obj = 0.5 * np.sum((x - v) ** 2) + alpha * float(normfn(jnp.array(x)))
        assert obj >= obj0 - 1e-9
    return px


class TestProx:

    def setup_method(self):
        self.rng = np.random.default_rng(12345)

    def test_prox_l1_values(self):
        v = np.array([-2.0, -0.5, 0.0, 0.5, 2.0])
        x = np.asarray(prox.prox_l1(jnp.array(v), 1.0))
        assert np.allclose(x, [-1.0, 0.0, 0.0, 0.0, 1.0])

    def test_prox_l1_complex(self):
        v = np.array([3 + 4j, 0.1 + 0.1j])
        x = np.asarray(prox.prox_l1(jnp.array(v), 1.0))
        assert np.allclose(x[0], (3 + 4j) * (4.0 / 5.0))
        assert x[1] == 0

    def test_prox_l1_minimiser(self):
        v = self.rng.standard_normal(16)
        _prox_check(v, 0.7, prox.prox_l1, prox.norm_l1, rng=self.rng)

    def test_prox_l0(self):
        v = np.array([-2.0, -0.5, 0.5, 2.0])
        x = np.asarray(prox.prox_l0(jnp.array(v), 0.5))
        assert np.allclose(x, [-2.0, 0.0, 0.0, 2.0])

    def test_prox_l2_minimiser(self):
        v = self.rng.standard_normal(16)
        _prox_check(v, 0.7, prox.prox_l2, prox.norm_l2, rng=self.rng)

    def test_prox_l2_axis(self):
        v = self.rng.standard_normal((8, 4))
        x = np.asarray(prox.prox_l2(jnp.array(v), 0.5, axis=1))
        nrm = np.linalg.norm(v, axis=1, keepdims=True)
        ref = np.maximum(0, nrm - 0.5) / np.maximum(nrm, 1e-30) * v
        assert np.allclose(x, ref)

    def test_proj_l2(self):
        v = self.rng.standard_normal(16) * 10
        x = np.asarray(prox.proj_l2(jnp.array(v), 2.0))
        assert abs(np.linalg.norm(x) - 2.0) < 1e-10
        v2 = v / np.linalg.norm(v)  # inside ball
        x2 = np.asarray(prox.proj_l2(jnp.array(v2), 2.0))
        assert np.allclose(x2, v2)

    def test_proj_l1(self):
        v = self.rng.standard_normal(64) * 3
        for gamma in [0.1, 1.0, 10.0]:
            x = np.asarray(prox.proj_l1(jnp.array(v), gamma))
            assert np.sum(np.abs(x)) <= gamma * (1 + 1e-9)
        # identity inside the ball
        vin = v / (np.sum(np.abs(v)) * 2)
        x = np.asarray(prox.proj_l1(jnp.array(vin), 1.0))
        assert np.allclose(x, vin, atol=1e-12)

    def test_proj_l1_axes(self):
        v = self.rng.standard_normal((4, 8, 3))
        x = np.asarray(prox.proj_l1(jnp.array(v), 1.0, axis=(0, 2)))
        nrm = np.sum(np.abs(x), axis=(0, 2))
        assert np.all(nrm <= 1.0 + 1e-9)

    def test_proj_l1_optimality(self):
        # projection must be the closest point in the ball
        v = self.rng.standard_normal(32) * 2
        gamma = 1.5
        x = np.asarray(prox.proj_l1(jnp.array(v), gamma))
        d0 = np.sum((x - v) ** 2)
        for _ in range(200):
            z = self.rng.standard_normal(32)
            z = gamma * z / np.sum(np.abs(z)) * self.rng.uniform()
            assert np.sum((z - v) ** 2) >= d0 - 1e-9

    def test_prox_sl1l2(self):
        v = self.rng.standard_normal((8, 4))
        x = np.asarray(prox.prox_sl1l2(jnp.array(v), 0.3, 0.2, axis=1))
        ref = np.asarray(prox.prox_l2(prox.prox_l1(jnp.array(v), 0.3),
                                      0.2, axis=1))
        assert np.allclose(x, ref)

    def test_prox_dl1l2(self):
        v = self.rng.standard_normal((6, 5))
        x = np.asarray(prox.prox_dl1l2(jnp.array(v), 0.4, 0.9, axis=1))
        # objective decrease vs v itself for prox with alpha*(l1 - beta*l2)
        def obj(u):
            return (0.5 * np.sum((u - v) ** 2)
                    + 0.4 * (np.sum(np.abs(u))
                             - 0.9 * np.sum(np.linalg.norm(u, axis=1))))
        assert obj(x) <= obj(v) + 1e-9

    def test_prox_nuclear(self):
        v = self.rng.standard_normal((8, 6))
        x, ss = prox.prox_nuclear(jnp.array(v), 0.5)
        sv = np.linalg.svd(v, compute_uv=False)
        assert np.allclose(np.sort(np.asarray(ss))[::-1],
                           np.maximum(0, sv - 0.5), atol=1e-10)
        xs = np.linalg.svd(np.asarray(x), compute_uv=False)
        assert np.allclose(np.sort(xs)[::-1], np.maximum(0, sv - 0.5),
                           atol=1e-8)

    def test_prox_nuclear_randomized(self):
        # low-rank target with a below-threshold tail: the randomized
        # subspace-iteration path must match the full SVD exactly
        rng = np.random.default_rng(7)
        U = np.linalg.qr(rng.standard_normal((64, 64)))[0]
        V = np.linalg.qr(rng.standard_normal((64, 64)))[0]
        sv = np.zeros(64)
        sv[:6] = [50, 40, 30, 20, 10, 5]
        sv[6:] = rng.uniform(0, 0.05, 58)
        A = jnp.asarray((U * sv) @ V.T, jnp.float32)
        Xf, _ = prox.prox_nuclear(A, 0.1)
        Xr, sr = prox.prox_nuclear(A, 0.1, rank=6)
        assert float(jnp.abs(Xf - Xr).max()) < 1e-4
        # thresholded singular values agree on the captured subspace
        assert np.allclose(np.asarray(sr)[:6],
                           np.maximum(0, sv[:6] - 0.1), rtol=1e-5)

    def test_norms(self):
        v = self.rng.standard_normal((4, 6))
        assert np.allclose(float(prox.norm_l1(jnp.array(v))),
                           np.sum(np.abs(v)))
        assert np.allclose(float(prox.norm_2l2(jnp.array(v))),
                           np.sum(v ** 2))
        assert np.allclose(float(prox.norm_l21(jnp.array(v), axis=1)),
                           np.sum(np.linalg.norm(v, axis=1)))
        assert int(prox.norm_l0(jnp.array([0.0, 1.0, 0.0, 2.0]))) == 2

    def test_ndto2d_roundtrip(self):
        v = self.rng.standard_normal((3, 4, 5, 6))
        vtr, rsi = prox.ndto2d(jnp.array(v), axis=(1, 3))
        assert vtr.shape == (15, 24)
        v2 = np.asarray(prox.ndfrom2d(vtr, rsi))
        assert np.allclose(v, v2)

    def test_jit_compat(self):
        v = jnp.array(self.rng.standard_normal((8, 4)))
        f = jax.jit(lambda v: prox.proj_l1(v, 1.0, axis=1))
        g = jax.jit(lambda v: prox.prox_sl1l2(v, 0.1, 0.1, axis=0))
        assert np.all(np.isfinite(np.asarray(f(v))))
        assert np.all(np.isfinite(np.asarray(g(v))))

import numpy as np
import jax
import jax.numpy as jnp

from sporco_tpu.models import ppp


def _denoise_problem():
    """Simple PPP test problem: recover a smooth signal from noisy
    observations with a (traceable) smoothing prior."""
    rng = np.random.default_rng(12345)
    N = 64
    x_true = np.cumsum(rng.standard_normal(N)) / 4
    x_true = np.convolve(x_true, np.ones(8) / 8, mode="same")
    y_obs = x_true + 0.3 * rng.standard_normal(N)
    y_obs = jnp.asarray(y_obs, jnp.float64)

    def f(x):
        return 0.5 * jnp.sum((x - y_obs) ** 2)

    def proxf(x, rho):
        # prox of (1/rho) f
        return (rho * x + y_obs) / (rho + 1.0)

    def proxg(x, rho):
        # smoothing "denoiser": one local-averaging pass
        k = jnp.array([0.25, 0.5, 0.25], x.dtype)
        return jnp.convolve(x, k, mode="same")

    return x_true, y_obs, f, proxf, proxg


class TestPPP:

    def test_admm_ppp(self):
        x_true, y_obs, f, proxf, proxg = _denoise_problem()
        opt = ppp.PPP.options(max_iter=50, rel_stop_tol=1e-6)
        b = ppp.PPP((64,), f, proxf, proxg, opt=opt, dtype=jnp.float64)
        x = np.asarray(b.solve())
        assert np.linalg.norm(x - x_true) < \
            np.linalg.norm(np.asarray(y_obs) - x_true)
        its = b.getitstat()
        assert np.all(np.isfinite(its.FVal))

    def test_pgm_ppp(self):
        x_true, y_obs, f, proxf, proxg = _denoise_problem()

        def gradf(x):
            return x - y_obs

        opt = ppp.PPPPGM.options(max_iter=50, L=2.0)
        b = ppp.PPPPGM((64,), f, gradf,
                       lambda x, L: proxg_wrap(x), opt=opt,
                       dtype=jnp.float64)
        k = jnp.array([0.25, 0.5, 0.25], jnp.float64)
        def proxg_wrap(x):
            return jnp.convolve(x, k, mode="same")
        x = np.asarray(b.solve())
        assert np.linalg.norm(x - x_true) < \
            np.linalg.norm(np.asarray(y_obs) - x_true)

    def test_consensus_mace(self):
        x_true, y_obs, f, proxf, proxg = _denoise_problem()
        opt = ppp.PPPConsensus.options(max_iter=60)
        b = ppp.PPPConsensus((64,), [proxf, proxg], opt=opt,
                             dtype=jnp.float64)
        x = np.asarray(b.solve())
        assert np.linalg.norm(x - x_true) < \
            np.linalg.norm(np.asarray(y_obs) - x_true)

    def test_host_prior_callback(self):
        # a host-side numpy denoiser plugged in via pure_callback
        from scipy.ndimage import uniform_filter1d
        x_true, y_obs, f, proxf, _ = _denoise_problem()
        hp = ppp.host_prior(lambda v: uniform_filter1d(v, 3))
        opt = ppp.PPP.options(max_iter=30)
        b = ppp.PPP((64,), f, proxf, hp, opt=opt, dtype=jnp.float64)
        x = np.asarray(b.solve())
        assert np.all(np.isfinite(x))
        assert np.linalg.norm(x - x_true) < \
            np.linalg.norm(np.asarray(y_obs) - x_true)

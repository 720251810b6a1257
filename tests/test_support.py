import numpy as np
import jax.numpy as jnp
import pytest

from sporco_tpu.utils import util, interp, plot
from sporco_tpu import accel


class TestUtil:

    def test_tiledict_conv(self):
        D = np.random.default_rng(0).standard_normal((8, 8, 16))
        im = util.tiledict(D)
        assert im.ndim == 2 and im.min() >= 0 and im.max() <= 1

    def test_tiledict_matrix(self):
        D = np.random.default_rng(0).standard_normal((64, 9))
        im = util.tiledict(D, sz=(8, 8))
        assert im.ndim == 2

    def test_tiledict_multichannel(self):
        D = np.random.default_rng(0).standard_normal((8, 8, 3, 9))
        im = util.tiledict(D)
        assert im.ndim == 3 and im.shape[2] == 3

    def test_convdicts(self):
        cd = util.convdicts()
        assert len(cd) > 0
        k = list(cd.keys())[0]
        assert cd[k].ndim >= 3

    def test_example_images(self):
        ei = util.ExampleImages(scaled=True)
        names = ei.images()
        assert len(names) > 0
        img = ei.image(names[0])
        assert img.ndim in (2, 3)
        g = ei.image(names[0], gray=True)
        assert g.ndim == 2

    def test_example_image_idx(self):
        ei = util.ExampleImages(scaled=True, gray=True)
        img = ei.image(ei.images()[0], idxexp=np.s_[10:74, 10:74])
        assert img.shape == (64, 64)


class TestInterp:

    def setup_method(self):
        self.rng = np.random.default_rng(12345)

    def test_lstabsdev(self):
        A = self.rng.standard_normal((32, 4))
        x0 = self.rng.standard_normal(4)
        b = A @ x0
        b[::8] += 10.0    # gross outliers
        x = interp.lstabsdev(A, b)
        assert np.linalg.norm(x - x0) < 1e-6   # LAD ignores outliers

    def test_lstabsdev_irls(self):
        A = self.rng.standard_normal((32, 4))
        x0 = self.rng.standard_normal(4)
        b = A @ x0
        b[::8] += 10.0
        x = np.asarray(interp.lstabsdev_irls(A, b))
        assert np.linalg.norm(x - x0) < 1e-3

    def test_lstmaxdev(self):
        A = self.rng.standard_normal((32, 4))
        x0 = self.rng.standard_normal(4)
        b = A @ x0 + 0.01 * self.rng.uniform(-1, 1, 32)
        x = interp.lstmaxdev(A, b)
        assert np.max(np.abs(A @ x - b)) <= \
            np.max(np.abs(A @ np.linalg.lstsq(A, b, rcond=None)[0] - b)) \
            + 1e-9

    def test_demosaic(self):
        img = self.rng.random((16, 16))
        rgb = interp.bilinear_demosaic(img)
        assert rgb.shape == (16, 16, 3)
        # samples preserved at their grid positions
        assert np.allclose(rgb[1::2, 1::2, 0], img[1::2, 1::2])
        assert np.allclose(rgb[0::2, 0::2, 2], img[0::2, 0::2])

    def test_lanczos(self):
        k = np.asarray(interp.lanczos_kernel(jnp.array([0.0, 0.5, 3.5])))
        assert abs(k[0] - 1.0) < 1e-6 and k[2] == 0.0
        f = interp.lanczos_filters((4,))
        assert f.shape[0] == 6
        assert np.allclose(np.asarray(f).sum(axis=0), 1.0)
        f2 = interp.lanczos_filters((2, 2))
        assert f2.shape[:2] == (6, 6) and f2.shape[-1] == 4


class TestPlot:

    def test_plot_surf_contour_imview(self, tmp_path):
        import matplotlib
        matplotlib.use("Agg")
        x = np.linspace(0, 1, 16)
        fig, ax = plot.plot(np.sin(x), x=x, title="t", xlbl="x")
        z = np.outer(np.sin(x), np.cos(x))
        plot.surf(z, title="s")
        plot.contour(z, title="c")
        plot.imview(z, title="i", cbar=True, fltscl=True)
        plot.close()

    def test_interactive_hooks(self):
        # zoom/keypress machinery (sporco/plot.py:39-178 capability):
        # drive synthetic events through the handlers on Agg
        import matplotlib
        matplotlib.use("Agg")
        x = np.linspace(0, 1, 16)
        fig, ax = plot.plot(np.sin(x), x=x)
        onkey = plot.attach_keypress(fig, scaling=2.0)
        w0, _ = fig.get_size_inches()

        class _Ev:
            pass

        ev = _Ev(); ev.key = "e"
        onkey(ev)
        assert abs(fig.get_size_inches()[0] - 2.0 * w0) < 1e-6
        ev.key = "r"
        onkey(ev)
        assert abs(fig.get_size_inches()[0] - w0) < 1e-6

        onscroll = plot.attach_zoom(ax, scaling=2.0)
        x0, x1 = ax.get_xlim()
        ev = _Ev()
        ev.inaxes = ax
        ev.xdata, ev.ydata = 0.5, 0.0
        ev.button = "up"
        onscroll(ev)
        nx0, nx1 = ax.get_xlim()
        assert abs((nx1 - nx0) - (x1 - x0) / 2.0) < 1e-6
        ev.button = "down"
        onscroll(ev)     # zooming back out restores the full view
        nx0, nx1 = ax.get_xlim()
        assert abs(nx0 - x0) < 1e-6 and abs(nx1 - x1) < 1e-6
        # notebook config helpers are safe no-ops outside a notebook
        plot.config_notebook_plotting()
        plot.set_ipython_plot_backend()
        ev.key = "q"
        onkey(ev)
        plot.close()


class TestAccel:

    def setup_method(self):
        rng = np.random.default_rng(12345)
        self.D = rng.standard_normal((5, 5, 8))
        self.D /= np.sqrt((self.D ** 2).sum(axis=(0, 1), keepdims=True))
        self.S = rng.standard_normal((16, 16))
        self.W = (rng.random((16, 16)) > 0.2).astype(np.float64)

    def test_cbpdn(self):
        from sporco_tpu.models.cbpdn import ConvBPDN
        X = accel.cbpdn(self.D, self.S, 0.1,
                        opt=ConvBPDN.options(max_iter=10),
                        dtype=jnp.float64)
        assert X.shape == (16, 16, 1, 1, 8)

    def test_cbpdngrd(self):
        from sporco_tpu.models.cbpdn import ConvBPDNGradReg
        X = accel.cbpdngrd(self.D, self.S, 0.1, 0.01,
                           opt=ConvBPDNGradReg.options(max_iter=10),
                           dtype=jnp.float64)
        assert X.shape == (16, 16, 1, 1, 8)

    def test_reference_style_option_dict(self):
        # the reference call surface: sporco.cuda.cbpdn(D, s, lmbda,
        # cbpdn.ConvBPDN.Options({...})) -- a plain dict with the
        # reference's option names must translate
        from sporco_tpu.models.cbpdn import ConvBPDN
        opt = {"MaxMainIter": 10, "RelStopTol": 0.0,
               "RelaxParam": 1.8, "rho": 2.0, "NonNegCoef": True,
               "AutoRho": {"Enabled": False},
               "HighMemSolve": True}          # unknown key: ignored
        Xd = np.asarray(accel.cbpdn(self.D, self.S, 0.1, opt=opt,
                                    dtype=jnp.float64))
        assert Xd.shape == (16, 16, 1, 1, 8)
        assert Xd.min() >= 0.0                # NonNegCoef honoured
        # identical to the equivalent ADMMOpts call
        from sporco_tpu.solvers.admm import AutoRhoOpts
        Xo = np.asarray(accel.cbpdn(
            self.D, self.S, 0.1, non_neg=True,
            opt=ConvBPDN.options(max_iter=10, rel_stop_tol=0.0,
                                 relax_param=1.8, rho=2.0,
                                 auto_rho=AutoRhoOpts(enabled=False)),
            dtype=jnp.float64))
        assert np.allclose(Xd, Xo)

    def test_cbpdnmsk(self):
        from sporco_tpu.models.cbpdn import ConvBPDN
        X = accel.cbpdnmsk(self.D, self.S, self.W, 0.1,
                           opt=ConvBPDN.options(max_iter=10),
                           dtype=jnp.float64)
        assert X.shape[-1] == 8

    def test_cbpdngrdmsk(self):
        from sporco_tpu.models.cbpdn import ConvBPDNGradReg
        X = accel.cbpdngrdmsk(self.D, self.S, self.W, 0.1, 0.01,
                              opt=ConvBPDNGradReg.options(max_iter=10),
                              dtype=jnp.float64)
        assert X.shape[-1] == 8

    def test_device_utils(self):
        assert accel.device_count() >= 1
        assert isinstance(accel.device_name(0), str)
        free, total = accel.memory_info()
        assert isinstance(total, int)

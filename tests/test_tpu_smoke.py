"""On-hardware validation pass (real TPU backend).

The regular suite runs on CPU (``tests/conftest.py``), where several
TPU-only failure modes are invisible -- most notably the default TPU
matmul precision (single-pass bf16), which in round 5 was found to put
a ~4e-3 noise floor under every unannotated x-step solve: batched BPDN
plateaued at r~5e-2 with a collapsing rho, RobustPCA hit max_iter
instead of converging in ~38 iterations, and BPDN took 91 iterations
where the reference takes 44.  None of that was catchable on CPU.

Run with::

    SPORCO_TPU_TESTS=1 python -m pytest tests/test_tpu_smoke.py -v

Skipped automatically when the backend is CPU.  First run compiles
each model (~30-60 s per program on a remote backend); enable a
compile cache dir to make reruns fast.

The iteration-count anchors below are the REFERENCE implementation's
to-tolerance counts measured on identical inputs (bit-level trajectory
probes: a precision regression shifts the count immediately).
"""

import os

import numpy as np
import pytest

import jax

if (os.environ.get("SPORCO_TPU_TESTS") != "1"
        or jax.default_backend() not in ("tpu", "axon")):
    pytest.skip("TPU smoke tests need SPORCO_TPU_TESTS=1 and a TPU "
                "backend", allow_module_level=True)


def _seeded(n=0):
    return np.random.default_rng(n)


class TestDensePrecisionAnchors:
    """Trajectory anchors for the dense solvers (the round-5 bf16
    regression class)."""

    def test_bpdn_single_matches_reference_iterations(self):
        # reference (numpy f32, same inputs): 44 iterations to 1e-3,
        # objective 0.2586
        from sporco_tpu.models import bpdn
        rng = _seeded()
        N, M = 512, 512
        D = rng.standard_normal((N, M)).astype(np.float32)
        x0 = np.zeros((M, 1), np.float32)
        x0[rng.choice(M, 32, replace=False)] = \
            rng.standard_normal((32, 1))
        S = D @ x0
        b = bpdn.BPDN(D, S, lmbda=1e-2,
                      opt=bpdn.BPDN.options(max_iter=200,
                                            rel_stop_tol=1e-3))
        b.solve()
        its = b.getitstat()
        assert abs(len(its) - 44) <= 2, len(its)
        assert np.isclose(float(its.ObjFun[-1]), 0.2586, rtol=2e-2)

    def test_bpdn_batched_converges(self):
        # 256 RHS, aggregate stopping: ~35 iterations; under the bf16
        # noise floor this plateaued at r~5e-2 and never converged
        from sporco_tpu.models import bpdn
        rng = _seeded()
        N, M, K = 512, 512, 256
        D = rng.standard_normal((N, M)).astype(np.float32)
        x0 = np.zeros((M, K), np.float32)
        for k in range(K):
            x0[rng.choice(M, 32, replace=False), k] = \
                rng.standard_normal(32)
        S = (D @ x0).astype(np.float32)
        b = bpdn.BPDN(D, S, lmbda=1e-2,
                      opt=bpdn.BPDN.options(max_iter=200,
                                            rel_stop_tol=1e-3))
        b.solve()
        its = b.getitstat()
        assert len(its) < 60, len(its)
        assert float(its.PrimalRsdl[-1]) <= 1e-3

    def test_rpca_matches_reference_iterations(self):
        # reference: 39 iterations to 1e-3, objective 8697
        from sporco_tpu.models import rpca
        rng = _seeded()
        N, r = 512, 8
        L = (rng.standard_normal((N, r))
             @ rng.standard_normal((r, N)))
        Ssp = ((rng.random((N, N)) > 0.9)
               * rng.standard_normal((N, N)) * 5)
        S = (L + Ssp).astype(np.float32)
        b = rpca.RobustPCA(S, opt=rpca.RobustPCA.options(
            max_iter=200, rel_stop_tol=1e-3), svd_rank=16)
        b.solve()
        its = b.getitstat()
        assert abs(len(its) - 39) <= 3, len(its)
        assert np.isclose(float(its.ObjFun[-1]), 8697.0, rtol=2e-2)


class TestCSCOnDevice:

    def test_convbpdn_recovery(self):
        # the reference's tight-tolerance recovery recipe
        # (tests/admm/test_cbpdn.py:156-176: sparse X0, lmbda=1e-4,
        # rho=1e-1, AutoRho off), at f32 on device.  The identical
        # config on CPU reproduces to ~5 decimals.
        from sporco_tpu.models.cbpdn import ConvBPDN
        from sporco_tpu.solvers.admm import AutoRhoOpts
        rng = _seeded(12345)
        N, Nd, M = 64, 8, 4
        D = rng.standard_normal((Nd, Nd, M)).astype(np.float32)
        X0 = np.zeros((N, N, M), np.float32)
        xp = np.abs(rng.standard_normal((N, N, M))) > 3
        X0[xp] = rng.standard_normal(int(xp.sum()))
        Df = np.fft.rfft2(D, s=(N, N), axes=(0, 1))
        S = np.fft.irfft2(
            (np.fft.rfft2(X0, axes=(0, 1)) * Df).sum(-1),
            s=(N, N)).astype(np.float32)
        b = ConvBPDN(D, S, lmbda=1e-4,
                     opt=ConvBPDN.options(
                         max_iter=500, rho=0.1, rel_stop_tol=0.0,
                         auto_rho=AutoRhoOpts(enabled=False)))
        X = np.asarray(b.solve()).squeeze()
        rrs = (np.linalg.norm(X - X0)
               / max(np.linalg.norm(X0), 1e-12))
        assert rrs < 5e-3, rrs

    def test_convbpdn_fista_objective_sane(self):
        from sporco_tpu.models import pgm as mp
        rng = _seeded(3)
        N, Nd, M = 64, 6, 8
        D = rng.standard_normal((Nd, Nd, M)).astype(np.float32)
        D /= np.sqrt((D ** 2).sum(axis=(0, 1), keepdims=True))
        S = rng.standard_normal((N, N)).astype(np.float32)
        b = mp.ConvBPDN(D, S, lmbda=0.1,
                        opt=mp.ConvBPDN.options(max_iter=60, L=60.0,
                                                backtrack="standard",
                                                rel_stop_tol=0.0))
        b.solve()
        obj = np.asarray(b.getitstat().ObjFun)
        assert np.isfinite(obj[-1])
        assert obj[-1] < obj[0]

    def test_colour_paths_match_generic(self):
        # both fused colour routes (channel folding for Cd=1/C=3 and
        # the rank-C Woodbury for Cd=C=3) vs the generic driver, on
        # device
        from sporco_tpu.models.cbpdn import ConvBPDN
        rng = _seeded(23)
        S = rng.standard_normal((64, 64, 3)).astype(np.float32)
        Dg = rng.standard_normal((6, 6, 8)).astype(np.float32)
        Dc = rng.standard_normal((6, 6, 3, 8)).astype(np.float32)
        opt = ConvBPDN.options(max_iter=25, rel_stop_tol=0.0)
        # on device the fused path runs bf16-split MXU matmuls (HIGH /
        # 4-pass), so objectives track the f32 FFT path to ~1e-3
        # relative; the exact-arithmetic parity (rtol 1e-4) is pinned
        # by the CPU tests (tests/ops/test_fused_csc.py)
        for D in (Dg, Dc):
            a = ConvBPDN(D, S, 0.1, opt=opt, dimK=0, fused=False)
            a.solve()
            oa = np.asarray(a.getitstat().ObjFun)
            b = ConvBPDN(D, S, 0.1, opt=opt, dimK=0, fused=True)
            b.solve()
            ob = np.asarray(b.getitstat().ObjFun)
            assert np.allclose(oa, ob, rtol=1e-3), (D.shape,)

    def test_gradreg_and_masked_converge(self):
        from sporco_tpu.models.cbpdn import (ConvBPDNGradReg,
                                             ConvBPDNMaskDcpl)
        rng = _seeded(5)
        N, Nd, M = 64, 6, 8
        D = rng.standard_normal((Nd, Nd, M)).astype(np.float32)
        S = rng.standard_normal((N, N)).astype(np.float32)
        for cls, kw in ((ConvBPDNGradReg, dict(mu=0.05)),
                        (ConvBPDNMaskDcpl,
                         dict(W=(rng.random((N, N)) > 0.3)
                              .astype(np.float32)))):
            b = cls(D, S, 0.1, opt=cls.options(max_iter=40), **kw)
            b.solve()
            assert np.isfinite(float(b.getitstat().ObjFun[-1]))


class TestCoordinatorsOnDevice:

    def test_consensus_cdl_unit_norms(self):
        from sporco_tpu.parallel.consensus import \
            ConvBPDNDictLearn_Consensus
        rng = _seeded(7)
        S = rng.standard_normal((64, 64, 4)).astype(np.float32)
        D0 = rng.standard_normal((6, 6, 8)).astype(np.float32)
        d = ConvBPDNDictLearn_Consensus(D0, S, lmbda=0.1, max_iter=10)
        D1 = np.asarray(d.solve())
        nrm = np.sqrt((D1 ** 2).sum(axis=(0, 1)))
        assert np.allclose(nrm, 1.0, atol=1e-3)

    def test_tv_denoise_converges(self):
        from sporco_tpu.models.tv import TVL2Denoise
        rng = _seeded(9)
        N = 256
        img = np.zeros((N, N), np.float32)
        img[N // 4:3 * N // 4, N // 4:3 * N // 4] = 1.0
        S = img + 0.1 * rng.standard_normal((N, N)).astype(np.float32)
        b = TVL2Denoise(S, 0.05, opt=TVL2Denoise.options(
            max_iter=200, rel_stop_tol=1e-3))
        x = np.asarray(b.solve())
        its = b.getitstat()
        assert float(its.PrimalRsdl[-1]) <= 1e-3
        assert (np.linalg.norm(x - img)
                < np.linalg.norm(S - img))


class TestWiderFamiliesOnDevice:
    """One quick on-device convergence pin per remaining family."""

    def test_spline(self):
        from sporco_tpu.models.spline import SplineL1
        rng = _seeded(11)
        N = 64
        img = np.outer(np.linspace(0, 1, N),
                       np.linspace(0, 1, N)).astype(np.float32)
        S = img.copy()
        idx = rng.choice(N * N, 200, replace=False)
        S.ravel()[idx] += 5.0 * rng.standard_normal(200)
        b = SplineL1(S, lmbda=5.0,
                     opt=SplineL1.options(max_iter=100))
        x = np.asarray(b.solve())
        assert (np.linalg.norm(x - img)
                < 0.3 * np.linalg.norm(S - img))

    def test_cbpdntv(self):
        from sporco_tpu.models.cbpdntv import ConvBPDNScalarTV
        rng = _seeded(13)
        D = rng.standard_normal((6, 6, 8)).astype(np.float32)
        S = rng.standard_normal((32, 32)).astype(np.float32)
        b = ConvBPDNScalarTV(
            D, S, 0.1, mu=0.05,
            opt=ConvBPDNScalarTV.options(max_iter=30))
        b.solve()
        assert np.isfinite(float(b.getitstat().ObjFun[-1]))

    def test_pdcsc(self):
        from sporco_tpu.models.pdcsc import ConvProdDictBPDN
        rng = _seeded(17)
        D = rng.standard_normal((6, 6, 8)).astype(np.float32)
        B = np.linalg.qr(rng.standard_normal((3, 3)))[0] \
            .astype(np.float32)
        S = rng.standard_normal((32, 32, 3)).astype(np.float32)
        b = ConvProdDictBPDN(
            D, B, S, lmbda=0.1, dimK=0,
            opt=ConvProdDictBPDN.options(max_iter=30))
        b.solve()
        assert np.isfinite(float(b.getitstat().ObjFun[-1]))

    def test_online_cdl(self):
        from sporco_tpu.models.dictlrn import OnlineConvBPDNDictLearn
        rng = _seeded(19)
        D0 = rng.standard_normal((6, 6, 8)).astype(np.float32)
        o = OnlineConvBPDNDictLearn(D0, lmbda=0.1, eta_a=10.0,
                                    eta_b=20.0)
        for k in range(2):
            o.solve(rng.standard_normal((32, 32)).astype(np.float32))
        D1 = np.asarray(o.getdict())
        nrm = np.sqrt((D1 ** 2).sum(axis=(0, 1)))
        assert np.allclose(nrm, 1.0, atol=1e-3)

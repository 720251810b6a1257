"""Reference-style option-dict acceptance on model constructors.

The reference API configures every solver with nested plain dicts
(``sporco/cdict.py:55``); these tests check that the same dicts
construct equivalent solvers here (solver-level keys -> native opts,
model-level keys -> constructor kwargs, unknown keys raise -- matching
``cdict.check``, ``sporco/cdict.py:229-256``).
"""

import numpy as np
import pytest

from sporco_tpu import refopts


def _prob(N=16, M=8, seed=0):
    rng = np.random.default_rng(seed)
    D = rng.standard_normal((4, 4, M)).astype(np.float32)
    S = rng.standard_normal((N, N)).astype(np.float32)
    return D, S


class TestADMMTranslation:

    def test_solver_level_keys(self):
        from sporco_tpu.models.bpdn import BPDN
        rng = np.random.default_rng(0)
        D = rng.standard_normal((8, 16)).astype(np.float32)
        s = rng.standard_normal(8).astype(np.float32)
        b = BPDN(D, s, 0.1, opt={"MaxMainIter": 7, "RelStopTol": 1e-4,
                                 "RelaxParam": 1.5, "rho": 2.0,
                                 "AutoRho": {"Enabled": False,
                                             "Period": 5}})
        assert b.opts.max_iter == 7
        assert b.opts.rel_stop_tol == pytest.approx(1e-4)
        assert b.opts.relax_param == pytest.approx(1.5)
        assert not b.opts.auto_rho.enabled
        assert b.opts.auto_rho.period == 5
        assert float(b.state.rho) == pytest.approx(2.0)

    def test_model_level_keys(self):
        from sporco_tpu.models.cbpdn import ConvBPDN
        D, S = _prob()
        b = ConvBPDN(D, S, 0.1, opt={"MaxMainIter": 3,
                                     "NonNegCoef": True,
                                     "NoBndryCross": True,
                                     "L1Weight": 2.0,
                                     "AuxVarObj": True})
        assert b.cfg.non_neg and b.cfg.no_bndry
        assert not b.cfg.obj_from_x        # AuxVarObj True -> eval on Y
        assert float(np.ravel(b.params["wl1"])[0]) == pytest.approx(2.0)

    def test_unknown_key_raises(self):
        from sporco_tpu.models.cbpdn import ConvBPDN
        D, S = _prob()
        with pytest.raises(refopts.UnknownKeyError):
            ConvBPDN(D, S, 0.1, opt={"NoSuchOption": 1})
        with pytest.raises(refopts.UnknownKeyError):
            ConvBPDN(D, S, 0.1, opt={"AutoRho": {"Bogus": 1}})

    def test_tuple_key_addressing(self):
        # reference ConstrainedDict tuple-key item access
        # (sporco/cdict.py:260-307): opt[('AutoRho', 'Period')] = 5
        from sporco_tpu.models.bpdn import BPDN
        rng = np.random.default_rng(0)
        D = rng.standard_normal((8, 16)).astype(np.float32)
        s = rng.standard_normal(8).astype(np.float32)
        opt = {"MaxMainIter": 7}
        opt[("AutoRho", "Period")] = 5
        opt[("AutoRho", "Enabled")] = False
        opt[("RelStopTol",)] = 1e-4
        b = BPDN(D, s, 0.1, opt=opt)
        assert b.opts.max_iter == 7
        assert b.opts.auto_rho.period == 5
        assert not b.opts.auto_rho.enabled
        assert b.opts.rel_stop_tol == pytest.approx(1e-4)

    def test_tuple_key_merges_with_nested_dict(self):
        from sporco_tpu.models.bpdn import BPDN
        rng = np.random.default_rng(0)
        D = rng.standard_normal((8, 16)).astype(np.float32)
        s = rng.standard_normal(8).astype(np.float32)
        opt = {"AutoRho": {"Enabled": False}}
        opt[("AutoRho", "Period")] = 9      # merge, not replace
        b = BPDN(D, s, 0.1, opt=opt)
        assert not b.opts.auto_rho.enabled
        assert b.opts.auto_rho.period == 9

    def test_tuple_key_in_subtree(self):
        # tuple keys inside a nested composite subtree value
        from sporco_tpu.models.dictlrn import OnlineConvBPDNDictLearn
        rng = np.random.default_rng(0)
        D0 = rng.standard_normal((4, 4, 6)).astype(np.float32)
        o = OnlineConvBPDNDictLearn(
            D0, 0.1, opt={("CBPDN", "MaxMainIter"): 10})
        assert o.cbpdn_opt.max_iter == 10

    def test_tuple_key_unknown_raises(self):
        from sporco_tpu.models.bpdn import BPDN
        rng = np.random.default_rng(0)
        D = rng.standard_normal((8, 16)).astype(np.float32)
        s = rng.standard_normal(8).astype(np.float32)
        with pytest.raises(refopts.UnknownKeyError):
            BPDN(D, s, 0.1, opt={("AutoRho", "Bogus"): 1})
        with pytest.raises(refopts.UnknownKeyError):
            BPDN(D, s, 0.1, opt={(): 1})

    def test_none_values_are_defaults(self):
        from sporco_tpu.models.cbpdn import ConvBPDN
        D, S = _prob()
        b = ConvBPDN(D, S, 0.1, opt={"rho": None, "DataType": None,
                                     "Y0": None, "Callback": None,
                                     "MaxMainIter": 4})
        assert b.opts.max_iter == 4

    def test_dict_matches_native_trajectory(self):
        from sporco_tpu.models.cbpdn import ConvBPDN
        D, S = _prob()
        nat = ConvBPDN(D, S, 0.1, opt=ConvBPDN.options(
            max_iter=10, rel_stop_tol=0.0))
        ref = ConvBPDN(D, S, 0.1, opt={"MaxMainIter": 10,
                                       "RelStopTol": 0.0})
        Xa = np.asarray(nat.solve())
        Xb = np.asarray(ref.solve())
        assert np.array_equal(Xa, Xb)

    def test_explicit_kwarg_wins_over_dict(self):
        from sporco_tpu.models.cbpdn import ConvBPDN
        D, S = _prob()
        b = ConvBPDN(D, S, 0.1, opt={"MaxMainIter": 3, "L1Weight": 2.0},
                     wl1=3.0)
        assert float(np.ravel(b.params["wl1"])[0]) == pytest.approx(3.0)

    def test_ignored_and_warn_keys(self):
        from sporco_tpu.models.cbpdn import ConvBPDN
        D, S = _prob()
        # display-only plumbing: accepted silently
        ConvBPDN(D, S, 0.1, opt={"MaxMainIter": 2, "StatusHeader": True,
                                 "IterTimer": "solve",
                                 "HighMemSolve": True})
        with pytest.warns(UserWarning):
            ConvBPDN(D, S, 0.1, opt={"MaxMainIter": 2,
                                     "Callback": lambda o: None})

    def test_tv_gs_keys(self):
        from sporco_tpu.models.tv import TVL2Denoise
        rng = np.random.default_rng(0)
        S = rng.standard_normal((16, 16)).astype(np.float32)
        t = TVL2Denoise(S, 0.1, opt={"MaxMainIter": 3, "MaxGSIter": 4,
                                     "GSTol": 1e-6, "DFidWeight": 2.0,
                                     "TVWeight": 0.5, "gEvalY": False})
        assert t.cfg.gs_max_iter == 4
        assert not t.cfg.g_eval_y

    def test_ccmod_cg_subtree(self):
        from sporco_tpu.models.ccmod import ConvCnstrMOD
        rng = np.random.default_rng(0)
        Z = rng.standard_normal((16, 16, 1, 2, 4)).astype(np.float32)
        S = rng.standard_normal((16, 16, 2)).astype(np.float32)
        c = ConvCnstrMOD(Z, S, (4, 4, 4), method="cg",
                         opt={"MaxMainIter": 2, "ZeroMean": True,
                              "CG": {"StopTol": 1e-4, "MaxIter": 20}})
        assert c.cfg.zero_mean
        assert c.cfg.cg_tol == pytest.approx(1e-4)


class TestPGMTranslation:

    def test_strategy_objects(self):
        from sporco_tpu.models.pgm import ConvBPDN

        class MomentumLinear:        # stand-in for the reference class
            a = 40.0

        class BacktrackRobust:
            gamma_d = 0.8
            gamma_u = 2.5
            maxiter = 30

        D, S = _prob()
        b = ConvBPDN(D, S, 0.1, opt={"MaxMainIter": 4, "L": 200.0,
                                     "Momentum": MomentumLinear(),
                                     "Backtrack": BacktrackRobust(),
                                     "Monotone": True,
                                     "L1Weight": 1.5})
        assert b.opts.momentum == "linear"
        assert b.opts.momentum_a == pytest.approx(40.0)
        assert b.opts.backtrack == "robust"
        assert b.opts.bt_gamma_u == pytest.approx(2.5)
        assert b.opts.monotone
        assert b.opts.L == pytest.approx(200.0)

    def test_autostop_subtree(self):
        from sporco_tpu.models.pgm import BPDN
        rng = np.random.default_rng(0)
        D = rng.standard_normal((8, 16)).astype(np.float32)
        s = rng.standard_normal(8).astype(np.float32)
        b = BPDN(D, s, 0.1, opt={"MaxMainIter": 4,
                                 "AutoStop": {"Enabled": True,
                                              "Tau0": 1e-3}})
        assert b.opts.auto_stop
        assert b.opts.auto_stop_tau0 == pytest.approx(1e-3)


class TestDictLearnTranslation:

    def test_cdl_subtrees(self):
        from sporco_tpu.models.dictlrn import ConvBPDNDictLearn
        rng = np.random.default_rng(0)
        D0 = rng.standard_normal((4, 4, 6)).astype(np.float32)
        S = rng.standard_normal((16, 16, 3)).astype(np.float32)
        d = ConvBPDNDictLearn(
            D0, S, 0.1, dtype=np.float32,
            opt={"MaxMainIter": 3, "CBPDN": {"rho": 5.0},
                 "CCMOD": {"ZeroMean": True}})
        assert d.max_iter == 3
        assert float(d.xstep.state.rho) == pytest.approx(5.0)

    def test_unknown_outer_key(self):
        from sporco_tpu.models.dictlrn import ConvBPDNDictLearn
        rng = np.random.default_rng(0)
        D0 = rng.standard_normal((4, 4, 6)).astype(np.float32)
        S = rng.standard_normal((16, 16, 3)).astype(np.float32)
        with pytest.raises(refopts.UnknownKeyError):
            ConvBPDNDictLearn(D0, S, 0.1, opt={"Nope": 1},
                              dtype=np.float32)


class TestAccelDicts:

    def test_accel_entry_points(self):
        from sporco_tpu import accel
        D, S = _prob()
        W = np.ones((16, 16), np.float32)
        X = accel.cbpdn(D, S, 0.1, opt={"MaxMainIter": 4,
                                        "AutoRho": {"Enabled": False}})
        assert X.shape[-1] == D.shape[-1]
        X = accel.cbpdnmsk(D, S, W, 0.1, opt={"MaxMainIter": 3,
                                              "L1Weight": 2.0})
        assert X.shape[-1] == D.shape[-1]


class TestDictLearnSubtreeKeys:
    """Regression tests for review findings: model-level keys inside
    coordinator subtrees must reach the inner solvers."""

    def _data(self):
        rng = np.random.default_rng(0)
        D0 = rng.standard_normal((6, 6, 8)).astype(np.float32)
        S = rng.standard_normal((16, 16, 2)).astype(np.float32)
        return D0, S

    def test_zeromean_subtree(self):
        from sporco_tpu.models.dictlrn import ConvBPDNDictLearn
        D0, S = self._data()
        d = ConvBPDNDictLearn(D0, S, 0.1, max_iter=1, dtype=np.float32,
                              opt={"CCMOD": {"ZeroMean": True}})
        assert d.dstep.cfg.zero_mean

    def test_dictsize_maps_to_dsz(self):
        from sporco_tpu.models.dictlrn import ConvBPDNDictLearn
        D0, S = self._data()
        d = ConvBPDNDictLearn(
            D0, S, 0.1, dtype=np.float32,
            opt={"DictSize": ((4, 4, 4), (6, 6, 4)),
                 "MaxMainIter": 2})
        d.solve()
        D = np.asarray(d.getdict())
        assert np.abs(D[4:, :, :4]).max() == 0.0

    def test_gradweight_with_gradreg_xstep(self):
        from sporco_tpu.models.cbpdn import ConvBPDNGradReg
        from sporco_tpu.models.dictlrn import ConvBPDNDictLearn
        D0, S = self._data()
        d = ConvBPDNDictLearn(D0, S, 0.1, mu=0.1, max_iter=1,
                              dtype=np.float32,
                              opt={"CBPDN": {"GradWeight": 2.0}})
        assert isinstance(d.xstep, ConvBPDNGradReg)
        assert float(np.ravel(d.xstep.params["wgrd"])[0]) \
            == pytest.approx(2.0)

    def test_inner_tolerance_zeroed(self):
        # a nonzero inner tolerance would freeze the re-entrant inner
        # solve on stale residuals (the loop tests BEFORE the body)
        from sporco_tpu.models.dictlrn import ConvBPDNDictLearn
        D0, S = self._data()
        d = ConvBPDNDictLearn(D0, S, 0.1, max_iter=1, dtype=np.float32,
                              opt={"CBPDN": {"rho": 5.0}})
        assert d.xstep.opts.rel_stop_tol == 0.0

    def test_pdcsc_joint_l21weight(self):
        from sporco_tpu.models.pdcsc import ConvProdDictBPDNJoint
        rng = np.random.default_rng(0)
        B = np.linalg.qr(rng.standard_normal((3, 3)))[0] \
            .astype(np.float32)
        Dp = rng.standard_normal((4, 4, 6)).astype(np.float32)
        Sp = rng.standard_normal((16, 16, 3)).astype(np.float32)
        j = ConvProdDictBPDNJoint(Dp, B, Sp, 0.1, mu=0.05, dimK=0,
                                  opt={"L21Weight": 2.0,
                                       "MaxMainIter": 3})
        assert float(j.params["wl21"]) == pytest.approx(2.0)
        j.solve()

    def test_addmasksim_explicit_wl1_wins(self):
        from sporco_tpu.models.cbpdn import AddMaskSim, ConvBPDN
        rng = np.random.default_rng(0)
        D = rng.standard_normal((4, 4, 4)).astype(np.float32)
        S = rng.standard_normal((16, 16)).astype(np.float32)
        W = np.ones((16, 16), np.float32)
        ams = AddMaskSim(ConvBPDN, D, S, W, 0.1, wl1=3.0,
                         opt={"MaxMainIter": 2, "L1Weight": 2.0})
        wl1 = np.ravel(np.asarray(ams.cbpdn.params["wl1"]))
        assert wl1.max() == pytest.approx(3.0)


class TestBroaderModelCoverage:
    """Reference-dict acceptance across the remaining model families."""

    def test_tv_deconv(self):
        from sporco_tpu.models.tv import TVL1Deconv
        rng = np.random.default_rng(0)
        S = rng.standard_normal((16, 16)).astype(np.float32)
        A = np.ones((3, 3), np.float32) / 9.0
        b = TVL1Deconv(A, S, 0.1, opt={"MaxMainIter": 3,
                                       "TVWeight": 0.5, "rho": 5.0,
                                       "LinSolveCheck": False})
        b.solve()

    def test_spline(self):
        from sporco_tpu.models.spline import SplineL1
        rng = np.random.default_rng(0)
        S = rng.standard_normal((16, 16)).astype(np.float32)
        b = SplineL1(S, 2.0, opt={"MaxMainIter": 3, "DFidWeight": 1.5,
                                  "gEvalY": True})
        assert float(b.params["Wdf"]) == pytest.approx(1.5)
        b.solve()

    def test_rpca(self):
        from sporco_tpu.models.rpca import RobustPCA
        rng = np.random.default_rng(0)
        S = rng.standard_normal((16, 16)).astype(np.float32)
        b = RobustPCA(S, opt={"MaxMainIter": 3, "fEvalX": True,
                              "gEvalY": True})
        b.solve()

    def test_minl1_ball(self):
        from sporco_tpu.models.bpdn import MinL1InL2Ball
        rng = np.random.default_rng(0)
        D = rng.standard_normal((8, 16)).astype(np.float32)
        s = rng.standard_normal(8).astype(np.float32)
        b = MinL1InL2Ball(D, s, 0.5, opt={"MaxMainIter": 3,
                                          "L1Weight": 2.0,
                                          "NonNegCoef": True})
        assert b.cfg.non_neg
        b.solve()

    def test_parcbpdn(self):
        from sporco_tpu.models.parcbpdn import ParConvBPDN
        D, S = _prob()
        b = ParConvBPDN(D, S, 0.1, ngrp=2,
                        opt={"MaxMainIter": 3, "L1Weight": 1.5,
                             "alpha": 2.0})
        b.solve()

    def test_cbpdnin(self):
        from sporco_tpu.models.cbpdnin import ConvBPDNInhib
        D, S = _prob()
        Wg = np.ones((2, D.shape[-1]), np.float32)
        b = ConvBPDNInhib(D, S, Wg=Wg, Whn=4, lmbda=0.1, mu=0.1,
                          opt={"MaxMainIter": 3, "SmoothWeight": 0.8})
        assert b.cfg.smooth == pytest.approx(0.8)
        b.solve()

    def test_cbpdntv(self):
        from sporco_tpu.models.cbpdntv import ConvBPDNScalarTV
        D, S = _prob()
        b = ConvBPDNScalarTV(D, S, 0.1, mu=0.05,
                             opt={"MaxMainIter": 3, "TVWeight": 2.0})
        b.solve()

    def test_online_cdl(self):
        from sporco_tpu.models.dictlrn import OnlineConvBPDNDictLearn
        rng = np.random.default_rng(0)
        D0 = rng.standard_normal((4, 4, 6)).astype(np.float32)
        S = rng.standard_normal((16, 16)).astype(np.float32)
        o = OnlineConvBPDNDictLearn(
            D0, 0.1, opt={"eta_a": 20.0, "ZeroMean": True,
                          "CBPDN": {"MaxMainIter": 10}})
        assert o.eta_a == pytest.approx(20.0) and o.zero_mean
        o.solve(S)

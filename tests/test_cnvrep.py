"""Convolutional-representation layout tests.

Mirrors the reference suite ``tests/test_cnvrep.py`` (DictionarySize
spec parsing, zeromean/bcrop over multi-scale + multi-channel dsz
specs, and the getPcn projection-flag matrix), translated to this
package's trailing-spatial internal layout: filter axis at ``-dimN-1``,
channel axis (when present) at ``-dimN-2``.
"""

import numpy as np
import pytest

from sporco_tpu import cnvrep as cr


class TestDictionarySize:

    def test_single_scale(self):
        ds = cr.DictionarySize((8, 8, 32))
        assert ds.nchn == 1
        assert ds.nflt == 32
        assert ds.mxsz == (8, 8)

    def test_multi_scale(self):
        ds = cr.DictionarySize(((8, 8, 16), (12, 12, 32)))
        assert ds.nchn == 1
        assert ds.nflt == 48
        assert ds.mxsz == (12, 12)

    def test_multi_scale_multi_channel(self):
        ds = cr.DictionarySize(((8, 8, 3, 16), (12, 12, 3, 32)))
        assert ds.nchn == 3
        assert ds.nflt == 48

    def test_nested_per_channel(self):
        dsz = (((5, 5, 2, 8), (7, 7, 1, 8)),
               ((9, 9, 2, 16), (10, 10, 1, 16)))
        ds = cr.DictionarySize(dsz)
        assert ds.nchn == 3
        assert ds.nflt == 24
        assert ds.mxsz == (10, 10)


class TestCDUIndex:

    def test_single_signal(self):
        N, M, L = 32, 16, 8
        cri = cr.cdu_index((L, L, M), (N, N), dimK=0)
        assert cri.M == M
        assert cri.K == 1
        assert cri.Nv == (N, N)

    def test_multi_signal(self):
        N, M, L, K = 32, 16, 8, 4
        cri = cr.cdu_index((L, L, M), (N, N, K), dimK=1)
        assert cri.M == M
        assert cri.K == K

    def test_multi_channel(self):
        N, M, L, C = 32, 16, 8, 3
        cri = cr.cdu_index((L, L, C, M), (N, N, C))
        assert cri.C == C
        assert cri.Cd == C
        assert cri.K == 1

    def test_channel_mismatch_raises(self):
        with pytest.raises(ValueError):
            cr.cdu_index((8, 8, 3, 16), (32, 32, 4))

    def test_mask_shapes(self):
        N = 32
        cri = cr.cdu_index((8, 8, 16), (N, N), dimK=0)
        W = np.random.randn(N, N)
        Wi = np.asarray(cr.fidelity_mask(W, cri))
        assert Wi.shape == (1, 1, 1, N, N)


class TestZeromean:

    def test_single_scale(self):
        # filters on axis 0, spatial trailing
        u = np.zeros((32, 16, 16))
        u[0:16, 0:8, 0:8] = 1.0
        v = np.asarray(cr.zeromean(u, (8, 8, 32)))
        assert abs(v).sum() < 1e-12

    def test_multi_scale(self):
        u = np.zeros((48, 24, 24))
        u[0:16, 0:8, 0:8] = 1.0
        u[16:, 0:12, 0:12] = 1.0
        v = np.asarray(cr.zeromean(u, ((8, 8, 16), (12, 12, 32))))
        assert abs(v).sum() < 1e-12

    def test_nested_per_channel(self):
        dsz = (((5, 5, 2, 8), (7, 7, 1, 8)),
               ((9, 9, 2, 16), (10, 10, 1, 16)))
        u = np.zeros((3, 24, 16, 16))     # (Cd, M, N0, N1)
        u[0:2, 0:8, 0:5, 0:5] = 1.0
        u[2, 0:8, 0:7, 0:7] = 1.0
        u[0:2, 8:, 0:9, 0:9] = 1.0
        u[2, 8:, 0:10, 0:10] = 1.0
        v = np.asarray(cr.zeromean(u, dsz))
        assert abs(v).sum() < 1e-12

    def test_only_support_affected(self):
        # energy outside the support is untouched by zeromean
        u = np.random.default_rng(0).standard_normal((4, 12, 12))
        v = np.asarray(cr.zeromean(u, (6, 6, 4)))
        assert np.allclose(v[:, 6:, :], u[:, 6:, :])
        assert np.allclose(v[:, :, 6:], u[:, :, 6:])
        assert abs(v[:, :6, :6].mean(axis=(1, 2))).max() < 1e-12


class TestBcrop:

    def test_single_scale(self):
        u = np.zeros((32, 16, 16))
        u[0:16, 0:8, 0:8] = 1.0
        v = np.asarray(cr.bcrop(u, (8, 8, 32)))
        assert v.shape == (32, 8, 8)

    def test_multi_scale(self):
        u = np.zeros((48, 24, 24))
        u[0:16, 0:8, 0:8] = 1.0
        u[16:, 0:12, 0:12] = 1.0
        v = np.asarray(cr.bcrop(u, ((8, 8, 16), (12, 12, 32))))
        assert v.shape == (48, 12, 12)
        # the 8x8 filters must be zero outside their own support
        assert abs(v[:16, 8:, :]).sum() == 0.0
        assert abs(v[:16, :, 8:]).sum() == 0.0

    def test_nested_per_channel(self):
        dsz = (((5, 5, 2, 8), (7, 7, 1, 8)),
               ((9, 9, 2, 16), (10, 10, 1, 16)))
        u = np.zeros((3, 24, 16, 16))
        u[0:2, 0:8, 0:5, 0:5] = 1.0
        u[2, 0:8, 0:7, 0:7] = 1.0
        u[0:2, 8:, 0:9, 0:9] = 1.0
        u[2, 8:, 0:10, 0:10] = 1.0
        v = np.asarray(cr.bcrop(u, dsz))
        assert v.shape == (3, 24, 10, 10)

    def test_zpad_roundtrip(self):
        u = np.random.default_rng(0).standard_normal((4, 5, 5))
        z = np.asarray(cr.zpad(u, (12, 12)))
        assert z.shape == (4, 12, 12)
        assert np.allclose(z[:, :5, :5], u)
        assert np.asarray(cr.bcrop(z, (5, 5, 4))).shape == (4, 5, 5)


class TestPcn:
    """getPcn flag matrix (reference tests 15-18); x is (M, N0, N1)."""

    def test_plain(self):
        x = np.ones((1, 6, 6))
        y = np.array(cr.getPcn((3, 3, 1), (6, 6))(x))
        assert abs(y.sum() - 3.0) < 1e-6
        y[:, 0:3, 0:3] = 0
        assert y.sum() == 0.0

    def test_crop(self):
        x = np.ones((1, 6, 6))
        y = np.array(cr.getPcn((3, 3, 1), (6, 6), crp=True)(x))
        assert abs(y.sum() - 3.0) < 1e-6
        assert y.shape == (1, 3, 3)

    def test_zeromean(self):
        x = np.ones((1, 6, 6))
        x[:, 0] = 2
        y = np.array(cr.getPcn((3, 3, 1), (6, 6), zm=True)(x))
        assert np.all(y[:, 0:3, 0:3] != 0.0)
        assert abs(y.sum()) < 1e-6
        y[:, 0:3, 0:3] = 0
        assert abs(y).sum() == 0.0

    def test_crop_zeromean(self):
        x = np.ones((1, 6, 6))
        x[:, 0] = 2
        y = np.array(cr.getPcn((3, 3, 1), (6, 6), crp=True, zm=True)(x))
        assert np.all(y != 0.0)
        assert abs(y.sum()) < 1e-6
        assert y.shape == (1, 3, 3)

    def test_unit_norm(self):
        rng = np.random.default_rng(0)
        x = rng.standard_normal((8, 12, 12))
        y = np.asarray(cr.Pcn(x, (5, 5, 8), (12, 12)))
        nrm = np.sqrt((y ** 2).sum(axis=(1, 2)))
        assert np.allclose(nrm, 1.0, atol=1e-6)

    def test_multichannel_norm_axes(self):
        # unit norm jointly over channel+spatial axes, as the reference
        # does for multi-channel dictionaries (sporco/cnvrep.py:673)
        rng = np.random.default_rng(0)
        x = rng.standard_normal((3, 8, 12, 12))    # (Cd, M, N0, N1)
        y = np.asarray(cr.Pcn(x, (5, 5, 3, 8), (12, 12)))
        nrm = np.sqrt((y ** 2).sum(axis=(0, 2, 3)))
        assert np.allclose(nrm, 1.0, atol=1e-6)

    def test_idempotent(self):
        rng = np.random.default_rng(1)
        x = rng.standard_normal((4, 10, 10))
        fn = cr.getPcn((5, 5, 4), (10, 10), zm=True)
        y1 = np.asarray(fn(x))
        y2 = np.asarray(fn(y1))
        assert np.allclose(y1, y2, atol=1e-6)


class TestL1Weight:

    def test_scalar(self):
        cri = cr.csc_index((4, 4, 8), (16, 16))
        W = cr.l1_weight(np.float64(2.0), cri)
        assert np.asarray(W).shape == (1, 1, 1, 1, 1)

    def test_spatial(self):
        cri = cr.csc_index((4, 4, 8), (16, 16))
        W = cr.l1_weight(np.ones((16, 16)), cri)
        assert np.asarray(W).shape == (1, 1, 1, 16, 16)

    def test_spatial_filter(self):
        cri = cr.csc_index((4, 4, 8), (16, 16))
        W = cr.l1_weight(np.ones((16, 16, 8)), cri)
        assert np.asarray(W).shape == (1, 1, 8, 16, 16)

    def test_full_internal(self):
        cri = cr.csc_index((4, 4, 8), (16, 16, 3), dimK=1)
        W = cr.l1_weight(np.ones((16, 16, 1, 3, 8)), cri)
        assert np.asarray(W).shape == (3, 1, 8, 16, 16)
